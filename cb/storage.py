"""Shared-storage contract for every on-disk layout the engine writes.

THE CONTRACT (single place; every layout docstring links here): any
directory a multi-task pipeline both WRITES and LATER READS — index
dirs (``cb.build``), IVF cell layouts (``cb.ann.build_ivf``), near-dup
block spills (``cb.ann.embedding_near_duplicates``), federated staging
(``cb.federated``), resumable shuffle partials (``cb.resumable``) —
must live on storage REACHABLE FROM EVERY NODE of the cluster (NFS /
Lustre / FSx / a fuse-mounted object store).  Ray schedules the writer
and reader tasks on arbitrary nodes; a node-local path (``/tmp``, an
instance disk) silently works single-node and breaks multi-node with
missing-file errors.  No cb API defaults to ``tempfile.mkdtemp`` for
such a path: callers either pass one explicitly or derive it with
:func:`scratch_dir`, whose root is the operator-owned ``CB_SHARED_DIR``.

Reference analog: ConveyorBelt keeps every inter-stage artifact in
Azure Blob/Table storage (shared by construction) — e.g. the
checkpoint/cursor store at src/ConveyorBelt.Tooling/Configuration/
DiagnosticsSourceSummary.cs and the blob locks used by
Scheduling/LockingScheduler.cs; a Ray port inherits that requirement
for its filesystem layouts.
"""

from __future__ import annotations

import hashlib
import os

#: Operator-owned root for derived scratch/work dirs.  The default is
#: correct ONLY for single-node runs (this sandbox, CI); a real cluster
#: MUST set CB_SHARED_DIR to a shared mount, or pass explicit dirs.
ENV_VAR = "CB_SHARED_DIR"
DEFAULT_ROOT = "/tmp/cb_shared"


def shared_root() -> str:
    root = os.environ.get(ENV_VAR)
    if root:
        return root
    _assert_single_node()
    return DEFAULT_ROOT


# cached verdict of _assert_single_node: a cluster's node count can
# only matter once per process for this guard, and the check is a GCS
# RPC — don't pay it per scratch_dir() call
_single_node_ok = False


def _assert_single_node() -> None:
    """Refuse the node-local DEFAULT_ROOT on a real multi-node cluster.

    When ``CB_SHARED_DIR`` is unset the fallback is ``/tmp/...`` —
    exactly the silent failure this module exists to prevent: writer
    and reader tasks land on different nodes and the reader sees
    missing files.  Raising here (tested against a 2-node
    ``ray.cluster_utils.Cluster``) converts that into an immediate,
    actionable error instead."""
    global _single_node_ok
    if _single_node_ok:
        return
    try:
        import ray

        if not ray.is_initialized():
            return  # can't know yet — re-check (uncached) next call
        alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:
        return
    if alive > 1:
        raise RuntimeError(
            f"{ENV_VAR} is unset but this Ray cluster has {alive} alive "
            f"nodes: the default scratch root {DEFAULT_ROOT!r} is "
            "node-local and inter-stage files written there would be "
            f"unreachable from other nodes. Set {ENV_VAR} to a mount "
            "shared by every node (NFS/Lustre/FSx/fuse-mounted object "
            "store), or pass explicit shared work/index dirs."
        )
    _single_node_ok = True


def scratch_dir(kind: str, key: str) -> str:
    """Deterministic per-(kind, key) directory under the shared root.

    Deterministic (md5 of the caller's key, not ``mkdtemp``) so a
    re-run of the same job reuses/overwrites its own scratch instead of
    leaking a new directory per attempt, and so two stages of one
    pipeline can derive the same path independently."""
    d = os.path.join(
        shared_root(), kind, hashlib.md5(key.encode()).hexdigest()[:16]
    )
    os.makedirs(d, exist_ok=True)
    return d
