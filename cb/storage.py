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
    return os.environ.get(ENV_VAR, DEFAULT_ROOT)


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
