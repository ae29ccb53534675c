"""Snapshot / restore for built indexes — the ES ``_snapshot`` repo
analog, content-addressed so repeated snapshots are incremental.

Layout of a snapshot repository (any shared filesystem dir — on a real
cluster put it under the CB_SHARED_DIR contract or object storage):

    repo/
      blobs/<md5>            one copy of each distinct file CONTENT
      snaps/<name>.json      manifest: relative path -> (md5, size)

``create`` walks the index dir, uploads only blobs the repo doesn't
already hold (ES's segment reuse: an unchanged bucket file is never
copied twice across snapshots), and writes the manifest ATOMICALLY
(tmp + rename) so a crashed snapshot is invisible.  ``restore``
verifies every blob's md5 BEFORE placing it (a corrupt repo fails the
restore, never produces a silently-wrong index) and writes into a tmp
dir renamed into place, so a half-restore is also invisible.

Scale: blobs are streamed in fixed-size chunks (no whole-file reads);
the manifest is O(index files), tiny.  Restores are resumable by
re-running (idempotent).  Reference analog: ConveyorBelt delegates
durability to ES snapshots; this is that feature for the from-scratch
index.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

_CHUNK = 1 << 22  # 4 MiB


def _md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(_CHUNK)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _walk(index_dir: str):
    for root, _dirs, files in os.walk(index_dir):
        for f in sorted(files):
            full = os.path.join(root, f)
            yield os.path.relpath(full, index_dir), full


def create(index_dir: str, repo: str, name: str) -> dict:
    """Snapshot ``index_dir`` into ``repo`` as ``name``.  Returns the
    manifest.  Incremental: blobs already present are not re-copied."""
    blobs = os.path.join(repo, "blobs")
    snaps = os.path.join(repo, "snaps")
    os.makedirs(blobs, exist_ok=True)
    os.makedirs(snaps, exist_ok=True)
    manifest: dict = {"name": name, "files": {}}
    new_blobs = 0
    for rel, full in _walk(index_dir):
        digest = _md5_file(full)
        size = os.path.getsize(full)
        dst = os.path.join(blobs, digest)
        if not os.path.exists(dst):
            tmp = dst + ".tmp"
            shutil.copyfile(full, tmp)
            os.replace(tmp, dst)
            new_blobs += 1
        manifest["files"][rel] = {"md5": digest, "size": size}
    manifest["new_blobs"] = new_blobs
    mpath = os.path.join(snaps, f"{name}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, mpath)
    return manifest


def list_snapshots(repo: str) -> list[str]:
    snaps = os.path.join(repo, "snaps")
    if not os.path.isdir(snaps):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(snaps) if f.endswith(".json")
    )


def restore(repo: str, name: str, target_dir: str) -> int:
    """Restore snapshot ``name`` into ``target_dir`` (must not exist).
    Every blob is checksum-verified BEFORE placement; returns the file
    count.  The restore lands atomically (tmp dir + rename)."""
    mpath = os.path.join(repo, "snaps", f"{name}.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"snapshot {name!r} not in repo {repo!r} (has {list_snapshots(repo)})"
        )
    if os.path.exists(target_dir):
        raise FileExistsError(f"restore target {target_dir!r} already exists")
    with open(mpath) as f:
        manifest = json.load(f)
    tmp_dir = target_dir + ".restoring"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    try:
        for rel, info in manifest["files"].items():
            blob = os.path.join(repo, "blobs", info["md5"])
            got = _md5_file(blob)
            if got != info["md5"]:
                raise ValueError(
                    f"blob {info['md5']} is corrupt (hashes to {got}); "
                    f"refusing to restore {rel!r}"
                )
            dst = os.path.join(tmp_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copyfile(blob, dst)
        os.replace(tmp_dir, target_dir)
    finally:
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
    return len(manifest["files"])


# ---------------------------------------------------------------- aliases

def set_alias(root: str, alias: str, index_dir: str) -> None:
    """ES index-alias analog: point ``alias`` at ``index_dir``
    atomically (readers see the old or the new target, never neither —
    the swap a reindex-then-flip deployment needs)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "aliases.json")
    current = {}
    if os.path.exists(path):
        with open(path) as f:
            current = json.load(f)
    current[alias] = index_dir
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(current, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def resolve_alias(root: str, alias: str) -> str:
    path = os.path.join(root, "aliases.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no aliases.json under {root!r}")
    with open(path) as f:
        current = json.load(f)
    if alias not in current:
        raise KeyError(f"alias {alias!r} unknown (has {sorted(current)})")
    return current[alias]


def list_aliases(root: str) -> dict:
    path = os.path.join(root, "aliases.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)
