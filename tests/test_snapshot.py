"""Snapshot/restore (content-addressed repo) + atomic aliases."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from cb import corpus as cm
from cb import snapshot as snap
from cb.build import build_index
from cb.shard import LocalSearcher


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tbl = cm.generate_corpus(120, seed=21)
    d = tmp_path_factory.mktemp("snapcorpus")
    pq.write_table(tbl, str(d / "c.parquet"))
    idx = str(tmp_path_factory.mktemp("snapidx"))
    build_index(str(d / "c.parquet"), idx, num_parts=2, range_bits=2)
    return idx


def _all_bytes(d):
    out = {}
    for root, _dirs, files in os.walk(d):
        for f in files:
            full = os.path.join(root, f)
            with open(full, "rb") as fh:
                out[os.path.relpath(full, d)] = fh.read()
    return out


def test_snapshot_restore_byte_identical(built, tmp_path):
    repo = str(tmp_path / "repo")
    m = snap.create(built, repo, "s1")
    assert m["new_blobs"] > 0
    target = str(tmp_path / "restored")
    n = snap.restore(repo, "s1", target)
    assert n == len(m["files"])
    assert _all_bytes(target) == _all_bytes(built)
    # restored index answers queries identically
    a = LocalSearcher(built).query("join table", k=5)
    b = LocalSearcher(target).query("join table", k=5)
    assert a == b


def test_snapshot_incremental_and_corruption(built, tmp_path):
    repo = str(tmp_path / "repo")
    snap.create(built, repo, "s1")
    m2 = snap.create(built, repo, "s2")  # unchanged index: zero new blobs
    assert m2["new_blobs"] == 0
    assert snap.list_snapshots(repo) == ["s1", "s2"]
    # corrupt one blob: restore must refuse, and leave no target behind
    blobs = os.listdir(os.path.join(repo, "blobs"))
    victim = os.path.join(repo, "blobs", blobs[0])
    with open(victim, "ab") as f:
        f.write(b"x")
    target = str(tmp_path / "restored")
    with pytest.raises(ValueError, match="corrupt"):
        snap.restore(repo, "s2", target)
    assert not os.path.exists(target)
    with pytest.raises(FileNotFoundError):
        snap.restore(repo, "nope", str(tmp_path / "t2"))


def test_alias_atomic_swap(built, tmp_path):
    root = str(tmp_path / "ali")
    snap.set_alias(root, "prod", built)
    assert snap.resolve_alias(root, "prod") == built
    snap.set_alias(root, "prod", built + "_v2")
    assert snap.resolve_alias(root, "prod") == built + "_v2"
    assert snap.list_aliases(root) == {"prod": built + "_v2"}
    with pytest.raises(KeyError):
        snap.resolve_alias(root, "staging")


def test_snapshot_cli_roundtrip(built, tmp_path):
    repo = str(tmp_path / "repo")
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "snapshot", "create",
         "--repo", repo, "--name", "s1", "--index", built],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["files"] > 0
    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "alias", "set",
         "--root", str(tmp_path / "ali"), "--name", "prod", "--index", built],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "alias", "resolve",
         "--root", str(tmp_path / "ali"), "--name", "prod"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert json.loads(r.stdout)["index"] == built
