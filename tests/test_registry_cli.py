import json
import subprocess
import sys

import pytest

from cb import registry


def test_builtin_registries():
    assert registry.lookup("analyzer", "code")("camelCase") == ["camel", "case"]
    assert "iis" in registry.names("parser")
    assert "parquet" in registry.names("source")
    assert "minhash" in registry.names("dedup")


def test_unknown_names():
    with pytest.raises(KeyError, match="no parser named"):
        registry.lookup("parser", "nope")
    with pytest.raises(KeyError, match="unknown registry kind"):
        registry.lookup("bogus", "x")


def test_user_registration():
    registry.register("analyzer", "upper", lambda s: s.upper().split())
    assert registry.lookup("analyzer", "upper")("a b") == ["A", "B"]


def test_cli_build_and_query(tmp_path):
    from cb import corpus

    cdir = tmp_path / "corpus"
    cdir.mkdir()
    corpus.write_corpus(str(cdir), 60, seed=42, n_files=2)
    idx = str(tmp_path / "idx")
    # run in a subprocess: the CLI owns its own Ray session
    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "build", "--input", str(cdir),
         "--index", idx, "--num-parts", "4", "--resumable"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["n_docs"] == 60

    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "query", "--index", idx,
         "--query", "import return", "-k", "5"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["query"] == "import return"
    assert 0 < len(out["results"]) <= 5
    assert out["results"][0]["score"] >= out["results"][-1]["score"]
