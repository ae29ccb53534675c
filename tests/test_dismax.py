"""ES ``multi_match: best_fields`` (dis_max) combine: score = best
single field + tie_breaker * the others.  Proven three ways:

- exact float recompute from the per-field scores (each field's
  contribution equals the field-scoped query's score — most_fields
  scoping semantics, already oracle-proven — so dis_max is checkable
  bitwise from two field-scoped searches);
- doc-sharded engine == in-process searcher (the combine is per-doc,
  so disjoint slices merge exactly);
- multifield federation == monolithic searcher (same contract, with
  fed-global per-field stats underneath).

WAND must fall back: max + tie_breaker breaks the additive bound the
block-max heap prunes with.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cb import federated, multifield

_WORDS = ["hash", "join", "sort", "merge", "table", "scan", "index",
          "tree", "heap", "node"] + [f"w{i:02d}" for i in range(40)]


def _synth(n: int, seed: int) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    for i in range(n):
        def words(m):
            return " ".join(
                _WORDS[int(rng.integers(len(_WORDS)))] for _ in range(m)
            )

        rows.append(
            {
                "doc_id": 500 + i,
                "title": words(int(rng.integers(2, 6))),
                "body": words(int(rng.integers(10, 40))),
                "ts": 1_700_000_000_000_000 + (i % 3) * 86_400_000_000,
            }
        )
    t = pa.Table.from_pylist(rows)
    return t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("dismax")
    src = str(d / "docs.parquet")
    pq.write_table(_synth(300, seed=11), src)
    idx = str(d / "idx")
    multifield.build_multifield(
        src, idx, ["title", "body"], id_col="doc_id", num_parts=3
    )
    return src, idx


_QS = [
    "hash join", "sort merge table", "index", "w03 scan",
    "hash^2 join", "tree heap node w01",
]


def _field_score_maps(s, q):
    """Per-field {doc: score} via the SAME TAAT kernel most_fields sums
    over (itself SQL-oracle-proven) — the independent recompute the
    dis_max combine is checked against."""
    from cb import wand

    r = multifield.route_query(q, s.fields)
    fp, fi = multifield._field_live_idfs(r, s._get, s.stats, s.fields)
    out = {}
    for f in s.fields:
        if f in fp:
            u, acc = wand.taat_scores(fp[f], fi[f], s.stats[f])
            out[f] = dict(zip(u.tolist(), acc.tolist()))
    return [out.get(f, {}) for f in s.fields]


def test_dismax_equals_fieldwise_recompute(built):
    """dis_max score per doc == best + tb * (total - best), recomputed
    bitwise from the per-field TAAT scores in manifest field order."""
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    big = 10**6
    for q in _QS:
        a, b = _field_score_maps(s, q)
        got = dict(s.search(q, k=big, mode="best_fields", tie_breaker=0.25))
        assert set(got) == set(a) | set(b), q
        for doc, sc in got.items():
            av, bv = a.get(doc, 0.0), b.get(doc, 0.0)
            total = av + bv  # fields[0]-then-fields[1] accumulation
            best = max(av, bv)
            assert sc == best + 0.25 * (total - best), (q, doc)


def test_dismax_tb_zero_is_pure_max(built):
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    big = 10**6
    for q in _QS[:3]:
        a, b = _field_score_maps(s, q)
        got = dict(s.search(q, k=big, mode="best_fields"))
        for doc, sc in got.items():
            assert sc == max(a.get(doc, 0.0), b.get(doc, 0.0)), (q, doc)


def test_repeated_scoped_field_keeps_every_term(built):
    """Regression: ``title:hash title:join`` must score BOTH terms —
    the parse-level filters dict is keyed by field, so route_query has
    to read the ordered scoped_terms list instead (the second value
    used to silently replace the first)."""
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    r = multifield.route_query("title:hash title:join", s.fields)
    assert r["field_terms"]["title"] == ["hash", "join"]
    assert r["field_terms"]["body"] == []
    # and the scoped pair scores like the equivalent single-field sums
    both = dict(s.search("title:hash title:join", k=10**6))
    a = dict(s.search("title:hash", k=10**6))
    b = dict(s.search("title:join", k=10**6))
    assert set(both) == set(a) | set(b)
    for doc, sc in both.items():
        assert sc == a.get(doc, 0.0) + b.get(doc, 0.0), doc


def test_dismax_engine_bitwise_equals_searcher(built):
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    eng = multifield.MultiFieldEngine(idx, num_servers=3)
    try:
        for q in _QS:
            want = s.search(q, k=10, mode="best_fields", tie_breaker=0.25)
            assert (
                eng.search(q, k=10, mode="best_fields", tie_breaker=0.25)
                == want
            ), q
    finally:
        eng.shutdown()


def test_dismax_forces_taat(built, monkeypatch):
    """algo='wand' with best_fields must not enter topk_wand_fields."""
    from cb import wand

    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    want = s.search("hash join", k=10, mode="best_fields", tie_breaker=0.25)

    def boom(*a, **kw):
        raise AssertionError("WAND taken for a dis_max query")

    monkeypatch.setattr(wand, "topk_wand_fields", boom)
    got = s.search(
        "hash join", k=10, algo="wand", mode="best_fields", tie_breaker=0.25
    )
    assert got == want


def test_dismax_mode_validation(built):
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    with pytest.raises(ValueError, match="multi_match mode"):
        s.search("hash", mode="bogus_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        s.search("hash", mode="best_fields", tie_breaker=1.5)


@pytest.fixture(scope="module")
def fed_built(built, tmp_path_factory):
    import ray

    src, _ = built
    fed_dir = str(tmp_path_factory.mktemp("dismax_fed") / "fed")
    federated.build_federation(
        ray.data.read_parquet(src), fed_dir,
        fields=["title", "body"], id_col="doc_id", ts_col="ts",
        prefix="dm-", num_parts=3,
    )
    return fed_dir


def test_dismax_federation_bitwise_equals_monolithic(built, fed_built):
    _, idx = built
    mono = multifield.MultiFieldSearcher(idx)
    eng = federated.FederatedMultiFieldEngine(fed_built)
    try:
        for q in _QS:
            assert eng.search(
                q, k=10, mode="best_fields", tie_breaker=0.25
            ) == mono.search(q, k=10, mode="best_fields", tie_breaker=0.25), q
    finally:
        eng.shutdown()


def test_dismax_fed_cli(built, fed_built):
    """fed search --mode best_fields through the CLI (subprocess: the
    CLI owns its own Ray session) == the in-process dis_max ranking."""
    import json
    import subprocess
    import sys

    _, idx = built
    want = multifield.MultiFieldSearcher(idx).search(
        "hash join", k=5, mode="best_fields", tie_breaker=0.25
    )
    r = subprocess.run(
        [sys.executable, "-m", "cb.cli", "fed", "search", "--fed", fed_built,
         "--query", "hash join", "-k", "5",
         "--mode", "best_fields", "--tie-breaker", "0.25"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    got = [(h["doc_id"], h["score"]) for h in out["results"]]
    assert got == [(d, s) for d, s in want]


# ---- cross_fields (the third multi_match mode) ----

def test_crossfields_brute_recompute(built):
    """cross_fields score == blended_idf(max per-field df) * per-doc
    max u, summed in term order — recomputed bitwise from the raw
    postings."""
    from cb import scoring

    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    n = s.stats[s.fields[0]].n_docs
    for q in ("hash join", "sort merge table", "index"):
        got = dict(s.search(q, k=10**6, mode="cross_fields"))
        total = {}
        for t in sorted(set(q.split())):
            ps = [(f, s._get(f, t)) for f in s.fields]
            ps = [(f, p) for f, p in ps if p is not None]
            if not ps:
                continue
            idf_b = float(scoring.idf(max(p.df for _, p in ps), n))
            best = {}
            for f, p in ps:
                ids, tfs, dls = p.decode_all()
                u = scoring.u_factor(tfs, dls, s.stats[f].avgdl)
                for d, uu in zip(ids.tolist(), u.tolist()):
                    best[d] = max(best.get(d, 0.0), uu)
            for d, uu in best.items():
                total[d] = total.get(d, 0.0) + idf_b * uu
        assert got == total, q


def test_crossfields_engine_and_fed_bitwise(built, fed_built):
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    eng = multifield.MultiFieldEngine(idx, num_servers=3)
    fed = federated.FederatedMultiFieldEngine(fed_built)
    try:
        for q in ("hash join", "sort merge table", "tree heap w01"):
            want = s.search(q, k=10, mode="cross_fields")
            assert eng.search(q, k=10, mode="cross_fields") == want, q
            assert fed.search(q, k=10, mode="cross_fields") == want, q
    finally:
        eng.shutdown()
        fed.shutdown()


def test_crossfields_guards(built, monkeypatch):
    from cb import wand

    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    with pytest.raises(ValueError, match="plain scored terms"):
        s.search('"hash join" sort', mode="cross_fields")
    with pytest.raises(ValueError, match="plain scored terms"):
        s.search("hash -join", mode="cross_fields")
    want = s.search("hash join", k=10, mode="cross_fields")

    def boom(*a, **kw):
        raise AssertionError("WAND taken for a cross_fields query")

    monkeypatch.setattr(wand, "topk_wand_fields", boom)
    assert s.search("hash join", k=10, algo="wand", mode="cross_fields") == want


def test_multifield_indices_boost(built, fed_built):
    """indices_boost on the multifield federation: identity at w=1;
    exact per-member scale values; composes with best_fields."""
    eng = federated.FederatedMultiFieldEngine(fed_built)
    names = sorted(eng.members)
    try:
        q = "hash join"
        assert eng.search_boosted(q, k=20) == eng.search(q, k=20)
        ib = {names[0]: 0.5}
        big = 10**6
        boosted = dict(eng.search_boosted(q, k=big, indices_boost=ib))
        per_member = {
            n: dict(eng.search(q, k=big, names=[n])) for n in names
        }
        for n in names:
            w = 0.5 if n == names[0] else 1.0
            for d, s in per_member[n].items():
                assert boosted[d] == (s * w if w != 1.0 else s), (n, d)
        # composes with dis_max
        want = dict(
            eng.search(q, k=big, mode="best_fields", tie_breaker=0.25)
        )
        got = dict(
            eng.search_boosted(
                q, k=big, mode="best_fields", tie_breaker=0.25,
                indices_boost={names[0]: 0.5},
            )
        )
        member0 = set(
            d for d, _ in eng.search(
                q, k=big, names=[names[0]], mode="best_fields",
                tie_breaker=0.25,
            )
        )
        for d, s in got.items():
            assert s == (want[d] * 0.5 if d in member0 else want[d]), d
        with pytest.raises(ValueError, match="> 0"):
            eng.search_boosted(q, indices_boost={names[0]: -1.0})
    finally:
        eng.shutdown()


def test_crossfields_rejects_scoped_terms(built):
    _, idx = built
    s = multifield.MultiFieldSearcher(idx)
    with pytest.raises(ValueError, match="field-scoped"):
        s.search("title:hash join", mode="cross_fields")


def test_crossfields_blend_is_global_across_slices(tmp_path, ray_session):
    """Review repro: a term living in title ONLY on one doc-range
    slice and body ONLY on another must blend the SAME (global) df on
    every server — blending over locally-present postings gave
    doc-sharded engines a different idf than the monolith."""
    rows = []
    hi = 1 << 62
    for i in range(40):
        rows.append({"doc_id": 100 + i, "title": "alpha beta",
                     "body": "gamma delta epsilon"})
        rows.append({"doc_id": hi + 100 + i, "title": "alpha beta",
                     "body": "gamma delta epsilon"})
    rows.append({"doc_id": 50, "title": "zebraterm alpha", "body": "gamma"})
    rows.append({"doc_id": hi + 50, "title": "alpha",
                 "body": "zebraterm gamma delta"})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    multifield.build_multifield(
        src, idx, ["title", "body"], id_col="doc_id", num_parts=2
    )
    s = multifield.MultiFieldSearcher(idx)
    eng = multifield.MultiFieldEngine(idx, num_servers=2)
    try:
        for q in ("zebraterm", "zebraterm alpha", "zebraterm gamma"):
            want = s.search(q, k=30, mode="cross_fields")
            assert eng.search(q, k=30, mode="cross_fields") == want, q
    finally:
        eng.shutdown()
