"""Curation operators: quality gate, stratified sample, decontamination,
PII redaction — semantics on planted data (the sf-table entries are
oracle-checked; these prove behavior the synthetic tables can't show)."""

import numpy as np
import pytest
import ray

from cb import curation


def test_quality_filter_reasons():
    rows = [
        {"doc_id": 1, "text": "good document with several meaningful tokens present here"},
        {"doc_id": 2, "text": "tiny"},                        # too_short
        {"doc_id": 3, "text": "the of and to in a is it " * 4},  # high stop ratio
    ]
    out = {r["doc_id"]: r for r in curation.quality_filter(ray.data.from_items(rows)).take_all()}
    assert out[1]["keep"] and out[1]["reason"] == ""
    assert not out[2]["keep"] and out[2]["reason"] == "too_short"
    assert not out[3]["keep"] and out[3]["reason"] in ("high_stop_ratio", "too_short")


def test_stratified_sample_rates():
    rows = [
        {"doc_id": i, "lang": ("en", "de")[i % 2]} for i in range(400)
    ]
    out = curation.stratified_sample(
        ray.data.from_items(rows), {"en": 50, "de": 10}
    ).take_all()
    en = [r for r in out if r["lang"] == "en"]
    de = [r for r in out if r["lang"] == "de"]
    assert all(r["doc_id"] % 100 < 50 for r in en)
    assert all(r["doc_id"] % 100 < 10 for r in de)
    # roughly proportional on uniform ids
    assert 80 <= len(en) <= 120 and 10 <= len(de) <= 30
    # deterministic: same input -> same sample
    again = curation.stratified_sample(
        ray.data.from_items(rows), {"en": 50, "de": 10}
    ).take_all()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_decontaminate_flags_overlap():
    bench = ["the secret benchmark question about unusual marmots and telescopes today ok"]
    rows = [
        {"doc_id": 1, "text": "clean document with no test overlap at all in it whatsoever"},
        # contains an 8-gram of the benchmark
        {"doc_id": 2, "text": "prefix words " + bench[0] + " suffix words"},
    ]
    out = {r["doc_id"]: r for r in curation.decontaminate(
        ray.data.from_items(rows), bench, n=8
    ).take_all()}
    assert not out[1]["contaminated"] and out[1]["n_hits"] == 0
    assert out[2]["contaminated"] and out[2]["n_hits"] > 0


def test_bpe_token_count_matches_regex():
    import re

    rows = [
        {"doc_id": 1, "text": "It's a test-case: 42 items, obviously."},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "snake_case camelCase  double  spaces"},
    ]
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in curation.bpe_token_stats(
        ray.data.from_items(rows)
    ).take_all()}
    for r in rows:
        assert out[r["doc_id"]] == len(re.findall(curation.BPE_PATTERN, r["text"]))


def test_pack_sequences_invariants():
    rng = np.random.Generator(np.random.PCG64(4))
    rows = [
        {"doc_id": int(i), "text": " ".join(f"tok{j}" for j in range(int(rng.integers(5, 120))))}
        for i in range(300)
    ]
    budget = 200
    out = curation.pack_sequences(
        ray.data.from_items(rows), budget=budget
    ).take_all()
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in rows}  # every doc packed once
    sums: dict = {}
    for r in out:
        sums.setdefault((r["pack_group"], r["pack_id"]), []).append(r["n_tokens"])
    for key, toks in sums.items():
        assert sum(toks) <= budget or len(toks) == 1, key  # budget, or oversized singleton
    # deterministic
    again = curation.pack_sequences(ray.data.from_items(rows), budget=budget).take_all()
    assert sorted(map(tuple, (sorted(r.items()) for r in again))) == \
        sorted(map(tuple, (sorted(r.items()) for r in out)))


def test_pii_redact_patterns():
    rows = [
        {"doc_id": 1, "text": "contact me at alice.smith+x@example.org or 10.0.0.1 ref 123456789012"},
        {"doc_id": 2, "text": "nothing sensitive here 1234"},
    ]
    out = {r["doc_id"]: r["text_redacted"] for r in curation.pii_redact(
        ray.data.from_items(rows)
    ).take_all()}
    assert out[1] == "contact me at <EMAIL> or <IP> ref <NUM>"
    assert out[2] == "nothing sensitive here 1234"


def test_dataset_split_deterministic_and_salted():
    import numpy as np

    rows = [{"doc_id": i} for i in range(1, 501)]
    ds = ray.data.from_items(rows)
    out = {r["doc_id"]: r["split"] for r in curation.dataset_split(ds).take_all()}
    assert set(out.values()) == {"train", "val", "test"}
    # ~80/10/10 within loose bounds
    counts = {s: sum(1 for v in out.values() if v == s) for s in ("train", "val", "test")}
    assert 330 <= counts["train"] <= 470
    # deterministic across runs and batch layouts
    again = {
        r["doc_id"]: r["split"]
        for r in curation.dataset_split(
            ray.data.from_items(rows).repartition(7)
        ).take_all()
    }
    assert again == out
    # a different salt re-deals membership
    other = {
        r["doc_id"]: r["split"]
        for r in curation.dataset_split(ds, salt="v2").take_all()
    }
    assert other != out


def test_repetition_stats_signals():
    import pyarrow as pa

    from cb import textstats

    batch = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "same line\nsame line\nsame line\nunique one",
                "spark spark spark spark words here",
                "alpha",
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_stats(batch).to_pylist()
    }
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == 0.5  # 2 distinct of 4
    # "spark spark" bigram dominates: 3 of 5 bigrams
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 0.6
    # single-token doc: no bigrams, one unique line
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["dup_line_frac"] == 0.0


def test_token_budget_sample_semantics():
    rows = []
    for s, n in (("a", 30), ("b", 30), ("c", 10)):
        for i in range(n):
            rows.append(
                {
                    "doc_id": hash((s, i)) % (1 << 40),
                    "source": s,
                    "text": "tok " * (5 + i % 7),
                }
            )
    ds = ray.data.from_items(rows)
    budgets = {"a": 60, "b": 10**9}
    out = curation.token_budget_sample(ds, budgets).take_all()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert "c" not in by_src  # unbudgeted source dropped
    assert sum(r["n_tokens"] for r in by_src["a"]) <= 60
    assert len(by_src["b"]) == 30  # huge budget keeps everything
    # deterministic across batch layouts
    again = curation.token_budget_sample(
        ray.data.from_items(rows).repartition(5), budgets
    ).take_all()
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted((r["source"], r["doc_id"]) for r in again) == sorted(
        (r["source"], r["doc_id"]) for r in out
    )


def test_token_budget_sample_skewed_source():
    """One source = 90% of the corpus: the two-phase cutoff (h-range
    histogram + boundary-only group) must match the brute-force global
    salted-hash-prefix reference exactly, and no per-source group ever
    sees the hot source's full row set (n_ranges makes the boundary
    slice ~1/n_ranges of it)."""
    import hashlib
    import struct

    rng = np.random.default_rng(5)
    rows = []
    for i in range(2000):
        src = "hot" if i % 10 else "cold"
        rows.append(
            {
                "doc_id": int(rng.integers(0, 1 << 50)),
                "source": src,
                "text": "tok " * int(rng.integers(3, 12)),
            }
        )
    budgets = {"hot": 800, "cold": 300}
    ds = ray.data.from_items(rows).repartition(7)
    out = curation.token_budget_sample(ds, budgets, n_ranges=64).take_all()

    def ref_keep(rows, budgets):
        keep = set()
        for s, budget in budgets.items():
            pool = []
            for r in rows:
                if r["source"] != s:
                    continue
                n_tok = len(r["text"].split())
                h = (
                    struct.unpack(
                        "<Q",
                        hashlib.md5(f"mix{r['doc_id']}".encode()).digest()[8:16],
                    )[0]
                    % 1_000_000
                )
                pool.append((h, r["doc_id"], n_tok))
            pool.sort()
            cum = 0
            for h, did, n_tok in pool:
                cum += n_tok
                if cum > budget:
                    break
                keep.add((s, did))
        return keep

    got = {(r["source"], r["doc_id"]) for r in out}
    assert got == ref_keep(rows, budgets)


def test_write_training_shards_resumable(tmp_path):
    """Partitioned training export: one file per (shard, h-range),
    atomic writes, and a re-run reproduces byte-identical files (the
    resumable-output contract)."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"doc_id": i * 7 + 1, "text": f"doc {i}"} for i in range(300)]
    ds = ray.data.from_items(rows)
    out1 = str(tmp_path / "e1")
    res = curation.write_training_shards(ds, out1, n_shards=4, n_ranges=8)
    assert res["n_rows"] == 300

    def tree(d):
        out = {}
        for root, _, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, d)] = hashlib.sha256(fh.read()).hexdigest()
        return out

    t1 = tree(out1)
    assert all(k.startswith("shard=") for k in t1)
    assert len(t1) == res["n_files"]
    # re-run (same dir): overwrites with identical bytes
    curation.write_training_shards(ray.data.from_items(rows), out1, n_shards=4, n_ranges=8)
    assert tree(out1) == t1
    # replaying shard files in range order == export_shards pos order
    asg = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in curation.export_shards(
            ray.data.from_items(rows), n_shards=4
        ).take_all()
    }
    for s in range(4):
        sdir = os.path.join(out1, f"shard={s}")
        if not os.path.isdir(sdir):
            continue
        ids = []
        for f in sorted(
            os.listdir(sdir), key=lambda f: int(f[len("range="):-len(".parquet")])
        ):
            ids.extend(pq.read_table(os.path.join(sdir, f))["doc_id"].to_pylist())
        assert [asg[i][1] for i in ids] == list(range(len(ids)))
        assert all(asg[i][0] == s for i in ids)


def test_alpha_mix_rebalances_skewed_sources(ray_session):
    """alpha=0.5 on a 90%-dominant source: the tail source's budget
    share rises above its natural share; alpha=1 reproduces natural
    proportions; outputs respect per-source budgets."""
    import numpy as np
    import pyarrow as pa

    from cb import analyze, curation

    rng = np.random.default_rng(9)
    vocab = [f"w{c}" for c in "abcdefghij"]
    rows = []
    i = 0
    for src_name, ndocs in (("big", 90), ("small", 10)):
        for _ in range(ndocs):
            rows.append(
                {
                    "doc_id": i,
                    "source": src_name,
                    "text": " ".join(rng.choice(vocab, size=20)),
                }
            )
            i += 1
    t = pa.Table.from_pylist(rows)
    ds = ray.data.from_arrow(t)

    def tok_count(src_name):
        return sum(
            len(analyze.tokenize(r["text"])) for r in rows if r["source"] == src_name
        )

    c_big, c_small = tok_count("big"), tok_count("small")
    total = 800
    out = curation.alpha_mix_sample(
        ds, alpha=0.5, total_budget=total
    ).to_pandas()
    got = out.groupby("source")["n_tokens"].sum()
    # expected budgets (same formula)
    sh = {s: c ** 0.5 for s, c in (("big", c_big), ("small", c_small))}
    denom = sh["big"] + sh["small"]
    for s in ("big", "small"):
        budget = int(np.floor(total * sh[s] / denom))
        assert got.get(s, 0) <= budget, s
    # the tail source's sampled share exceeds its natural token share
    nat_share = c_small / (c_big + c_small)
    samp_share = got.get("small", 0) / got.sum()
    assert samp_share > nat_share

def test_auto_pack_groups_thresholds():
    from cb.curation import auto_pack_groups

    assert auto_pack_groups(0) == 64
    assert auto_pack_groups(500) == 64          # small corpora: floor
    assert auto_pack_groups(64 << 16) == 64      # exactly at the floor
    assert auto_pack_groups((64 << 16) + 1) == 65
    # 10^10 docs -> ~64k docs/group, task memory stays bounded
    assert auto_pack_groups(10**10) == -(-10**10 // (1 << 16))


def test_pack_sequences_auto_group_count(ray_session):
    """auto n_groups keeps the historical 64-group layout at small
    scale; an explicit n_groups reroutes docs by id % n_groups."""
    import pyarrow as pa

    import ray as _ray
    from cb.curation import pack_sequences

    rows = [{"doc_id": i, "text": "a b c"} for i in range(200)]
    ds = _ray.data.from_arrow(pa.Table.from_pylist(rows))
    auto = pack_sequences(ds, budget=5).take_all()
    assert {r["pack_group"] for r in auto} == {i % 64 for i in range(200)}
    four = pack_sequences(ds, budget=5, n_groups=4).take_all()
    assert {r["pack_group"] for r in four} == {0, 1, 2, 3}
    assert all(r["pack_group"] == r["doc_id"] % 4 for r in four)
