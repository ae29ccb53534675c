"""Duplicate-substring span ops (the ExactSubstr pass of Lee et al.):
unit vectors with hand-computed spans, cross-batch counting, strip
reconstruction, and a brute-force reference sweep."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cb import analyze, dedup


def _mk(docs):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }
        )
    )


def _brute_spans(docs, n, min_count):
    """Per-doc merged spans of windows whose corpus-wide count >= min_count."""
    toks = [analyze.tokenize(t) for t in docs]
    counts = {}
    for ts in toks:
        for i in range(max(len(ts) - n + 1, 0)):
            w = tuple(ts[i : i + n])
            counts[w] = counts.get(w, 0) + 1
    out = []
    for d, ts in enumerate(toks):
        spans = []
        for i in range(max(len(ts) - n + 1, 0)):
            if counts[tuple(ts[i : i + n])] >= min_count:
                if spans and i <= spans[-1][1]:
                    spans[-1][1] = i + n
                else:
                    spans.append([i, i + n])
        out.extend((d, s, e) for s, e in spans)
    return out


def _got_spans(ds, n, min_count):
    t = dedup.duplicate_ngram_spans(ds, n=n, min_count=min_count).to_pandas()
    return sorted(map(tuple, t.values.tolist()))


def test_shared_run_two_docs(ray_session):
    # docs 0 and 1 share one 6-token run; doc 2 is clean
    run = "alpha bravo charlie delta echo foxtrot"
    docs = [
        f"zulu {run} yankee",
        f"xray {run} whiskey victor",
        "uniform tango sierra romeo quebec papa oscar november",
    ]
    ds = _mk(docs)
    got = _got_spans(ds, 3, 2)
    # run occupies token positions 1..6 in both docs; windows of size 3
    # inside the run are shared (positions 1..4), merged span = [1, 7)
    assert got == [(0, 1, 7), (1, 1, 7)]


def test_within_doc_repetition_counts(ray_session):
    # the repeated trigram occurs twice INSIDE one doc -> min_count=2 met
    docs = ["red blue green cyan magenta gold red blue green"]
    got = _got_spans(_mk(docs), 3, 2)
    assert got == [(0, 0, 3), (0, 6, 9)]


def test_adjacent_windows_merge_contiguously(ray_session):
    # two docs share a 4-token run: with n=2 every interior bigram is
    # duplicated, and adjacent/overlapping windows fuse into ONE span
    docs = ["pine quartz ruby slate", "pine quartz ruby slate"]
    got = _got_spans(_mk(docs), 2, 2)
    assert got == [(0, 0, 4), (1, 0, 4)]


def test_cross_batch_counting(ray_session):
    # copies live in different blocks: counting is corpus-global
    run = "mono duo tri tetra penta"
    alpha = [chr(97 + i) * 3 for i in range(20)]
    filler = [f"fil{w}p fil{w}q fil{w}r fil{w}s fil{w}t" for w in alpha]
    docs = [f"{run} tailp tailq"] + filler + [f"headp headq {run}"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = _got_spans(ds, 5, 2)
    assert got == [(0, 0, 5), (len(docs) - 1, 2, 7)]


def test_no_dups_and_short_docs(ray_session):
    docs = ["one two", "three four five six seven", ""]
    got = _got_spans(_mk(docs), 8, 2)
    assert got == []


def test_strip_reconstruction(ray_session):
    run = "alpha bravo charlie delta echo foxtrot"
    docs = [f"zulu {run} yankee", f"xray {run} whiskey victor"]
    t = dedup.strip_duplicate_spans(_mk(docs), n=3, min_count=2).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    # span [1,7) stripped from both; analyzed tokens outside it remain
    assert list(t["clean_text"]) == ["zulu yankee", "xray whiskey victor"]
    assert list(t["n_removed"]) == [6, 6]
    # one row per input doc even when nothing is removed
    t2 = dedup.strip_duplicate_spans(_mk(["solo doc here"]), n=3, min_count=2).to_pandas()
    assert list(t2["clean_text"]) == ["solo doc here"]
    assert list(t2["n_removed"]) == [0]


def test_fully_duplicated_doc_strips_to_empty(ray_session):
    docs = ["cedar cobalt coral cactus", "cedar cobalt coral cactus"]
    t = dedup.strip_duplicate_spans(_mk(docs), n=4, min_count=2).to_pandas()
    assert list(t["clean_text"]) == ["", ""]
    assert list(t["n_removed"]) == [4, 4]


def _pair_corpus(n_pairs=50, run_len=60):
    """n_pairs pairs of identical docs over pair-disjoint vocab: every
    pair contributes run_len - n + 1 distinct duplicated windows."""
    docs = []
    for p in range(n_pairs):
        run = " ".join(f"p{p}w{i}" for i in range(run_len))
        docs.append(run)
        docs.append(run)
    return docs


def test_bloom_store_bitwise_matches_array(tmp_path, ray_session):
    """dup_store='bloom' is the SAME operator, exact: spans and strip
    output must equal the broadcast-array path bitwise."""
    docs = _pair_corpus(8) + [
        "lone tungsten argon krypton xenon radon helium neon",
        "",
    ]
    ds = _mk(docs)
    wd = str(tmp_path / "bloomwd")
    for n, mc in ((8, 2), (3, 2)):
        arr = dedup.duplicate_ngram_spans(ds, n=n, min_count=mc).to_pandas()
        blm = dedup.duplicate_ngram_spans(
            ds, n=n, min_count=mc, dup_store="bloom", work_dir=wd
        ).to_pandas()
        assert sorted(map(tuple, arr.values.tolist())) == sorted(
            map(tuple, blm.values.tolist())
        ), (n, mc)
    sa = dedup.strip_duplicate_spans(ds, n=8, min_count=2).to_pandas()
    sb = dedup.strip_duplicate_spans(
        ds, n=8, min_count=2, dup_store="bloom", work_dir=wd
    ).to_pandas()
    assert sa.sort_values("doc_id").values.tolist() == \
        sb.sort_values("doc_id").values.tolist()


def test_bloom_broadcast_is_filter_bits_not_dup_windows(tmp_path, ray_session):
    """The 100-TB claim: what pass B broadcasts is O(filter bits) —
    bits_per_key/64 of the raw sorted-u64 array (modulo power-of-two
    rounding) — while membership stays EXACT via bucket-file verify."""
    import pickle

    import ray as _ray

    ds = _mk(_pair_corpus(50))  # 50 pairs x 53 windows = 2650 dup keys
    wd = str(tmp_path / "bloomwd")
    n, mc, bpk = 8, 2, 12
    raw = _ray.get(
        dedup.duplicate_window_hashes(ds, n=n, min_count=mc)
    )
    n_keys = len(raw)
    assert n_keys >= 2000
    bloom = _ray.get(
        dedup.duplicate_window_bloom(
            ds, n=n, min_count=mc, work_dir=wd, bits_per_key=bpk
        )
    )
    raw_bytes = raw.nbytes  # what the array path broadcasts
    payload = pickle.dumps(bloom)  # what the bloom path broadcasts
    # m rounds UP to a power of two: <= 2x the requested bits_per_key
    assert len(bloom.bits) * 8 <= 2 * bpk * n_keys
    assert len(payload) < raw_bytes / 2
    # the broadcast object never ships a warm bucket cache
    assert pickle.loads(payload)._cache == {}
    # and membership through the filter is exact, both polarities
    member = bloom.contains(raw)
    assert member.all()
    rng = np.random.default_rng(7)
    probes = rng.integers(0, 2**63, size=4096, dtype=np.int64).astype(np.uint64)
    fresh = probes[~np.isin(probes, raw)]
    assert not bloom.contains(fresh).any()


def test_bloom_requires_work_dir(ray_session):
    with pytest.raises(ValueError, match="work_dir"):
        dedup.duplicate_ngram_spans(
            _mk(["a b c"]), n=3, min_count=2, dup_store="bloom"
        )
    with pytest.raises(ValueError, match="array|bloom"):
        dedup.duplicate_ngram_spans(
            _mk(["a b c"]), n=3, min_count=2, dup_store="nope"
        )


def test_bloom_stale_bucket_files_removed(tmp_path, ray_session):
    """Re-running into the same work_dir with a corpus that fills fewer
    buckets must not let a stale bucket file verify phantom hashes."""
    import os

    wd = str(tmp_path / "bloomwd")
    big = _mk(_pair_corpus(20))
    ray.get(dedup.duplicate_window_bloom(big, n=8, min_count=2, work_dir=wd))
    n_files_big = len(os.listdir(wd))
    assert n_files_big > 1
    small = _mk(["tiny solo doc with no duplicate windows at all"])
    bloom = ray.get(
        dedup.duplicate_window_bloom(small, n=8, min_count=2, work_dir=wd)
    )
    assert len(os.listdir(wd)) == 0  # nothing qualified -> no files
    h, _, _ = dedup._window_hash_stream(
        analyze.token_array(pa.array(_pair_corpus(1))), 8
    )
    assert not bloom.contains(np.unique(h)).any()


def test_brute_force_sweep(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for _ in range(40):
        L = int(rng.integers(0, 25))
        docs.append(" ".join(rng.choice(vocab, size=L)))
    # plant a shared phrase in a few docs
    phrase = "k1 k2 k3 k4 k5 k6"
    for d in (3, 17, 29):
        docs[d] = docs[d] + " " + phrase
    for n, mc in ((3, 2), (4, 3), (6, 2)):
        got = _got_spans(_mk(docs), n, mc)
        assert got == sorted(_brute_spans(docs, n, mc)), (n, mc)
