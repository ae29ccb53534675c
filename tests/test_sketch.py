"""HyperLogLog cardinality sketch: register fold, monoid merge,
estimate accuracy, and the distributed grouped operator."""

import numpy as np
import pyarrow as pa

import ray.data

from cb.hashing import md5_lower64
from cb.sketch import (
    HLL_M,
    estimate,
    grouped_cardinality,
    registers_from_hashes,
)


def _hashes(n: int, salt: str) -> np.ndarray:
    return md5_lower64([f"{salt}:{i}" for i in range(n)])


def test_registers_fold_matches_scalar_definition():
    h = _hashes(500, "fold")
    regs = registers_from_hashes(h)
    want = np.zeros(HLL_M, dtype=np.uint8)
    p = HLL_M.bit_length() - 1
    rest_bits = 64 - p
    for v in h:
        v = int(v)
        idx = v >> rest_bits
        rest = v & ((1 << rest_bits) - 1)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        want[idx] = max(want[idx], rho)
    assert (regs == want).all()


def test_merge_is_monotone_max_monoid():
    a = registers_from_hashes(_hashes(300, "a"))
    b = registers_from_hashes(_hashes(400, "b"))
    both = registers_from_hashes(
        np.concatenate([_hashes(300, "a"), _hashes(400, "b")])
    )
    assert (np.maximum(a, b) == both).all()


def test_estimate_accuracy_across_ranges():
    # Linear-counting range (n << m), crossover, and large range.
    for n in (50, 1000, 30_000, 200_000):
        regs = registers_from_hashes(_hashes(n, f"acc{n}"))
        est = estimate(regs)
        assert abs(est - n) / n < 0.05, (n, est)


def test_estimate_ignores_duplicates():
    h = _hashes(2000, "dup")
    once = estimate(registers_from_hashes(h))
    tripled = estimate(registers_from_hashes(np.tile(h, 3)))
    assert once == tripled


def test_grouped_cardinality_distributed():
    rows = []
    truth = {"x": 700, "y": 60, "z": 1}
    for k, n in truth.items():
        for i in range(n):
            rows.append({"k": k, "v": f"{k}-{i}"})
            rows.append({"k": k, "v": f"{k}-{i}"})  # duplicate every value
    ds = ray.data.from_items(rows).repartition(7)
    out = grouped_cardinality(ds, "k", "v")
    assert out.column_names == ["k", "estimate"]
    got = {r["k"]: r["estimate"] for r in out.to_pylist()}
    assert set(got) == set(truth)
    for k, n in truth.items():
        assert abs(got[k] - n) / n < 0.05, (k, n, got[k])


def test_grouped_cardinality_matches_single_fold():
    """Partition-split register merge == one global fold (exactness of
    the monoid path, not just the estimate bound)."""
    vals = [f"v{i % 137}" for i in range(1000)]
    ds = ray.data.from_items([{"k": "g", "v": v} for v in vals]).repartition(5)
    out = grouped_cardinality(ds, "k", "v")
    regs = registers_from_hashes(md5_lower64(sorted(set(vals))))
    assert out["estimate"][0].as_py() == estimate(regs)


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters
# --------------------------------------------------------------------------

from cb.sketch import exact_heavy_hitters, heavy_hitters, mg_trim


def _zipf_items(n_kinds: int, total: int) -> list[str]:
    """Deterministic Zipf-ish stream: term i appears ~total/(i+1) times,
    interleaved (not sorted) so batch splits cut across terms."""
    out = []
    counts = {}
    weights = [1.0 / (i + 1) for i in range(n_kinds)]
    s = sum(weights)
    for i, w in enumerate(weights):
        counts[f"t{i:03d}"] = max(1, round(total * w / s))
    terms = sorted(counts)
    i = 0
    while any(counts[t] > 0 for t in terms):
        t = terms[i % len(terms)]
        if counts[t] > 0:
            out.append(t)
            counts[t] -= 1
        i += 1
    return out


def _true_counts(items):
    c = {}
    for t in items:
        c[t] = c.get(t, 0) + 1
    return c


def test_mg_trim_invariants():
    terms = np.asarray([f"x{i}" for i in range(20)], dtype=object)
    counts = np.arange(1, 21, dtype=np.int64)
    k = 5
    t, c = mg_trim(terms, counts, k)
    assert len(t) <= k
    assert (c > 0).all()
    # every kept counter lost exactly the (k+1)-th largest count
    thresh = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    orig = dict(zip(terms, counts))
    for term, est in zip(t, c):
        assert est == orig[term] - thresh


def test_heavy_hitters_mg_guarantees():
    """est <= true, true - est <= (n - M)/(k+1), and every term above
    n/(k+1) is present — on a skewed stream split across blocks."""
    items = _zipf_items(60, 5000)
    true = _true_counts(items)
    n_true = len(items)
    k = 8
    ds = ray.data.from_items([{"v": t} for t in items]).repartition(11)
    summary, n = heavy_hitters(ds, "v", k)
    assert n == n_true
    assert summary.num_rows <= k
    est = dict(zip(summary["term"].to_pylist(), summary["est"].to_pylist()))
    m_sum = sum(est.values())
    bound = (n - m_sum) / (k + 1)
    for t, e in est.items():
        assert e <= true[t]
        assert true[t] - e <= bound + 1e-9
    for t, c in true.items():
        if c > n / (k + 1):
            assert t in est, (t, c, n)


def test_exact_heavy_hitters_matches_brute_force():
    items = _zipf_items(40, 3000)
    true = _true_counts(items)
    n = len(items)
    for k in (3, 8, 16):
        ds = ray.data.from_items([{"v": t} for t in items]).repartition(7)
        out, n_got = exact_heavy_hitters(ds, "v", k)
        assert n_got == n
        want = sorted(
            ((t, c) for t, c in true.items() if c * (k + 1) > n),
            key=lambda tc: (-tc[1], tc[0]),
        )
        got = list(zip(out["term"].to_pylist(), out["cnt"].to_pylist()))
        assert got == want, (k, got, want)


def test_exact_heavy_hitters_block_order_independent():
    """Different partitionings (merge trees) give the identical exact
    output — the determinism the SQL oracle relies on."""
    items = _zipf_items(30, 2000)
    results = []
    for parts in (1, 4, 13):
        ds = ray.data.from_items([{"v": t} for t in items]).repartition(parts)
        out, n = exact_heavy_hitters(ds, "v", 6)
        results.append((n, out.to_pylist()))
    assert results[0] == results[1] == results[2]


def test_exact_heavy_hitters_tokenized():
    docs = [
        {"text": "alpha beta alpha"},
        {"text": "alpha gamma"},
        {"text": "beta alpha delta epsilon zeta"},
    ]
    ds = ray.data.from_items(docs)
    out, n = exact_heavy_hitters(ds, "text", k=2, tokenize=True)
    # 10 tokens; threshold n/3 -> only 'alpha' (4 > 3.33)
    assert n == 10
    assert out.to_pylist() == [{"term": "alpha", "cnt": 4}]


def test_exact_heavy_hitters_empty():
    ds = ray.data.from_items([{"v": "a"}]).filter(lambda r: False)
    out, n = exact_heavy_hitters(ds, "v", 4)
    assert n == 0 and out.num_rows == 0


# ---------------------------------------------------------------------------
# QuantileSketch
# ---------------------------------------------------------------------------

from cb.sketch import QuantileSketch, grouped_quantile_sketch


def test_quantile_sketch_weight_conserved():
    rng = np.random.default_rng(11)
    x = rng.normal(size=12345)
    sk = QuantileSketch(64)
    for chunk in np.array_split(x, 17):
        sk.update_many(chunk)
    assert sk.n == len(x)


def test_quantile_sketch_rank_error_bound():
    rng = np.random.default_rng(3)
    x = rng.exponential(size=50000)
    sk = QuantileSketch(256)
    for chunk in np.array_split(x, 41):
        sk.update_many(chunk)
    xs = np.sort(x)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        lt = np.searchsorted(xs, est, side="left") / len(xs)
        le = np.searchsorted(xs, est, side="right") / len(xs)
        assert lt - 0.02 <= q <= le + 0.02, (q, est, lt, le)


def test_quantile_sketch_merge_conserves_and_bounds():
    rng = np.random.default_rng(5)
    x = rng.normal(size=30001)
    parts = np.array_split(x, 7)
    sketches = []
    for p in parts:
        s = QuantileSketch(128)
        s.update_many(p)
        sketches.append(s)
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    assert acc.n == len(x)
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9):
        est = acc.quantile(q)
        lt = np.searchsorted(xs, est, side="left") / len(xs)
        le = np.searchsorted(xs, est, side="right") / len(xs)
        assert lt - 0.03 <= q <= le + 0.03


def test_quantile_sketch_small_group_is_exact():
    # under one level-0 capacity the sketch stores everything verbatim
    x = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    sk = QuantileSketch(64)
    sk.update_many(x)
    assert sk.quantile(0.5) == 3.0  # quantile_disc: ceil(0.5*5)=3rd value
    assert sk.quantile(1.0) == 5.0
    assert sk.quantile(0.01) == 1.0


def test_quantile_sketch_deterministic():
    rng = np.random.default_rng(9)
    x = rng.normal(size=20000)
    outs = []
    for _ in range(2):
        sk = QuantileSketch(128)
        for chunk in np.array_split(x, 13):
            sk.update_many(chunk)
        outs.append([sk.quantile(q) for q in (0.1, 0.5, 0.9)])
    assert outs[0] == outs[1]


def test_grouped_quantile_sketch_distributed():
    rng = np.random.default_rng(21)
    rows = []
    for key, mu in (("a", 100.0), ("b", 500.0)):
        for v in rng.normal(mu, 10.0, size=4000):
            rows.append({"k": key, "v": float(v)})
    ds = ray.data.from_items(rows).repartition(8)
    out = grouped_quantile_sketch(ds, "k", "v", (0.5,), k=128)
    got = {r["k"]: r["est"] for r in out.to_pylist()}
    assert abs(got["a"] - 100.0) < 2.0
    assert abs(got["b"] - 500.0) < 2.0
