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
