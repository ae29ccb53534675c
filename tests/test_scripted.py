"""scripted_metric (cb/scripted.py): the map/reduce contract, registry
resolution by config string, and injection of a user-defined script."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cb import registry, scripted


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["a", "b", "a", "b", "a"], pa.string()),
                "n_chars": pa.array([1, 512, 513, 1024, 100], pa.int64()),
            }
        )
    ).repartition(3)


def test_block_usage_by_name():
    out = scripted.scripted_metric(_ds(), "block_usage")
    rows = {r["source"]: r for r in out.to_pylist()}
    # a: blocks 1, 2, 1 -> total 4, max 2, avg 4/3; b: 1, 2 -> 3, 2, 1.5
    assert rows["a"]["total_blocks"] == 4 and rows["a"]["max_blocks"] == 2
    assert rows["a"]["avg_blocks"] == 4 / 3
    assert rows["b"]["total_blocks"] == 3 and rows["b"]["max_blocks"] == 2
    assert rows["b"]["avg_blocks"] == 1.5


def test_partials_fold_exactly_across_repartitions():
    # state folding must be order/partition free: 1 block vs 5 blocks
    a = scripted.scripted_metric(_ds().repartition(1), "block_usage")
    b = scripted.scripted_metric(_ds().repartition(5), "block_usage")
    assert a.equals(b)


def test_custom_script_injection():
    class VowelCount:
        # a metric no builtin covers: total vowels in source labels,
        # weighted by doc count
        def map_batch(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"v": pa.array([], pa.int64())})
            src = np.array(batch["source"].to_pylist())
            v = np.array(
                [sum(c in "aeiou" for c in s) for s in src], dtype=np.int64
            )
            return pa.table({"v": pa.array([int(v.sum())], pa.int64())})

        def reduce(self, states: pa.Table) -> pa.Table:
            tot = int(np.sum(states["v"].to_numpy(zero_copy_only=False)))
            return pa.table({"total_vowels": pa.array([tot], pa.int64())})

    registry.register("metric_script", "vowels", VowelCount())
    out = scripted.scripted_metric(_ds(), "vowels")
    assert out.to_pylist() == [{"total_vowels": 3}]  # 'a' x3 + 'b' x2 -> 3
    assert "vowels" in registry.names("metric_script")


def test_unknown_script_name():
    with pytest.raises(KeyError):
        scripted.scripted_metric(_ds(), "no_such_script")
