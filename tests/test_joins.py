"""Unit tests for cb.joins asof_join / interval_join against pandas
merge_asof / a brute-force interval sweep on small random inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from cb import joins


def _rand_sides(seed, n_left=400, n_right=300, n_keys=12, str_keys=False):
    rng = np.random.default_rng(seed)
    keys = (
        np.array([f"k{i:02d}" for i in range(n_keys)])
        if str_keys
        else np.arange(n_keys, dtype=np.int64)
    )
    left = pd.DataFrame(
        {
            "k": keys[rng.integers(0, n_keys, n_left)],
            "ts": rng.integers(0, 10_000, n_left).astype(np.int64),
            "lv": rng.normal(size=n_left),
        }
    )
    # drop one key from the right side entirely so unmatched rows exist
    right = pd.DataFrame(
        {
            "k": keys[rng.integers(1, n_keys, n_right)],
            "ts": rng.integers(0, 10_000, n_right).astype(np.int64),
            "rv": rng.integers(0, 1000, n_right).astype(np.int64),
        }
    )
    return left, right


def _expected_asof(left, right, direction, how, tolerance=None):
    l = left.sort_values("ts", kind="mergesort").reset_index(drop=True)
    r = right.sort_values("ts", kind="mergesort").reset_index(drop=True)
    r = r.rename(columns={"ts": "ts_r"}) if False else r
    m = pd.merge_asof(
        l,
        r.assign(__m=True),
        on="ts",
        by="k",
        direction=direction,
        tolerance=tolerance,
        suffixes=("", "_r"),
    )
    if how == "inner":
        m = m[m["__m"].notna()]
    return m.drop(columns="__m").reset_index(drop=True)


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or str(df[c].dtype) == "Int64":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_matches_pandas(direction, how):
    left, right = _rand_sides(seed=7)
    got = (
        joins.asof_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(4),
            on="ts",
            by="k",
            direction=direction,
            how=how,
            num_buckets=6,
        )
        .to_pandas()
    )
    want = _expected_asof(left, right, direction, how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_asof_string_keys_and_tolerance():
    left, right = _rand_sides(seed=11, str_keys=True)
    got = joins.asof_join(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(3),
        on="ts",
        by="k",
        direction="backward",
        how="left",
        tolerance=500,
        num_buckets=4,
    ).to_pandas()
    want = _expected_asof(left, right, "backward", "left", tolerance=500)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_asof_column_collision_suffix():
    left = pd.DataFrame({"k": [1, 1], "ts": [5, 9], "v": [1.0, 2.0]})
    right = pd.DataFrame({"k": [1], "ts": [4], "v": [9.0]})
    got = joins.asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="ts",
        by="k",
        num_buckets=2,
    ).to_pandas()
    assert set(got.columns) == {"k", "ts", "v", "v_r"}
    assert sorted(got["v_r"].tolist()) == [9.0, 9.0]


def test_asof_rejects_bad_args():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "ts": [1]}))
    with pytest.raises(ValueError):
        joins.asof_join(ds, ds, on="ts", by="k", direction="sideways")
    with pytest.raises(ValueError):
        joins.asof_join(ds, ds, on="ts", by="k", how="outer")


def _expected_interval(df, intervals, closed):
    rows = []
    for _, iv in intervals.iterrows():
        lo_ok = df["x"] >= iv["lo"] if closed in ("left", "both") else df["x"] > iv["lo"]
        hi_ok = df["x"] <= iv["hi"] if closed in ("right", "both") else df["x"] < iv["hi"]
        hit = df[lo_ok & hi_ok].copy()
        hit["band"] = iv["band"]
        rows.append(hit)
    return pd.concat(rows, ignore_index=True)


@pytest.mark.parametrize("closed", ["left", "both", "right", "neither"])
def test_interval_join_matches_bruteforce(closed):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(500), "x": rng.uniform(0, 100, 500)})
    intervals = pd.DataFrame(
        {"band": np.arange(12), "lo": np.arange(12) * 10.0, "hi": np.arange(12) * 10.0 + 15.0}
    )
    got = joins.interval_join(
        ray.data.from_pandas(df).repartition(4),
        pa.Table.from_pandas(intervals),
        on="x",
        closed=closed,
    ).to_pandas()
    want = _expected_interval(df, intervals, closed)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


def test_interval_join_caps_broadcast_side():
    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0]}))
    big = pa.table(
        {
            "band": pa.array(np.arange(5000)),
            "lo": pa.array(np.zeros(5000)),
            "hi": pa.array(np.ones(5000)),
        }
    )
    with pytest.raises(ValueError, match="caps at"):
        joins.interval_join(ds, big, on="x")
