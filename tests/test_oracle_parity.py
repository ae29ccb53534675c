"""Mimic the driver's correctness gate: run every queries() entry and its
DuckDB oracle SQL over the same sf-dir tables, compare row counts,
schemas (column names), and values (order-insensitive, exact)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("CB_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj
    return obj.to_pandas()  # ray Dataset


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name):
    got = _canon(_to_df(QUERIES[name](SF_DIR)))
    con = _connect(SF_DIR)
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"rows: got {len(got)} want {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            same = (g.astype("float64").values == w.astype("float64").values)
            assert same.all(), f"{name}.{col}: {int((~same).sum())} float mismatches; first: {g[~same].head(3).tolist()} vs {w[~same].head(3).tolist()}"
        else:
            pd.testing.assert_series_equal(
                g, w, check_names=False, check_dtype=False, obj=f"{name}.{col}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    got = _to_df(QUERIES[name](SF_DIR))
    assert got is not None and len(got) >= 0
