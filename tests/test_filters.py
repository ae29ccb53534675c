"""SimpleFilter parity — validity and satisfaction vectors from the
upstream FilterTests.cs:11-34, evaluated through the REAL pushdown path
(a pyarrow dataset filter over a one-row table)."""

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from cb import filters


def _satisfies(expr: str, value) -> bool:
    tbl = pa.table({"Shimra": [value]})
    f = filters.compile_filter(expr)
    return pads.dataset(tbl).to_table(filter=f).num_rows == 1


@pytest.mark.parametrize("bad", ["a>b", "a >=b", "a > b >= "])
def test_invalid_cases(bad):
    # FilterTests.cs:11-17 — unspaced ops and multi-operator strings
    with pytest.raises(ValueError):
        filters.compile_filter(bad)
    with pytest.raises(ValueError):
        filters.to_sql(bad)


@pytest.mark.parametrize(
    "expr,value,result",
    [
        ("Shimra == true", True, True),
        ("Shimra == false", True, False),
        ("Shimra == false", False, True),
        ("Shimra >= 10", 10, True),
        ("Shimra <= 10", 89080, False),
        ("Shimra != 4234.4", 4234.4, False),
        ("Shimra != shomi", "shomi", False),
    ],
)
def test_valid_cases(expr, value, result):
    # FilterTests.cs:19-33
    assert _satisfies(expr, value) == result


def test_or_union_and_sql_mirror():
    import duckdb

    expr = "Shimra >= 100 | Shimra == 7"
    assert _satisfies(expr, 7) and _satisfies(expr, 150) and not _satisfies(expr, 50)
    sql = filters.to_sql(expr)
    for v, want in ((7, 1), (150, 1), (50, 0)):
        got = duckdb.sql(f"SELECT count(*) FROM (SELECT {v} AS Shimra) WHERE {sql}").fetchone()[0]
        assert got == want, v
