"""Golden + parity tests for the code-aware analyzer.

Modeled on the reference's parser-conformance tests
(/root/reference/test/ConveyorBelt.Tooling.Test/IisLogTests.cs:37-110):
exact expected outputs on hand-written inputs, plus three-way parity
(Arrow kernels == pure Python == DuckDB SQL) on edge cases.
"""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cb import analyze

GOLDEN = [
    ("camelCaseIdent", ["camel", "case", "ident"]),
    ("snake_case_ident", ["snake", "case", "ident"]),
    ("SCREAMING_CASE", ["screaming", "case"]),
    ("HTMLParser2", ["html", "parser", "2"]),
    ("x86_64", ["x", "86", "64"]),
    ("", []),
    ("the and of to", []),  # only stopwords
    ("The Quick-brown_fox", ["quick", "brown", "fox"]),
    ("def foo(bar):\n    return bar*2", ["def", "foo", "bar", "return", "bar", "2"]),
    ("import numpy as np", ["import", "numpy", "np"]),
    ("getHTTPResponseCode", ["get", "http", "response", "code"]),
    ("a2b", ["2", "b"]),  # a->stopword after digit split
    ("éclair café", ["clair", "caf"]),  # non-ascii acts as separator
    ("x" * 65, []),  # overlong token dropped
    ("x" * 64, ["x" * 64]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_tokenize_golden(text, expected):
    assert analyze.tokenize(text) == expected


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_token_array_matches_python(text, expected):
    arr = analyze.token_array(pa.array([text]))
    assert arr.to_pylist() == [expected]


def test_sql_parity_on_golden():
    con = duckdb.connect()
    texts = [t for t, _ in GOLDEN]
    tbl = pa.table({"s": pa.array(texts)})  # noqa: F841 — registered below
    con.register("t", tbl)
    rows = con.sql(f"select {analyze.sql_token_array('s')} from t").fetchall()
    assert [r[0] for r in rows] == [analyze.tokenize(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_python_arrow_parity_fuzz(text):
    py = analyze.tokenize(text)
    ar = analyze.token_array(pa.array([text])).to_pylist()[0]
    assert py == ar


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", categories=("Lu", "Ll", "Nd", "Po", "Zs")
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_sql_parity_fuzz(texts):
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(texts, type=pa.string())}))
    rows = con.sql(f"select {analyze.sql_token_array('s')} from t").fetchall()
    assert [r[0] for r in rows] == [analyze.tokenize(t) for t in texts]


def test_term_frequencies():
    ids = pa.array([10, 20], type=pa.int64())
    texts = pa.array(["foo bar foo", "the bar"])
    tf, stats = analyze.term_frequencies(ids, texts)
    got = {(r["doc_id"], r["term"]): r["tf"] for r in tf.to_pylist()}
    assert got == {(10, "foo"): 2, (10, "bar"): 1, (20, "bar"): 1}
    assert stats.to_pylist() == [
        {"doc_id": 10, "doc_len": 3},
        {"doc_id": 20, "doc_len": 1},
    ]
