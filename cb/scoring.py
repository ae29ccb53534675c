"""BM25 math — the single source of truth for score arithmetic.

Standard Lucene/ES formula (the scoring ConveyorBelt delegates to
Elasticsearch, /root/reference/README.md:5-8):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    u(tf, dl)  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d,q) = sum over unique query terms t in sorted(t) order of idf(t) * u(tf, dl)

Rank-identity requirements (SURVEY.md §7.4): all arithmetic float64; the
sum over query terms accumulates in SORTED TERM ORDER in every code path
(oracle, shard scorer, WAND, and the DuckDB oracle SQL via an ordered
aggregate) so results are bitwise comparable; ties broken by ascending
doc_id.  Every engine component imports these functions — never inline
the formula.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df, n_docs: int):
    """float64 idf; df may be scalar or ndarray.

    Deliberately ``log(1.0 + x)`` (not ``log1p``): the DuckDB oracle
    evaluates ``ln(1 + x)`` as two IEEE double ops through libm, and
    bitwise score parity with the SQL oracle is part of the spec.
    """
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def u_factor(tf, dl, avgdl: float, k1: float = K1, b: float = B):
    """Doc-dependent BM25 factor; tf/dl may be scalars or ndarrays."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / np.float64(avgdl)))


def sql_score_terms(n_docs_expr: str, avgdl_expr: str) -> str:
    """DuckDB expression for one (term, doc) contribution.

    Expects columns ``df`` (per term), ``tf``, ``doc_len`` in scope.
    Mirrors :func:`idf` * :func:`u_factor` exactly (ln/div/mul are IEEE
    double in both engines).
    """
    # NB: bare decimal literals are DECIMAL in DuckDB (exact arithmetic),
    # which diverges from float64 by ulps — cast every constant to DOUBLE.
    k1 = f"CAST({K1} AS DOUBLE)"
    b = f"CAST({B} AS DOUBLE)"
    half = "CAST(0.5 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    idf_sql = f"ln({one} + (({n_docs_expr}) - df + {half}) / (df + {half}))"
    u_sql = (
        f"tf * ({k1} + {one}) / "
        f"(tf + {k1} * ({one} - {b} + {b} * doc_len / ({avgdl_expr})))"
    )
    return f"({idf_sql}) * ({u_sql})"


def sql_score_terms_weighted(n_docs_expr: str, avgdl_expr: str, w_expr: str) -> str:
    """Boost-weighted contribution: ``((idf * w) * u)`` — the weight
    multiplies idf FIRST (one scalar double per term), exactly where the
    engine applies it (querylang.execute precomputes ``idf * w``), so
    ``w == 1`` stays bitwise identical to :func:`sql_score_terms`."""
    k1 = f"CAST({K1} AS DOUBLE)"
    b = f"CAST({B} AS DOUBLE)"
    half = "CAST(0.5 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    idf_sql = f"ln({one} + (({n_docs_expr}) - df + {half}) / (df + {half}))"
    u_sql = (
        f"tf * ({k1} + {one}) / "
        f"(tf + {k1} * ({one} - {b} + {b} * doc_len / ({avgdl_expr})))"
    )
    return f"(({idf_sql}) * ({w_expr})) * ({u_sql})"
