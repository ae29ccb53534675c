"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the ``cb`` package) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from cb import pipelines


def entry() -> Any:
    """Flagship pipeline on sf0.001: build the inverted index over the
    documents table, serve the reference query set through the
    ShardServer actor pool, return (query_id, rank, doc_id, score)."""
    return pipelines.q_bm25_topk_scores("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(pipelines.QUERIES)


def oracle_sql() -> dict[str, str]:
    return pipelines.oracle_sql()
