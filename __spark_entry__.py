"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spec_search_spark`` (see SURVEY.md §2 for
the operator inventory mapping).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-to-end pipeline (E1+E2) —
    index-build over documents (filter → chunk → embed pandas_udf →
    composite id) then semantic top-k for a probe string
    (SURVEY.md §7 "minimum slice")."""
    from spec_search_spark.operators.similarity import semantic_search

    return semantic_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spec_search_spark.operators import all_queries

    q, _ = all_queries()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — every registered query
    has one (non-SQL-expressible ops register self-verifying invariant
    outputs whose oracles ARE expressible; their byte-level semantics
    are additionally property-tested in tests/)."""
    from spec_search_spark.operators import all_queries

    _, o = all_queries()
    return o
