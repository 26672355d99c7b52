"""Approximate-sketch operators — the 100 TB versions of distinct
counts and quantiles (SURVEY.md §2.4 A4).

These are rows-only queries() entries: HLL++ / KLL sketch values are
engine-specific by construction (DuckDB uses different sketches), so
no cross-engine value oracle exists. tests/test_sketches.py bounds
their error against the exact answers instead — the meaningful
correctness statement for an approximate operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune


def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts per returnflag (rsd 1%) next to the scan
    cost they avoid: the exact version shuffles every distinct key;
    this shuffles fixed-size sketch buffers."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("apx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("apx_orders"),
    )


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (accuracy 10000) per returnflag — mergeable
    sketches, one pass, bounded memory regardless of group size."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").alias(
            "apx_p50_90_99"
        )
    )


QUERIES = {
    "approx_distinct_counts": approx_distinct_counts,  # rows-only
    "approx_quantiles": approx_quantiles,              # rows-only
}

ORACLES: dict[str, str] = {}
