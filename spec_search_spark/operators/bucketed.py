"""Bucketed (co-located) join: the shuffle-free fact-to-fact join.

The reference never joins at all (`SURVEY.md §2.3` — its only
join-like behavior is the hosted Chroma id→document lookup,
`/root/reference/app.py:50-52`), but a 100 TB engine lives or dies on
fact-to-fact joins, and the single biggest lever Spark offers is
BUCKETING: write both tables hash-clustered into the same number of
buckets on the join key, and every future join on that key reads
bucket i against bucket i with NO exchange on either side — the
shuffle is paid once at write time and amortized over every downstream
join. lineitem⋈orders on orderkey is exactly the join every TPC-H-ish
workload repeats.

Plan invariant (machine-checked in plans/audit.py): the join is a
SortMergeJoin whose children are bucketed scans — zero
`Exchange hashpartitioning` on either orderkey. The merge hint pins
SMJ so the invariant is about bucketing, not about AQE's size-based
broadcast choice at toy scale.

The bucketed copies are written once per (session, corpus) into a
temp-dir-backed table (in-memory catalog, explicit `path` option) and
memoized — an index-shaped artifact like ivf's trained centroids.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import prune_memo, tune

N_BUCKETS = 8

_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BUCKETED:
        tag = uuid.uuid4().hex[:8]
        base = tempfile.mkdtemp(prefix="spec_search_bucketed_")
        li_name, ord_name = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount", "l_quantity")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, "lineitem"))
            .mode("overwrite")
            .saveAsTable(li_name)
        )
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, "orders"))
            .mode("overwrite")
            .saveAsTable(ord_name)
        )
        prune_memo(_BUCKETED, key[0])
        _BUCKETED[key] = (li_name, ord_name)
    return _BUCKETED[key]


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through the bucketed lineitem⋈orders
    join — same answer as the plain join (the oracle runs on the
    original parquet), but the plan carries no exchange on orderkey.

    FIXTURES rule 3: the revenue sum accumulates in exact integer
    cents-4 (like its agg sibling below) and only converts to the 4dp
    grid at output — a double sum rounded at a coarser 2dp grid would
    let ~1e-13 accumulation-order noise pick the side of an exact
    x.xx5 boundary (Spark's partial-agg order ≠ DuckDB's scan order)."""
    tune(spark)
    li_name, ord_name = _bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(ord_name).hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(
                "cast(sum(cast(round(l_extendedprice * (1.0 - l_discount) * 10000)"
                " as bigint)) as double) / 1e4"
            ).alias("revenue"),
        )
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS DOUBLE) / 1e4 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def bucketed_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order revenue aggregated ON the bucketed lineitem scan: the
    groupBy key equals the bucketing key, so the scan's bucket layout
    already satisfies the aggregation's required distribution — the
    plan carries NO exchange at all (audited). This is the second
    amortization of the bucketed write: the one-time layout shuffle
    pays for every downstream join AND every keyed aggregation.

    Exact integer cents (sum of round(price·(1−disc)·1e4) fits BIGINT
    per order) so the per-order totals compare exactly; ~n_orders
    output rows, the oracle groups the raw parquet."""
    tune(spark)
    li_name, _ = _bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "sum(cast(round(l_extendedprice * (1.0 - l_discount) * 10000) as bigint))"
        ).alias("revenue_c4"),
    )


BUCKETED_AGG_SQL = """
SELECT l_orderkey AS orderkey,
       count(*) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT))
            AS BIGINT) AS revenue_c4
FROM lineitem
GROUP BY l_orderkey
"""


QUERIES = {
    "bucketed_join_revenue": bucketed_join_revenue,
    "bucketed_agg_revenue": bucketed_agg_revenue,
}

ORACLES = {
    "bucketed_join_revenue": BUCKETED_JOIN_SQL,
    "bucketed_agg_revenue": BUCKETED_AGG_SQL,
}
