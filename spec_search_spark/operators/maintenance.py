"""Materialized-aggregate maintenance ops — the incremental-compute
layer a 100 TB warehouse runs so dashboards never rescan the base
table: delta-merge maintenance of a materialized aggregate, and
multi-granularity rollups derived from finer partials (the
TimescaleDB/Druid "continuous aggregate" pattern).

The reference recomputes its index from scratch on every run
(`/root/reference/indexer.py:80-96` loops all sheets); these operators
are the engine-side answer for when that stops being affordable.

Both queries are SELF-CONTAINED demonstrations with exact oracles:
the Spark side maintains incrementally (merge partials, never touch
base rows), the DuckDB oracle recomputes from scratch — value
equality IS the proof that incremental == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

# orders before the cutover are the "materialized base"; the rest is
# the incoming delta batch
CUTOVER_DATE = "1997-01-01"


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-customer (count, sum, max) aggregate under a new
    batch WITHOUT rescanning the base: the base aggregate is
    materialized once (count/sum/max are MERGEABLE partials — the same
    algebra Spark's partial+final aggregation runs inside one job,
    lifted to across-job maintenance), the delta batch aggregates
    alone, and a union + re-aggregate merges the two partial sets.

    avg is derived (sum/count) at presentation — the classic
    decomposition that makes non-mergeable-looking outputs
    maintainable. At 100 TB: the delta is a day of data, the base agg
    is customer-cardinality-sized; neither the base TABLE nor its
    history is read again. The DuckDB oracle aggregates the whole
    orders table from scratch — equality proves incremental == batch.

    Plan: two scans (base once at materialization, delta once), both
    with partial+final hash aggregates; the merge re-agg runs over
    2 x customer-cardinality rows.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit(CUTOVER_DATE).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("s"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cut))
    # .cache() marks the materialization boundary: maintenance reads
    # THIS, not the base table (at 100 TB it would be a stored table)
    base = base.cache()
    delta = partial(orders.filter(F.col("o_orderdate") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum("s").alias("_s"),
            F.max("mx").alias("max_price"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.round("_s", 2).alias("total_price"),
        F.round(F.col("_s") / F.col("n_orders"), 4).alias("avg_price"),
        "max_price",
    )


INCREMENTAL_MERGE_SQL = """
SELECT o_custkey,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       round(sum(o_totalprice) / count(*), 4) AS avg_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_custkey
"""


def multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute -> hour -> day rollup where each coarser level
    re-aggregates the FINER level's partials, never the raw events —
    the continuous-aggregate hierarchy (count and sum are mergeable;
    the minute layer is ~events/60 rows, the hour layer ~minutes/60).

    At 100 TB the raw table is read exactly once for the whole
    hierarchy; every dashboard granularity above it is maintained from
    the level below at negligible cost. The oracle computes each level
    straight from raw events — equality proves the rollup chain is
    lossless.

    Plan: one scan + three hash aggregates, each over the previous
    output; the minute agg partials combine map-side so the single
    shuffle carries minute-granularity rows.
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("t"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("t")).alias("t"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    day = hour.groupBy(
        F.date_trunc("day", F.col("t")).alias("t"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))

    def present(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("t"),
            "event_type",
            "n",
            F.round("s", 2).alias("sum_value"),
        )

    return (
        present(hour, "hour")
        .unionByName(present(day, "day"))
    )


MULTI_ROLLUP_SQL = """
SELECT 'hour' AS level,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS t,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day' AS level,
       strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS t,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 2, 3
"""


QUERIES = {
    "incremental_agg_merge": incremental_agg_merge,
    "multi_granularity_rollup": multi_granularity_rollup,
}

ORACLES = {
    "incremental_agg_merge": INCREMENTAL_MERGE_SQL,
    "multi_granularity_rollup": MULTI_ROLLUP_SQL,
}
