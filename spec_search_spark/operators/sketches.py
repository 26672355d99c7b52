"""Approximate-sketch operators — the 100 TB versions of distinct
counts and quantiles (SURVEY.md §2.4 A4).

Sketch values are engine-specific by construction (DuckDB uses
different HLL/quantile sketches), so no cross-engine value oracle can
compare them directly. Instead each query is SELF-VERIFYING: Spark
computes the approximate value AND the exact answer AND the published
error-bound check, then outputs the exact values plus boolean
bound-holds flags — all of which a trivial DuckDB oracle can pin.
(The raw sketch outputs remain available via the underlying
functions; tests/test_sketches.py additionally bounds their error.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

HLL_RSD = 0.01        # relative standard deviation passed to HLL++
HLL_TOL = 5 * HLL_RSD  # 5σ acceptance band — pass probability ~1-1e-6
PCT_ACCURACY = 10000   # approx_percentile accuracy → rank error ≤ n/accuracy
QUANTILES = [0.5, 0.9, 0.99]


def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts per returnflag (rsd 1%) cross-checked
    against the exact distinct counts in the same aggregation.

    Scale: the exact version shuffles every distinct key; HLL shuffles
    fixed-size sketch buffers. Output = exact counts (oracle-checkable)
    + bound-holds flags for the sketch estimates.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=HLL_RSD).alias("apx_parts"),
        F.countDistinct("l_partkey").alias("ex_parts"),
        F.approx_count_distinct("l_orderkey", rsd=HLL_RSD).alias("apx_orders"),
        F.countDistinct("l_orderkey").alias("ex_orders"),
    )
    def ok(apx: str, ex: str) -> F.Column:
        return (
            F.abs(F.col(apx) - F.col(ex)).cast("double")
            <= F.col(ex).cast("double") * HLL_TOL
        )
    return agg.select(
        "l_returnflag",
        "ex_parts",
        "ex_orders",
        ok("apx_parts", "ex_parts").alias("parts_ok"),
        ok("apx_orders", "ex_orders").alias("orders_ok"),
    )


APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS ex_parts,
       count(DISTINCT l_orderkey) AS ex_orders,
       true AS parts_ok,
       true AS orders_ok
FROM lineitem
GROUP BY l_returnflag
"""


def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (accuracy 10000) per returnflag — mergeable
    sketches, one pass, bounded memory regardless of group size.

    Self-verifying: the returned value's rank in the group must lie
    within the sketch's published ±n/accuracy rank-error band,
    recomputed from the raw data (count ≤/<) in the same job.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    apx = li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(l_extendedprice, "
            f"array({', '.join(str(q) for q in QUANTILES)}), {PCT_ACCURACY})"
        ).alias("apx")
    )
    qlits = F.array(*[F.lit(float(q)) for q in QUANTILES])
    probes = apx.select(
        "l_returnflag", F.posexplode("apx").alias("i", "val")
    ).select(
        "l_returnflag", F.element_at(qlits, F.col("i") + 1).alias("q"), "val"
    )
    joined = li.join(F.broadcast(probes), "l_returnflag")
    stats = joined.groupBy("l_returnflag", "q", "val").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_extendedprice") <= F.col("val"), 1).otherwise(0)).alias("n_le"),
        F.sum(F.when(F.col("l_extendedprice") < F.col("val"), 1).otherwise(0)).alias("n_lt"),
    )
    eps = 1.0 / PCT_ACCURACY + 1e-9
    rank_ok = (
        F.col("n_le") >= F.floor((F.col("q") - eps) * F.col("n"))
    ) & (F.col("n_lt") <= F.ceil((F.col("q") + eps) * F.col("n")))
    return stats.select("l_returnflag", "q", rank_ok.alias("rank_ok"))


APPROX_QUANTILES_SQL = f"""
SELECT f.l_returnflag, t.q, true AS rank_ok
FROM (SELECT DISTINCT l_returnflag FROM lineitem) f,
     (VALUES {', '.join(f'({q}::DOUBLE)' for q in QUANTILES)}) t(q)
"""


QUERIES = {
    "approx_distinct_counts": approx_distinct_counts,
    "approx_quantiles": approx_quantiles,
}

ORACLES = {
    "approx_distinct_counts": APPROX_DISTINCT_SQL,
    "approx_quantiles": APPROX_QUANTILES_SQL,
}
