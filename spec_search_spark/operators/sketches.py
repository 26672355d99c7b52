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


def percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB twin of `percentiles_exact`
    (operators/scalar_sql.py): same p50/p90/p99 statistic, computed
    with `approx_percentile` (accuracy 10000) whose KLL-style sketch
    keeps BOUNDED per-group state and merges in a normal partial+final
    aggregate — no full-column buffering anywhere in the plan
    (plans/audit.py pins `partial_approx_percentile` and forbids the
    exact `partial_percentile` state).

    Runs on orders.o_totalprice per o_orderstatus (the exact twin
    covers lineitem) so the two quantile surfaces differ. Sketch
    values are engine-specific, so per module convention the output is
    the exact group count plus one bound-holds flag per quantile: the
    returned value's true rank (recomputed from the raw data with
    plain count aggregates) must sit within the published ±n/accuracy
    band. At test scale the exact rank recomputation IS the oracle for
    the sketch; at 100 TB you would drop the flags and keep the `apx`
    values.
    """
    tune(spark)
    od = load_table(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    apx = od.groupBy("o_orderstatus").agg(
        F.expr(
            f"approx_percentile(o_totalprice, "
            f"array({', '.join(str(q) for q in QUANTILES)}), {PCT_ACCURACY})"
        ).alias("apx")
    )
    qlits = F.array(*[F.lit(float(q)) for q in QUANTILES])
    probes = apx.select(
        "o_orderstatus", F.posexplode("apx").alias("i", "val")
    ).select(
        "o_orderstatus", F.element_at(qlits, F.col("i") + 1).alias("q"), "val"
    )
    joined = od.join(F.broadcast(probes), "o_orderstatus")
    stats = joined.groupBy("o_orderstatus", "q", "val").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") <= F.col("val"), 1).otherwise(0)).alias("n_le"),
        F.sum(F.when(F.col("o_totalprice") < F.col("val"), 1).otherwise(0)).alias("n_lt"),
    )
    eps = 1.0 / PCT_ACCURACY + 1e-9
    rank_ok = (
        F.col("n_le") >= F.floor((F.col("q") - eps) * F.col("n"))
    ) & (F.col("n_lt") <= F.ceil((F.col("q") + eps) * F.col("n")))
    # pivot the three (q, rank_ok) rows to one wide row per group
    return (
        stats.groupBy("o_orderstatus")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("q") == 0.5, rank_ok)).alias("p50_ok"),
            F.max(F.when(F.col("q") == 0.9, rank_ok)).alias("p90_ok"),
            F.max(F.when(F.col("q") == 0.99, rank_ok)).alias("p99_ok"),
        )
    )


PERCENTILES_APPROX_SQL = """
SELECT o_orderstatus, count(*) AS n,
       true AS p50_ok, true AS p90_ok, true AS p99_ok
FROM orders
GROUP BY o_orderstatus
"""


N_HIST_BUCKETS = 10


def equi_depth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered 100 TB twin of `equi_depth_histogram`
    (operators/scalar_sql.py): same integer-cents domain and the same
    classify-against-broadcast-cuts shape, but the 9 cuts come from
    `approx_percentile` (accuracy 10000) — bounded mergeable sketch
    state, partial+final aggregate, no full-column buffering (the
    exact twin's single-state `percentile` is precisely what this
    replaces at scale; plans/audit.py forbids `partial_percentile`
    here).

    Approx cuts shift bucket boundaries by at most the sketch's
    ±n/accuracy rank error, so raw bucket counts are not cross-engine
    pinnable. Self-verifying output (module convention), one row per
    bucket: the cut's true rank must sit in the published band
    (`rank_ok`, recomputed from raw data with count aggregates), and
    the realized bucket depth must lie within n/10 ± (2n/accuracy +
    tie mass at the bounding cuts) (`depth_ok` — the equi-depth
    guarantee an optimizer relies on). Both are mathematical
    consequences of the sketch bound, hence deterministically true.
    """
    tune(spark)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    li = load_table(spark, sf_dir, "lineitem").select(cents.alias("cents"))
    fracs = ", ".join(str(i / N_HIST_BUCKETS) for i in range(1, N_HIST_BUCKETS))
    cuts = li.agg(
        F.expr(f"approx_percentile(cents, array({fracs}), {PCT_ACCURACY})").alias("cuts"),
        F.count(F.lit(1)).alias("n_total"),
    )
    probes = cuts.select(
        F.posexplode("cuts").alias("i", "cut"), "n_total"
    ).select((F.col("i") + 1).alias("cut_idx"), "cut", "n_total")
    stats = (
        li.join(F.broadcast(probes))
        .groupBy("cut_idx", "cut", "n_total")
        .agg(
            F.sum(F.when(F.col("cents") <= F.col("cut"), 1).otherwise(0)).alias("n_le"),
            F.sum(F.when(F.col("cents") < F.col("cut"), 1).otherwise(0)).alias("n_lt"),
        )
    )
    eps = 1.0 / PCT_ACCURACY + 1e-9
    q = F.col("cut_idx") / F.lit(float(N_HIST_BUCKETS))
    rank_ok = (
        F.col("n_le") >= F.floor((q - eps) * F.col("n_total"))
    ) & (F.col("n_lt") <= F.ceil((q + eps) * F.col("n_total")))
    # depth of bucket b = n_le(cut_b) - n_le(cut_{b-1}); the 9-row cut
    # frame is tiny, so the unpartitioned window is a non-issue
    from pyspark.sql import Window

    w = Window.orderBy("cut_idx")
    mult = F.col("n_le") - F.col("n_lt")
    prev_le = F.lag("n_le", 1, 0).over(w)
    prev_mult = F.lag(mult, 1, 0).over(w)
    depth = F.col("n_le") - prev_le
    target = F.col("n_total") / F.lit(float(N_HIST_BUCKETS))
    slack = 2.0 * F.col("n_total") / F.lit(float(PCT_ACCURACY)) + mult + prev_mult + 1
    body = stats.select(
        F.col("cut_idx").cast("int").alias("bucket"),
        rank_ok.alias("rank_ok"),
        (F.abs(depth - target) <= slack).alias("depth_ok"),
        "n_le", "n_total", mult.alias("mult"),
    )
    # bucket 10 = everything above the last cut
    last = body.filter(F.col("bucket") == N_HIST_BUCKETS - 1).select(
        F.lit(N_HIST_BUCKETS).cast("int").alias("bucket"),
        F.lit(True).alias("rank_ok"),
        (
            F.abs((F.col("n_total") - F.col("n_le")) - F.col("n_total") / 10.0)
            <= 2.0 * F.col("n_total") / F.lit(float(PCT_ACCURACY)) + F.col("mult") + 1
        ).alias("depth_ok"),
    )
    return body.select("bucket", "rank_ok", "depth_ok").unionByName(last)


EQUI_DEPTH_APPROX_SQL = f"""
SELECT CAST(b AS INT) AS bucket, true AS rank_ok, true AS depth_ok
FROM range(1, {N_HIST_BUCKETS + 1}) t(b)
"""


def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch ROLLUP property, proven on Spark's Apache
    DataSketches HLL surface (hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate): per-returnflag part-distinct sketches merged
    with hll_union_agg must estimate what one direct sketch over the
    whole table estimates — sketch(A∪B) ≃ merge(sketch(A), sketch(B))
    is the property that lets a 100 TB warehouse keep tiny
    per-partition sketch partials and answer any-slice distinct
    queries without rescanning (the same partial-merge algebra as
    maintenance.incremental_agg_merge, for a non-algebraic statistic).

    Self-verifying: the merge identity is exact on the REGISTER level,
    but Spark's union gadget materializes at HLL_8 while the direct
    path defaults to HLL_4, so the two ESTIMATES may differ at the
    estimator-rounding level — the check pins them within 1% of each
    other, and the merged estimate within 5% of the true count.
    Output: (exact_distinct, merged_close_to_direct, rel_err_ok)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    per_group = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est_direct"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    return direct.crossJoin(F.broadcast(merged)).select(
        "exact_distinct",
        (
            F.abs(F.col("est_merged") - F.col("est_direct"))
            <= 0.01 * F.col("est_direct")
        ).alias("merged_close_to_direct"),
        (
            F.abs(F.col("est_merged") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("rel_err_ok"),
    )


HLL_ROLLUP_SQL = """
SELECT count(DISTINCT l_partkey) AS exact_distinct,
       TRUE AS merged_close_to_direct,
       TRUE AS rel_err_ok
FROM lineitem
"""


QUERIES = {
    "approx_distinct_counts": approx_distinct_counts,
    "approx_quantiles": approx_quantiles,
    "percentiles_approx": percentiles_approx,
    "equi_depth_histogram_approx": equi_depth_histogram_approx,
    "hll_mergeable_rollup": hll_mergeable_rollup,
}

ORACLES = {
    "approx_distinct_counts": APPROX_DISTINCT_SQL,
    "approx_quantiles": APPROX_QUANTILES_SQL,
    "percentiles_approx": PERCENTILES_APPROX_SQL,
    "equi_depth_histogram_approx": EQUI_DEPTH_APPROX_SQL,
    "hll_mergeable_rollup": HLL_ROLLUP_SQL,
}
