"""Distribution-drift monitoring — the statistical tests an ML-data
platform runs between cohorts, snapshots, or train/serve windows
(reference north star: the corpus-curation pipeline needs to know when
a source's distribution moved, not just its row count; the reference
itself has no statistics at all — `README.md:12-17` features only).

* `ks_test_priority_revenue` — two-sample Kolmogorov–Smirnov D between
  the o_totalprice distributions of URGENT and LOW orders, with the
  large-sample α=0.05 decision. D is computed EXACTLY: with integer
  cents and integer cumulative counts, D = max|F1−F2| becomes
  max|cum1·n2 − cum2·n1| / (n1·n2) — pure BIGINT until one final
  division.
* `psi_value_drift` — Population Stability Index of `events.value`
  between the first and second half of the observation window (the
  standard train/serve drift score; PSI > 0.2 = investigate). Ten
  equal-width bins over the OBSERVED range, Laplace-smoothed so empty
  bins are defined; each bin's term is rounded to integer nano-units
  BEFORE the sum, so the 6dp PSI is order-independent.

Scale notes: both tests collapse the data with one partial+final
aggregation first — KS to the distinct-cents table, PSI to 10 bins.
Distinct prices are ~order-count, so KS's cumulative counts use a
two-phase range-bucketed prefix sum (per-bucket windows in parallel +
a KS_BUCKETS-row global offset table) — no window ever serializes an
O(n) table through one task. The half-window split and bin edges derive
from one tiny bounds aggregate, broadcast back (one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

KS_A, KS_B = "1-URGENT", "5-LOW"
KS_CRIT = 1.358  # c(alpha) for alpha = 0.05, two-sided, large-sample
KS_BUCKETS = 64  # range buckets for the distributed cumulative counts

PSI_BINS = 10
PSI_SCALE = 1_000_000_000  # per-bin terms as integer nano-units


def ks_test_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: n per sample, the exact KS D statistic (6dp), and the
    α=0.05 rejection decision via the large-sample critical value."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(KS_A, KS_B)
    )
    base = o.select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        (F.col("o_orderpriority") == KS_A).alias("a"),
    )
    per_v = base.groupBy("cents").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).alias("c2"),
    )
    # Distinct cents ≈ number of orders (prices are nearly unique), so a
    # global ORDER BY window here would serialize an O(n) table through one
    # task. Two-phase prefix sum instead (same shape as balanced_shards):
    # range-bucket the value domain from a one-row bounds aggregate, run the
    # cumulative window PER BUCKET (parallel), and add each bucket's
    # exclusive global offset from a KS_BUCKETS-row table — the only global
    # window runs over those 64 rows by construction.
    bounds = per_v.groupBy().agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    bucketed = per_v.crossJoin(F.broadcast(bounds)).select(
        "cents",
        "c1",
        "c2",
        F.least(
            F.lit(KS_BUCKETS - 1),
            (
                (F.col("cents") - F.col("lo"))
                * F.lit(KS_BUCKETS)
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("bigint"),
        ).alias("bucket"),
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    # exclusive prefix over the ≤ KS_BUCKETS-row bucket table via a
    # triangular broadcast self-join (sum of strictly-lower buckets) — the
    # quadratic term is 64², constant, and it avoids the unpartitioned
    # global window (the single-task shape this rewrite exists to remove)
    lo_side = per_bucket.select(
        F.col("bucket").alias("lb"),
        F.col("b1").alias("lb1"),
        F.col("b2").alias("lb2"),
    )
    offsets = (
        per_bucket.join(
            F.broadcast(lo_side), F.col("lb") < F.col("bucket"), "left"
        )
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("lb1"), F.lit(0)).alias("off1"),
            F.coalesce(F.sum("lb2"), F.lit(0)).alias("off2"),
        )
    )
    w_loc = W.partitionBy("bucket").orderBy("cents").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = (
        bucketed.withColumn("l1", F.sum("c1").over(w_loc))
        .withColumn("l2", F.sum("c2").over(w_loc))
        .join(F.broadcast(offsets), "bucket")
        .select(
            (F.col("off1") + F.col("l1")).alias("cum1"),
            (F.col("off2") + F.col("l2")).alias("cum2"),
        )
    )
    tot = per_v.groupBy().agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    agg = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            ).alias("d_num"),
        )
    )
    return agg.select(
        "n1",
        "n2",
        F.expr("round(cast(d_num as double) / (n1 * n2), 6)").alias("ks_d"),
        F.expr(
            f"cast(d_num as double) / (n1 * n2) > {KS_CRIT} * sqrt((n1 + n2) / (cast(n1 as double) * n2))"
        ).alias("reject_05"),
    )


KS_SQL = f"""
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority = '{KS_A}' AS a
  FROM orders WHERE o_orderpriority IN ('{KS_A}', '{KS_B}')
), per_v AS (
  SELECT cents,
         sum(CASE WHEN a THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN a THEN 0 ELSE 1 END) AS c2
  FROM base GROUP BY cents
), cum AS (
  SELECT sum(c1) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         sum(c2) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM per_v
), tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM per_v),
agg AS (
  SELECT max(t.n1) AS n1, max(t.n2) AS n2,
         max(abs(c.cum1 * t.n2 - c.cum2 * t.n1)) AS d_num
  FROM cum c CROSS JOIN tot t
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(CAST(d_num AS DOUBLE) / (n1 * n2), 6) AS ks_d,
       CAST(d_num AS DOUBLE) / (n1 * n2)
         > {KS_CRIT} * sqrt((n1 + n2) / (CAST(n1 AS DOUBLE) * n2)) AS reject_05
FROM agg
"""


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: PSI of `events.value` between the first and second half
    of the event-time window, plus both sample sizes and the
    conventional severity band ('stable' < 0.1 ≤ 'moderate' < 0.2 ≤
    'shifted')."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    b = ev.groupBy().agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
        F.expr("cast(round(min(value) * 100) as bigint)").alias("vmin"),
        F.expr("cast(round(max(value) * 100) as bigint)").alias("vmax"),
    )
    binned = ev.crossJoin(F.broadcast(b)).select(
        (
            F.unix_micros("ts")
            <= (F.unix_micros("t0") + F.unix_micros("t1")) / F.lit(2)
        ).alias("first_half"),
        F.least(
            F.lit(PSI_BINS - 1),
            F.expr(
                f"cast(((cast(round(value * 100) as bigint) - vmin) * {PSI_BINS})"
                " div (vmax - vmin + 1) as int)"
            ),
        ).alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("first_half"), 0).otherwise(1)).alias("c2"),
    )
    return psi_from_per_bin(per_bin)


def psi_from_per_bin(per_bin: DataFrame) -> DataFrame:
    """The PSI fold over a (bin, c1, c2) count table — shared by the
    batch operator and the streaming twin (whose streaming state IS
    this bounded table). Laplace smoothing, per-bin terms rounded to
    integer nano-units BEFORE the sum, severity banding."""
    tot = per_bin.groupBy().agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    term = (
        f"cast(round(((c1 + 1) / cast(n1 + {PSI_BINS} as double)"
        f" - (c2 + 1) / cast(n2 + {PSI_BINS} as double))"
        f" * ln(((c1 + 1) * cast(n2 + {PSI_BINS} as double))"
        f" / ((c2 + 1) * cast(n1 + {PSI_BINS} as double)))"
        f" * {PSI_SCALE}) as bigint)"
    )
    acc = per_bin.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.sum(F.expr(term)).alias("psi_n"),
    )
    return acc.select(
        "n1",
        "n2",
        F.expr(f"round(cast(psi_n as double) / {PSI_SCALE}, 6)").alias("psi"),
        F.expr(
            f"CASE WHEN cast(psi_n as double) / {PSI_SCALE} < 0.1 THEN 'stable' "
            f"WHEN cast(psi_n as double) / {PSI_SCALE} < 0.2 THEN 'moderate' "
            "ELSE 'shifted' END"
        ).alias("band"),
    )


PSI_SQL = f"""
WITH b AS (
  SELECT min(ts) AS t0, max(ts) AS t1,
         CAST(round(min(value) * 100) AS BIGINT) AS vmin,
         CAST(round(max(value) * 100) AS BIGINT) AS vmax
  FROM events
), binned AS (
  SELECT epoch_us(e.ts) <= (epoch_us(b.t0) + epoch_us(b.t1)) / 2 AS first_half,
         least({PSI_BINS - 1},
               CAST(((CAST(round(e.value * 100) AS BIGINT) - b.vmin) * {PSI_BINS})
                    // (b.vmax - b.vmin + 1) AS INT)) AS bin
  FROM events e CROSS JOIN b
), per_bin AS (
  SELECT bin,
         sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS c2
  FROM binned GROUP BY bin
), tot AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM per_bin),
acc AS (
  SELECT max(t.n1) AS n1, max(t.n2) AS n2,
         sum(CAST(round(((p.c1 + 1) / CAST(t.n1 + {PSI_BINS} AS DOUBLE)
                         - (p.c2 + 1) / CAST(t.n2 + {PSI_BINS} AS DOUBLE))
                        * ln(((p.c1 + 1) * CAST(t.n2 + {PSI_BINS} AS DOUBLE))
                             / ((p.c2 + 1) * CAST(t.n1 + {PSI_BINS} AS DOUBLE)))
                        * {PSI_SCALE}) AS BIGINT)) AS psi_n
  FROM per_bin p CROSS JOIN tot t
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(psi_n / {PSI_SCALE}.0, 6) AS psi,
       CASE WHEN psi_n / {PSI_SCALE}.0 < 0.1 THEN 'stable'
            WHEN psi_n / {PSI_SCALE}.0 < 0.2 THEN 'moderate'
            ELSE 'shifted' END AS band
FROM acc
"""


QUERIES = {
    "ks_test_priority_revenue": ks_test_priority_revenue,
    "psi_value_drift": psi_value_drift,
}

ORACLES = {
    "ks_test_priority_revenue": KS_SQL,
    "psi_value_drift": PSI_SQL,
}
