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


BENFORD_SCALE = 1_000_000_000  # chi-square terms as integer nano-units


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of o_totalprice: one row per leading digit
    with the observed count/share, the Benford expectation, and the
    global chi-square statistic (6dp snap) against the log10(1+1/d)
    distribution — the classic synthetic-/fabricated-data screen.

    Exact shape: digits come from the integer cents' decimal string
    (no float log10 near a power-of-ten boundary); the chi-square sums
    nine per-digit terms snapped to nano-units, so the fold is
    order-independent; expectations are fixed-arity ln-ratio doubles
    from identical SQL text. One partial+final agg into 9 groups."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "cast(substring(cast(cast(round(o_totalprice * 100) as bigint)"
            " as string), 1, 1) as int)"
        ).alias("d")
    )
    per_d = o.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    return benford_from_per_digit(per_d)


def benford_from_per_digit(per_d: DataFrame) -> DataFrame:
    """The Benford chi-square fold over a (d, n) leading-digit count
    table — shared by the batch operator and the streaming twin (whose
    entire streaming state IS this ≤9-row table)."""
    tot = per_d.groupBy().agg(F.sum("n").alias("nn"))
    exp_p = "(ln(1.0 + 1.0 / d) / ln(10.0))"
    term = (
        f"cast(round((n - nn * {exp_p}) * (n - nn * {exp_p})"
        f" / (nn * {exp_p}) * {BENFORD_SCALE}) as bigint)"
    )
    with_tot = per_d.crossJoin(F.broadcast(tot))
    chi2 = with_tot.groupBy().agg(
        F.sum(F.expr(f"cast({term} as decimal(38,0))")).alias("chi2_n")
    )
    return (
        with_tot.crossJoin(F.broadcast(chi2))
        .select(
            "d",
            F.col("n").cast("bigint").alias("n"),
            F.expr(
                "cast(round(n / cast(nn as double) * 1e6) as bigint) / 1e6"
            ).alias("obs_share_6"),
            F.expr(
                f"cast(round({exp_p} * 1e6) as bigint) / 1e6"
            ).alias("benford_share_6"),
            F.expr(
                f"cast(round(cast(chi2_n as double) / {BENFORD_SCALE} * 1e6)"
                " as bigint) / 1e6"
            ).alias("chi2_6"),
        )
        .orderBy("d")
    )


BENFORD_SQL = f"""
WITH per_d AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
           AS VARCHAR), 1, 1) AS INT) AS d,
         count(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT sum(n) AS nn FROM per_d),
wt AS (SELECT d, n, nn FROM per_d CROSS JOIN tot),
chi2 AS (
  SELECT sum(CAST(CAST(round((n - nn * (ln(1.0 + 1.0 / d) / ln(10.0)))
        * (n - nn * (ln(1.0 + 1.0 / d) / ln(10.0)))
        / (nn * (ln(1.0 + 1.0 / d) / ln(10.0))) * {BENFORD_SCALE}) AS BIGINT)
        AS DECIMAL(38,0))) AS chi2_n
  FROM wt
)
SELECT d, CAST(n AS BIGINT) AS n,
       CAST(round(n / CAST(nn AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS obs_share_6,
       CAST(round((ln(1.0 + 1.0 / d) / ln(10.0)) * 1e6) AS BIGINT) / 1e6
         AS benford_share_6,
       CAST(round(CAST(chi2_n AS DOUBLE) / {BENFORD_SCALE} * 1e6)
         AS BIGINT) / 1e6 AS chi2_6
FROM wt CROSS JOIN chi2
ORDER BY d
"""

ACF_LAGS = (1, 24)  # hourly adjacency + daily seasonality


def _hourly_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(h, x): the gap-filled hourly integer-cents series — BOUNDED by
    the observation window (hours, not rows); missing hours zero-fill
    from a one-row bounds sequence. Shared by the ACF / Mann-Kendall /
    Theil-Sen time-series probes."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    per_h = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
    )
    bounds = per_h.groupBy().agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h")
    )
    return grid.join(per_h, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )


_HOURLY_FILLED_SQL = """
per_h AS (
  SELECT date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events GROUP BY 1
), bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM per_h),
grid AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), filled AS (
  SELECT g.h, coalesce(p.x, 0) AS x FROM grid g LEFT JOIN per_h p ON p.h = g.h
)"""


def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 autocorrelation of the gap-filled hourly
    event-value series — the seasonality/trend sanity probe next to
    `seasonal_anomaly_report`. One row per lag.

    Exact shape: the stream collapses to the BOUNDED hourly table
    (#hours is fixed by the observation window, not data volume);
    hours with no events are zero-filled from a one-row bounds
    sequence so lags cross gaps correctly. Mean-centering is exact:
    multiplying through by n makes every centered product the integer
    (n·x_t − S)(n·x_{t+k} − S), accumulated in DECIMAL(38,0); one
    final snapped double ratio per lag."""
    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    return acf_from_filled(filled)


def acf_from_filled(filled: DataFrame) -> DataFrame:
    """The ACF fold over a gap-filled (h, x) hourly table — shared by
    the batch operator and the streaming twin (whose streaming state
    IS the bounded per-hour sum table)."""
    tot = filled.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    base = filled.crossJoin(F.broadcast(tot))
    lag_rows = []
    for k in ACF_LAGS:
        a = base.select(
            F.col("h").alias("ha"),
            F.expr("cast(n as decimal(38,0)) * x - s").alias("ca"),
            "n",
        )
        b = filled.select(
            (F.col("h") - F.expr(f"interval {k} hours")).alias("ha"),
            F.col("x").alias("xb"),
        )
        num = (
            a.join(b, "ha")
            .crossJoin(F.broadcast(tot.select(F.col("s").alias("s2"))))
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(
                    F.expr(
                        "ca * (cast(n as decimal(38,0)) * xb - s2)"
                    )
                ).alias("num"),
            )
        )
        den = base.groupBy().agg(
            F.sum(F.expr("(cast(n as decimal(38,0)) * x - s)"
                         " * (cast(n as decimal(38,0)) * x - s)")).alias("den")
        )
        lag_rows.append(
            num.crossJoin(F.broadcast(den)).select(
                F.lit(k).cast("bigint").alias("lag"),
                F.col("n_pairs").cast("bigint").alias("n_pairs"),
                F.expr(
                    "cast(round(cast(num as double) / cast(den as double)"
                    " * 1e6) as bigint) / 1e6"
                ).alias("acf_6"),
            )
        )
    out = lag_rows[0]
    for r in lag_rows[1:]:
        out = out.unionAll(r)
    return out


def _acf_sql() -> str:
    per_lag = []
    for k in ACF_LAGS:
        per_lag.append(f"""
SELECT CAST({k} AS BIGINT) AS lag,
       CAST((SELECT count(*) FROM filled a JOIN filled b
             ON b.h = a.h + INTERVAL {k} HOUR) AS BIGINT) AS n_pairs,
       CAST(round(CAST((SELECT sum((CAST(t.n AS DECIMAL(38,0)) * a.x - t.s)
                    * (CAST(t.n AS DECIMAL(38,0)) * b.x - t.s))
               FROM filled a JOIN filled b ON b.h = a.h + INTERVAL {k} HOUR
               CROSS JOIN tot t) AS DOUBLE)
           / CAST((SELECT sum((CAST(t.n AS DECIMAL(38,0)) * f.x - t.s)
                    * (CAST(t.n AS DECIMAL(38,0)) * f.x - t.s))
               FROM filled f CROSS JOIN tot t) AS DOUBLE) * 1e6) AS BIGINT)
         / 1e6 AS acf_6""")
    body = "\nUNION ALL\n".join(per_lag)
    return f"""
WITH per_h AS (
  SELECT date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS x
  FROM events GROUP BY 1
), bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM per_h),
grid AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), filled AS (
  SELECT g.h, coalesce(p.x, 0) AS x FROM grid g LEFT JOIN per_h p ON p.h = g.h
), tot AS (SELECT count(*) AS n, sum(x) AS s FROM filled)
{body}
"""


ACF_SQL = _acf_sql()


def mann_kendall_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the Mann-Kendall monotonic-trend test over the
    gap-filled hourly value series — S = Σ_{i<j} sign(x_j − x_i), the
    tie-corrected variance, the continuity-corrected z (6dp snap), and
    the α=0.05 decision. The nonparametric "is this metric drifting
    up" answer a monitor wants when the series is nothing like normal.

    Exact shape: the ENTIRE computation runs on the bounded hours
    table — the all-pairs comparison is hours², a constant fixed by
    the observation window, never by data volume (at a year of hours
    that is ~4e7 sign comparisons, one broadcast nested-loop over a
    9k-row table). S and the tie term are exact integers; z is one
    fixed-arity double from identical SQL text, snapped."""
    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    a = filled.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    b = filled.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    s_row = (
        a.join(F.broadcast(b), F.col("ha") < F.col("hb"))
        .groupBy()
        .agg(
            F.sum(F.expr("sign(xb - xa)")).cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    ties = (
        filled.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy()
        .agg(
            F.sum(F.expr("cast(t as decimal(38,0)) * (t - 1) * (2 * t + 5)")).alias(
                "tie_term"
            ),
            F.sum("t").alias("n"),
        )
    )
    z = (
        "(case when s > 0 then s - 1 when s < 0 then s + 1 else 0 end)"
        " / sqrt((cast(n as double) * (n - 1) * (2 * n + 5)"
        "         - cast(tie_term as double)) / 18)"
    )
    return s_row.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "s",
        F.expr(f"cast(round(({z}) * 1e6) as bigint) / 1e6").alias("z_6"),
        F.expr(f"abs({z}) > {Z_CRIT}").alias("reject_05"),
    )


Z_CRIT = 1.959964  # two-sided alpha = 0.05


MANN_KENDALL_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
s_row AS (
  SELECT CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s, count(*) AS n_pairs
  FROM filled a JOIN filled b ON a.h < b.h
), ties AS (
  SELECT sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)) AS tie_term,
         sum(t) AS n
  FROM (SELECT x, count(*) AS t FROM filled GROUP BY x)
)
SELECT CAST(n AS BIGINT) AS n_hours, CAST(n_pairs AS BIGINT) AS n_pairs, s,
       CAST(round(((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1
                     ELSE 0 END)
         / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                 - CAST(tie_term AS DOUBLE)) / 18)) * 1e6) AS BIGINT) / 1e6
         AS z_6,
       abs((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1 ELSE 0 END)
         / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                 - CAST(tie_term AS DOUBLE)) / 18)) > {Z_CRIT} AS reject_05
FROM s_row CROSS JOIN ties
"""

SEN_SCALE = 1_000_000_000  # pairwise slopes snapped to nano-cents/hour


def theil_sen_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the Theil-Sen robust trend estimate over the
    gap-filled hourly series — the lower-median of all pairwise slopes
    (x_j − x_i)/Δhours, each snapped to integer nano-cents-per-hour —
    plus the pair count. Resistant to 29% outliers where OLS's slope
    is dragged by one bad hour; the robust sibling of
    `mann_kendall_hourly`'s significance call.

    Exact shape: pair slopes live on the bounded hours² table;
    snapping each slope to the 1e-9 grid makes the median selection a
    pure integer rank walk (`rank_stats._lower_median` — per-bucket
    windows, never one global task)."""
    from spec_search_spark.operators.rank_stats import _lower_median

    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    a = filled.select(F.col("h").alias("ha"), F.col("x").alias("xa"))
    b = filled.select(F.col("h").alias("hb"), F.col("x").alias("xb"))
    slopes = a.join(F.broadcast(b), F.col("ha") < F.col("hb")).select(
        F.expr(
            "cast(round((xb - xa) / ((unix_micros(hb) - unix_micros(ha))"
            f" / 3.6e9) * {SEN_SCALE}) as bigint)"
        ).alias("v")
    )
    per_v = slopes.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    med = _lower_median(per_v, "v")
    tot = per_v.groupBy().agg(F.sum("c").alias("n_pairs"))
    return med.crossJoin(F.broadcast(tot)).select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("med").alias("sen_slope_nano"),
        # NOT an integer div: med can be negative and Spark `div`
        # truncates while DuckDB `//` floors — snap via round instead
        F.expr("cast(round(med / 1000.0) as bigint) / 1e6").alias(
            "sen_slope_6"
        ),
    )


THEIL_SEN_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
slopes AS (
  SELECT CAST(round((b.x - a.x) / ((epoch_us(b.h) - epoch_us(a.h)) / 3.6e9)
           * {SEN_SCALE}) AS BIGINT) AS v
  FROM filled a JOIN filled b ON a.h < b.h
), per_v AS (SELECT v, count(*) AS c FROM slopes GROUP BY v),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM per_v
), tot AS (SELECT sum(c) AS n_pairs FROM per_v),
med AS (SELECT min(v) AS med FROM cum CROSS JOIN tot
        WHERE cc >= (n_pairs + 1) // 2)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs, med AS sen_slope_nano,
       CAST(round(med / 1000.0) AS BIGINT) / 1e6 AS sen_slope_6
FROM med CROSS JOIN tot
"""


CRAMER_SCALE = 1_000_000_000  # chi-square cell terms as integer nano-units


def cramers_v_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: Cramér's V association between o_orderpriority and
    o_orderstatus (with the chi-square statistic and the contingency
    shape) — the categorical-pair dependence screen a feature audit
    runs before one-hot-encoding two columns that encode the same
    thing (V → 1 = redundant features, V ≈ 0 = independent).

    Exact shape: one partial+final agg into the r×c contingency cells;
    marginals re-aggregate from the cell table (≤ r·c rows); each
    cell's (o−e)²/e term computes from exact integer counts in one
    fixed-arity double expression snapped to nano-units before the
    DECIMAL(38,0) sum; V = √(χ²/(n·(min(r,c)−1))) snaps at 6dp."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    )
    cells = o.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    ma = cells.groupBy("a").agg(F.sum("n").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("n").alias("nb"))
    tot = cells.groupBy().agg(
        F.sum("n").alias("nn"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    term = (
        "cast(round((n - cast(na as double) * nb / nn)"
        " * (n - cast(na as double) * nb / nn)"
        f" / (cast(na as double) * nb / nn) * {CRAMER_SCALE}) as bigint)"
    )
    acc = (
        cells.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.max("nn").alias("nn"),
            F.max("r").alias("r"),
            F.max("c").alias("c"),
            F.sum(F.expr(f"cast({term} as decimal(38,0))")).alias("chi2_n"),
        )
    )
    return acc.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("r").cast("bigint").alias("n_rows_dim"),
        F.col("c").cast("bigint").alias("n_cols_dim"),
        F.expr(
            f"cast(round(cast(chi2_n as double) / {CRAMER_SCALE} * 1e6)"
            " as bigint) / 1e6"
        ).alias("chi2_6"),
        F.expr(
            f"cast(round(sqrt(cast(chi2_n as double) / {CRAMER_SCALE}"
            " / (nn * (least(r, c) - 1))) * 1e6) as bigint) / 1e6"
        ).alias("cramers_v_6"),
    )


CRAMERS_SQL = f"""
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS n
  FROM orders GROUP BY 1, 2
), ma AS (SELECT a, sum(n) AS na FROM cells GROUP BY a),
mb AS (SELECT b, sum(n) AS nb FROM cells GROUP BY b),
tot AS (SELECT sum(n) AS nn, count(DISTINCT a) AS r, count(DISTINCT b) AS c
        FROM cells),
acc AS (
  SELECT max(nn) AS nn, max(r) AS r, max(c) AS c,
         sum(CAST(CAST(round((n - CAST(na AS DOUBLE) * nb / nn)
               * (n - CAST(na AS DOUBLE) * nb / nn)
               / (CAST(na AS DOUBLE) * nb / nn) * {CRAMER_SCALE}) AS BIGINT)
             AS DECIMAL(38,0))) AS chi2_n
  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
)
SELECT CAST(nn AS BIGINT) AS n, CAST(r AS BIGINT) AS n_rows_dim,
       CAST(c AS BIGINT) AS n_cols_dim,
       CAST(round(CAST(chi2_n AS DOUBLE) / {CRAMER_SCALE} * 1e6) AS BIGINT)
         / 1e6 AS chi2_6,
       CAST(round(sqrt(CAST(chi2_n AS DOUBLE) / {CRAMER_SCALE}
            / (nn * (least(r, c) - 1))) * 1e6) AS BIGINT) / 1e6
         AS cramers_v_6
FROM acc
"""


KOLMOGOROV_CRIT = 1.358102  # sup|Brownian bridge|, alpha = 0.05


def cusum_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the CUSUM changepoint scan over the gap-filled hourly
    value series — the hour k* maximizing |Σ_{t≤k}(x_t − x̄)|, the
    scaled max deviation, and the Brownian-bridge-normalized statistic
    with the α=0.05 decision (same sup-|bridge| law as KS). The "did
    this metric shift level, and when" monitor next to
    `mann_kendall_hourly`'s monotone-trend call.

    Exact shape: everything runs on the BOUNDED hours table (window
    size fixes it, not data volume). Cumulative sums ride the
    `rank_stats._bucketed_cum` walk (per-bucket parallel windows, no
    single-task window); the deviation n·c_k − k·S is a pure
    DECIMAL(38,0) integer so max and argmax are exact; the normalized
    statistic is one fixed-arity double from identical SQL text,
    snapped. Argmax ties break to the earliest hour."""
    tune(spark)
    return cusum_from_filled(_hourly_filled(spark, sf_dir))


def cusum_from_filled(filled: DataFrame) -> DataFrame:
    """The CUSUM fold over a gap-filled (h, x) hourly table — shared
    by the batch operator and the streaming twin (whose streaming
    state IS the bounded per-hour sum table)."""
    from spec_search_spark.operators.rank_stats import _bucketed_cum

    per_v = filled.select(
        F.expr("cast(unix_micros(h) div 3600000000 as bigint)").alias("hh"),
        "x",
    ).withColumn("one", F.lit(1))
    cum = _bucketed_cum(per_v, "hh", ["x", "one"])
    tot = per_v.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).alias("sxx"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "hh",
        F.expr(
            "abs(cast(n as decimal(38,0)) * cum_x"
            " - cast(cum_one as decimal(38,0)) * s)"
        ).alias("ad"),
    )
    mx = d.groupBy().agg(F.max("ad").alias("mx"))
    cp = (
        d.crossJoin(F.broadcast(mx))
        .filter(F.col("ad") == F.col("mx"))
        .groupBy()
        .agg(F.min("hh").alias("cp_hh"), F.max("mx").alias("mx"))
    )
    q = (
        "(cast(mx as double) / n)"
        " / (sqrt(cast(sxx as double) / n"
        "         - (cast(s as double) / n) * (cast(s as double) / n))"
        "    * sqrt(cast(n as double)))"
    )
    return cp.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.col("cp_hh").alias("cp_epoch_hour"),
        F.expr("cast(mx as decimal(38,0))").cast("bigint").alias(
            "cusum_abs_scaled"
        ),
        F.expr(f"cast(round(({q}) * 1e6) as bigint) / 1e6").alias("stat_6"),
        F.expr(f"({q}) > {KOLMOGOROV_CRIT}").alias("reject_05"),
    )


CUSUM_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
pv AS (
  SELECT CAST(epoch_us(h) // 3600000000 AS BIGINT) AS hh, x FROM filled
), tot AS (
  SELECT count(*) AS n, sum(CAST(x AS BIGINT)) AS s,
         sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM pv
), cum AS (
  SELECT hh,
         sum(x) OVER (ORDER BY hh
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
         row_number() OVER (ORDER BY hh) AS k
  FROM pv
), d AS (
  SELECT hh, abs(CAST(n AS DECIMAL(38,0)) * cx
                 - CAST(k AS DECIMAL(38,0)) * s) AS ad
  FROM cum CROSS JOIN tot
), mx AS (SELECT max(ad) AS mx FROM d),
cp AS (
  SELECT min(hh) AS cp_hh, max(mx) AS mx FROM d CROSS JOIN mx
  WHERE ad = mx
)
SELECT CAST(n AS BIGINT) AS n_hours, cp_hh AS cp_epoch_hour,
       CAST(mx AS BIGINT) AS cusum_abs_scaled,
       CAST(round(((CAST(mx AS DOUBLE) / n)
         / (sqrt(CAST(sxx AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
            * sqrt(CAST(n AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6 AS stat_6,
       ((CAST(mx AS DOUBLE) / n)
         / (sqrt(CAST(sxx AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
            * sqrt(CAST(n AS DOUBLE)))) > {KOLMOGOROV_CRIT} AS reject_05
FROM cp CROSS JOIN tot
"""


def wilcoxon_ampm_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the Wilcoxon signed-rank test on PAIRED hourly values —
    each day's hour h (AM, h<12) paired with hour h+12 (PM), d = PM −
    AM per (day, slot); zeros dropped per the classic procedure. The
    paired complement to `mannwhitney_priority_revenue`'s independent
    two-sample test: "is the PM half of the day systematically heavier
    than the AM half, matching on day and slot".

    Exact shape: pairs live on the BOUNDED gap-filled hour grid
    (non-overlapping by construction); |d| ranks are tie-averaged
    doubled integers via the bucketed walk, so 2·W⁺ is a pure
    DECIMAL(38,0) sum; z is one fixed-arity double with the standard
    tie-corrected variance, snapped."""
    from spec_search_spark.operators.rank_stats import _bucketed_cum

    tune(spark)
    filled = _hourly_filled(spark, sf_dir).select(
        F.expr("cast(unix_micros(h) div 3600000000 as bigint)").alias("hh"),
        "x",
    )
    keyed = filled.select(
        F.expr("hh div 24").alias("day"),
        F.expr("hh % 24").alias("hod"),
        "x",
    )
    am = keyed.filter("hod < 12").select(
        "day", F.col("hod").alias("slot"), F.col("x").alias("xa")
    )
    pm = keyed.filter("hod >= 12").select(
        "day", (F.col("hod") - 12).alias("slot"), F.col("x").alias("xp")
    )
    d = (
        am.join(pm, ["day", "slot"])
        .select((F.col("xp") - F.col("xa")).alias("d"))
        .filter("d != 0")
    )
    per_v = d.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr("case when d > 0 then 1 else 0 end")).alias("cp"),
    )
    cum = _bucketed_cum(per_v, "ad", ["c"])
    acc = cum.groupBy().agg(
        F.sum(
            F.expr("cast(cp as decimal(38,0)) * (2 * (cum_c - c) + c + 1)")
        ).alias("w2"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c * c - c")).alias("tie3"),
        F.sum("c").alias("n"),
    )
    z = (
        "(cast(w2 as double) - cast(n as double) * (n + 1) / 2)"
        " / sqrt(cast(n as double) * (n + 1) * (2 * n + 1) / 6"
        "        - cast(tie3 as double) / 12)"
    )
    return acc.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.expr("cast(w2 as decimal(38,0))").cast("bigint").alias("w_plus_x2"),
        F.expr(f"cast(round(({z}) * 1e6) as bigint) / 1e6").alias("z_6"),
        F.expr(f"abs({z}) > {Z_CRIT}").alias("reject_05"),
    )


WILCOXON_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
keyed AS (
  SELECT CAST(epoch_us(h) // 3600000000 AS BIGINT) // 24 AS day,
         CAST(epoch_us(h) // 3600000000 AS BIGINT) % 24 AS hod,
         x
  FROM filled
), d AS (
  SELECT p.x - a.x AS d
  FROM (SELECT day, hod AS slot, x FROM keyed WHERE hod < 12) a
  JOIN (SELECT day, hod - 12 AS slot, x FROM keyed WHERE hod >= 12) p
    USING (day, slot)
  WHERE p.x - a.x != 0
), per_v AS (
  SELECT abs(d) AS ad, count(*) AS c,
         sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cp
  FROM d GROUP BY abs(d)
), cum AS (
  SELECT cp, c, coalesce(sum(c) OVER (ORDER BY ad
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM per_v
), acc AS (
  SELECT sum(CAST(cp AS DECIMAL(38,0)) * (2 * cumb + c + 1)) AS w2,
         sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie3,
         sum(c) AS n
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n_pairs, CAST(w2 AS BIGINT) AS w_plus_x2,
       CAST(round(((CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)
         / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 6
                - CAST(tie3 AS DOUBLE) / 12)) * 1e6) AS BIGINT) / 1e6 AS z_6,
       abs((CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2)
         / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 6
                - CAST(tie3 AS DOUBLE) / 12)) > {Z_CRIT} AS reject_05
FROM acc
"""


def mann_kendall_daily_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Mann-Kendall panel: one tie-corrected trend test PER
    priority class over its zero-filled daily order-count series — the
    "which segments are drifting, not just whether the total is"
    monitor a fleet dashboard actually renders. One row per priority.

    Exact shape: the grid is bounded (#days × #priorities — fixed by
    the calendar window and the class domain, never by order volume);
    the all-pairs sign comparison joins the bounded grid to itself per
    group via broadcast; S and tie terms are exact integers; z is the
    same fixed-arity snapped expression as `mann_kendall_hourly`."""
    tune(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    per_gd = o.groupBy("g", "d").agg(F.count(F.lit(1)).alias("c"))
    bounds = o.groupBy().agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d")
    )
    groups = o.select("g").distinct()
    probe = per_gd.select(
        F.col("g").alias("g2"), F.col("d").alias("d2"), "c"
    )
    filled = (
        grid.crossJoin(F.broadcast(groups))
        .join(
            probe,
            (F.col("g") == F.col("g2")) & (F.col("d") == F.col("d2")),
            "left",
        )
        .select("g", "d", F.coalesce(F.col("c"), F.lit(0)).alias("x"))
    )
    # the streamed side of the all-pairs broadcast join inherits the
    # 1-partition exploded calendar grid, so the O(#days²) per-group
    # sign comparisons ran as ONE 1.2 s task; explicit-N repartition
    # (AQE-coalescing-exempt) fans the bounded grid out — trivial bytes
    # (#days × #priorities rows) at any scale
    dp = spark.sparkContext.defaultParallelism
    a = filled.repartition(dp, "d").select(
        F.col("g").alias("ga"), F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = filled.select(
        F.col("g").alias("gb"), F.col("d").alias("db"), F.col("x").alias("xb")
    )
    s_rows = (
        a.join(
            F.broadcast(b),
            (F.col("ga") == F.col("gb")) & (F.col("da") < F.col("db")),
        )
        .groupBy(F.col("ga").alias("g"))
        .agg(
            F.sum(F.expr("sign(xb - xa)")).cast("bigint").alias("s"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    ties = (
        filled.groupBy("g", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.expr("cast(t as decimal(38,0)) * (t - 1) * (2 * t + 5)")
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    z = (
        "(case when s > 0 then s - 1 when s < 0 then s + 1 else 0 end)"
        " / sqrt((cast(n as double) * (n - 1) * (2 * n + 5)"
        "         - cast(tie_term as double)) / 18)"
    )
    return s_rows.join(F.broadcast(ties), "g").select(
        F.col("g").alias("priority"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "s",
        F.expr(f"cast(round(({z}) * 1e6) as bigint) / 1e6").alias("z_6"),
        F.expr(f"abs({z}) > {Z_CRIT}").alias("reject_05"),
    )


MK_PANEL_SQL = f"""
WITH o AS (
  SELECT o_orderpriority AS g, CAST(o_orderdate AS DATE) AS d FROM orders
), per_gd AS (SELECT g, d, count(*) AS c FROM o GROUP BY g, d),
bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM o),
grid AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
  FROM bounds
), groups AS (SELECT DISTINCT g FROM o),
filled AS (
  SELECT gr.g, gd.d, coalesce(p.c, 0) AS x
  FROM grid gd CROSS JOIN groups gr
  LEFT JOIN per_gd p ON p.g = gr.g AND p.d = gd.d
), s_rows AS (
  SELECT a.g, CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s,
         count(*) AS n_pairs
  FROM filled a JOIN filled b ON a.g = b.g AND a.d < b.d
  GROUP BY a.g
), ties AS (
  SELECT g, sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5))
           AS tie_term,
         sum(t) AS n
  FROM (SELECT g, x, count(*) AS t FROM filled GROUP BY g, x)
  GROUP BY g
)
SELECT s_rows.g AS priority, CAST(n AS BIGINT) AS n_days,
       CAST(n_pairs AS BIGINT) AS n_pairs, s,
       CAST(round(((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1
                     ELSE 0 END)
         / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                 - CAST(tie_term AS DOUBLE)) / 18)) * 1e6) AS BIGINT) / 1e6
         AS z_6,
       abs((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1 ELSE 0 END)
         / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                 - CAST(tie_term AS DOUBLE)) / 18)) > {Z_CRIT} AS reject_05
FROM s_rows JOIN ties ON ties.g = s_rows.g
"""


# --- Holt double-exponential smoothing forecast ------------------------------

HOLT_ALPHA = 0.25   # level gain — dyadic, exactly representable
HOLT_BETA = 0.125   # trend gain — dyadic, exactly representable
HOLT_HORIZON = 24   # forecast h hours past the window end


def holt_forecast_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) over the
    gap-filled hourly series, with the h=24 linear forecast — the
    capacity-planning projection one step up from `ewma_user_value`'s
    flat smoother (a trending series saturates an EWMA; Holt tracks
    it).

    The recursion l' = αx + (1−α)(l+b), b' = β(l'−l) + (1−β)b cannot
    be a window frame, so it runs as an ordered JVM `aggregate` fold
    over the BOUNDED hourly table (hours in the window, never data
    volume — the same bound as the ACF/CUSUM probes; at 100 TB the
    per-hour pre-aggregation is the only data-sized pass). Seeds
    l=x₁, b=x₂−x₁; α/β are dyadic so every step is exact IEEE from
    shared arithmetic; the DuckDB oracle walks the identical
    recursion as a bounded recursive CTE.

    Output: one row (n_hours, level, trend, forecast_24h), snapped."""
    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    arr = F.array_sort(F.collect_list(F.struct("h", "x")))
    one = filled.groupBy().agg(
        F.count(F.lit(1)).alias("n_hours"), arr.alias("arr")
    )
    vals = F.transform(F.col("arr"), lambda s: s["x"].cast("double"))
    x1 = F.element_at(vals, 1)
    x2 = F.element_at(vals, 2)
    rest = F.slice(vals, F.lit(3), F.greatest(F.size(vals) - 2, F.lit(0)))
    a, b = HOLT_ALPHA, HOLT_BETA

    def step(acc, x):
        lnew = F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"])
        bnew = (
            F.lit(b) * ((F.lit(a) * x + F.lit(1 - a) * (acc["l"] + acc["b"])) - acc["l"])
            + F.lit(1 - b) * acc["b"]
        )
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    state = F.aggregate(
        rest, F.struct(x1.alias("l"), (x2 - x1).alias("b")), step
    )
    return one.select(
        "n_hours", state["l"].alias("l"), state["b"].alias("b")
    ).selectExpr(
        "n_hours",
        "cast(round(l * 1e6) as bigint) / 1e6 AS level",
        "cast(round(b * 1e6) as bigint) / 1e6 AS trend",
        f"cast(round((l + {HOLT_HORIZON} * b) * 1e6) as bigint) / 1e6"
        " AS forecast_24h",
    )


HOLT_SQL = f"""
WITH RECURSIVE {_HOURLY_FILLED_SQL.lstrip().rstrip()},
idx AS (
  SELECT row_number() OVER (ORDER BY h) AS i, CAST(x AS DOUBLE) AS x
  FROM filled
), nn AS (SELECT count(*) AS n FROM idx),
rec(t, l, b) AS (
  SELECT 2,
         (SELECT x FROM idx WHERE i = 1),
         (SELECT x FROM idx WHERE i = 2) - (SELECT x FROM idx WHERE i = 1)
  UNION ALL
  SELECT r.t + 1,
         {HOLT_ALPHA} * i.x + {1 - HOLT_ALPHA} * (r.l + r.b),
         {HOLT_BETA} * (({HOLT_ALPHA} * i.x + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
           + {1 - HOLT_BETA} * r.b
  FROM rec r JOIN idx i ON i.i = r.t + 1
)
SELECT n.n AS n_hours,
       CAST(round(r.l * 1e6) AS BIGINT) / 1e6 AS level,
       CAST(round(r.b * 1e6) AS BIGINT) / 1e6 AS trend,
       CAST(round((r.l + {HOLT_HORIZON} * r.b) * 1e6) AS BIGINT) / 1e6
         AS forecast_24h
FROM rec r CROSS JOIN nn n WHERE r.t = n.n
"""


# --- forecast backtest: Holt vs seasonal naive (MASE) ------------------------

BT_SEASON = 24  # seasonal-naive period (hours)


def holt_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the Holt forecaster on the hourly series: fit on the
    first 80% of hours, forecast the held-out tail, and score MAE
    against the SEASONAL-NAIVE baseline (same hour yesterday) as the
    MASE ratio — the eval loop that tells you whether the smoother
    beats the dumbest calendar forecast before anyone trusts
    `holt_forecast_hourly`'s projection (the forecasting sibling of
    `minhash_eval_report` / `ann_recall_report`).

    Exactness: the Holt fold runs on the train prefix exactly as the
    production operator does; every held-out error snaps
    |x − x̂|·1e6 to BIGINT BEFORE summation, so both MAEs and their
    MASE ratio are integer arithmetic with one snapped division each.
    The series is the BOUNDED gap-filled hourly table; everything
    past the per-hour pre-aggregation is fixed-size work.

    Output: one row (n_hours, t_train, h_test, mae_holt, mae_naive,
    mase)."""
    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    arr = F.array_sort(F.collect_list(F.struct("h", "x")))
    one = filled.groupBy().agg(
        F.count(F.lit(1)).alias("n_hours"), arr.alias("arr")
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    one = one.selectExpr(
        "n_hours",
        "transform(arr, s -> cast(s.x as double)) AS vals",
        "(4 * n_hours) div 5 AS t_train",
    ).filter(
        # Guard (ADVICE r5): with t_train < one season the seasonal-
        # naive lookup index t_train + k - 24*ceil(k/24) can hit 0
        # (element_at error) or go negative (element_at silently reads
        # from the END of the array) while the SQL oracle's inner join
        # just drops those rows — a silent cross-engine divergence on
        # short fixtures. Both engines now return 0 rows below one
        # season (mirrored WHERE in HOLT_BACKTEST_SQL).
        F.col("t_train") >= BT_SEASON
    ).selectExpr(
        "n_hours",
        "vals",
        "t_train",
        "n_hours - t_train AS h_test",
        f"""aggregate(
              slice(vals, 3, greatest(t_train - 2, 0)),
              named_struct('l', element_at(vals, 1),
                           'b', element_at(vals, 2) - element_at(vals, 1)),
              (acc, x) -> named_struct(
                'l', {a} * x + {1 - a} * (acc.l + acc.b),
                'b', {b} * (({a} * x + {1 - a} * (acc.l + acc.b)) - acc.l)
                     + {1 - b} * acc.b)
            ) AS st""",
    ).selectExpr(
        "n_hours",
        "t_train",
        "h_test",
        """aggregate(
             transform(sequence(1, h_test),
               k -> cast(round(abs(element_at(vals, cast(t_train + k as int))
                    - (st.l + k * st.b)) * 1e6) as bigint)),
             cast(0 as bigint), (acc, e) -> acc + e) AS se_holt""",
        f"""aggregate(
             transform(sequence(1, h_test),
               k -> cast(round(abs(element_at(vals, cast(t_train + k as int))
                    - element_at(vals, cast(t_train + k
                        - {BT_SEASON} * ((k + {BT_SEASON - 1}) div {BT_SEASON})
                        as int))) * 1e6) as bigint)),
             cast(0 as bigint), (acc, e) -> acc + e) AS se_naive""",
    )
    return one.selectExpr(
        "n_hours",
        "t_train",
        "h_test",
        "cast(round(se_holt / (h_test * 1e6) * 1e6) as bigint) / 1e6"
        " AS mae_holt",
        "cast(round(se_naive / (h_test * 1e6) * 1e6) as bigint) / 1e6"
        " AS mae_naive",
        "cast(round(se_holt / cast(se_naive as double) * 1e6) as bigint)"
        " / 1e6 AS mase",
    )


HOLT_BACKTEST_SQL = f"""
WITH RECURSIVE {_HOURLY_FILLED_SQL.lstrip().rstrip()},
idx AS (
  SELECT row_number() OVER (ORDER BY h) AS i, CAST(x AS DOUBLE) AS x
  FROM filled
), nn AS (
  SELECT count(*) AS n, (4 * count(*)) // 5 AS t_train,
         count(*) - (4 * count(*)) // 5 AS h_test
  FROM idx
),
rec(t, l, b) AS (
  SELECT 2,
         (SELECT x FROM idx WHERE i = 1),
         (SELECT x FROM idx WHERE i = 2) - (SELECT x FROM idx WHERE i = 1)
  UNION ALL
  SELECT r.t + 1,
         {HOLT_ALPHA} * i.x + {1 - HOLT_ALPHA} * (r.l + r.b),
         {HOLT_BETA} * (({HOLT_ALPHA} * i.x + {1 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
           + {1 - HOLT_BETA} * r.b
  FROM rec r JOIN idx i ON i.i = r.t + 1
  WHERE r.t + 1 <= (SELECT t_train FROM nn)
),
fitted AS (
  SELECT r.l, r.b FROM rec r CROSS JOIN nn WHERE r.t = nn.t_train
),
errs AS (
  SELECT k,
         CAST(round(abs(xt.x - (f.l + k * f.b)) * 1e6) AS BIGINT) AS e_holt,
         CAST(round(abs(xt.x - xn.x) * 1e6) AS BIGINT) AS e_naive
  FROM nn, unnest(range(1, nn.h_test + 1)) AS t(k)
  CROSS JOIN fitted f
  JOIN idx xt ON xt.i = nn.t_train + k
  JOIN idx xn ON xn.i = nn.t_train + k
    - {BT_SEASON} * ((k + {BT_SEASON - 1}) // {BT_SEASON})
  WHERE nn.t_train >= {BT_SEASON}
)
SELECT nn.n AS n_hours, nn.t_train, nn.h_test,
       CAST(round(sum(e_holt) / (nn.h_test * 1e6) * 1e6) AS BIGINT) / 1e6
         AS mae_holt,
       CAST(round(sum(e_naive) / (nn.h_test * 1e6) * 1e6) AS BIGINT) / 1e6
         AS mae_naive,
       CAST(round(sum(e_holt) / CAST(sum(e_naive) AS DOUBLE) * 1e6)
            AS BIGINT) / 1e6 AS mase
FROM errs CROSS JOIN nn
GROUP BY nn.n, nn.t_train, nn.h_test
"""


# --- LTTB downsampling (parallel average-anchor variant) ---------------------

LTTB_BUCKETS = 60  # target points for the dashboard series


def lttb_downsample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle downsampling of the hourly series to
    {B} points — the dashboard decimation that keeps SHAPE (spikes,
    reversals) where uniform striding drops it (Steinarsson 2013; this
    is the thesis' parallelizable average-anchor variant: each
    bucket's anchor is its NEIGHBOR BUCKETS' average point rather than
    the previously-selected point, so every bucket selects
    independently — the sequential-dependency-free form a distributed
    engine wants, trading the paper's ~2% area for full parallelism).

    Exactness: with integer hour-index/cents coordinates and rational
    anchors (sums/counts), the triangle area comparison multiplies
    through by both neighbor counts — every compared magnitude is an
    exact DECIMAL(38,0) integer, ties broken by the earlier hour, so
    both engines pick identical points. Plan: bucket assignment is a
    pure expression off the one-row bounds; neighbor-anchor tables are
    ≤{B} rows broadcast; selection is one (bucket)-keyed max-struct
    partial+final agg — no window over the series.

    Output: ({B} + first/last) selected (i, x) points."""
    tune(spark)
    filled = _hourly_filled(spark, sf_dir)
    w_all = filled.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.min("h").alias("h0")
    )
    idx = filled.crossJoin(F.broadcast(w_all)).select(
        F.expr(
            "cast((cast(h as long) - cast(h0 as long)) / 3600 as bigint) + 1"
        ).alias("i"),
        "x",
        "n",
    )
    b = LTTB_BUCKETS
    # interior points [2, n-1] split into B buckets; first/last kept
    bkt = F.expr(
        f"CASE WHEN i = 1 THEN cast(0 as bigint)"
        f" WHEN i = n THEN cast({b + 1} as bigint)"
        f" ELSE ((i - 2) * {b}) div (n - 2) + 1 END"
    )
    withb = idx.select("i", "x", bkt.alias("bkt"))
    anchors = withb.groupBy("bkt").agg(
        F.sum("i").alias("si"), F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("c"),
    )
    prev = anchors.selectExpr(
        "bkt + 1 AS bkt", "si AS psi", "sx AS psx", "c AS pc"
    )
    nxt = anchors.selectExpr(
        "bkt - 1 AS bkt", "si AS nsi", "sx AS nsx", "c AS nc"
    )
    # 2·area·pc·nc = |(psi·nc − nsi·pc)·(x·pc·nc) − … | expanded with
    # the point (i, x) and the two rational anchors (psi/pc, psx/pc),
    # (nsi/nc, nsx/nc), multiplied through by pc·nc — exact integers.
    area2 = (
        "abs(cast(psi as decimal(38,0)) * nc * (x * pc * nc)"
        " - cast(nsi as decimal(38,0)) * pc * (x * pc * nc)"
        " + cast(nsi as decimal(38,0)) * pc * (psx * nc)"
        " - cast(i as decimal(38,0)) * pc * nc * (psx * nc)"
        " + cast(i as decimal(38,0)) * pc * nc * (nsx * pc)"
        " - cast(psi as decimal(38,0)) * nc * (nsx * pc))"
    )
    interior = (
        withb.filter((F.col("bkt") >= 1) & (F.col("bkt") <= b))
        .join(F.broadcast(prev), "bkt")
        .join(F.broadcast(nxt), "bkt")
        .selectExpr("bkt", "i", "x", f"{area2} AS a2")
        .groupBy("bkt")
        .agg(F.max(F.expr("struct(a2, -i as ni, x)")).alias("m"))
        .selectExpr("bkt", "-m.ni AS i", "m.x AS x")
    )
    ends = withb.filter((F.col("bkt") == 0) | (F.col("bkt") == b + 1)).select(
        "bkt", "i", "x"
    )
    return interior.unionByName(ends).select("i", "x")


LTTB_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
w AS (SELECT count(*) AS n, min(h) AS h0 FROM filled),
idx AS (
  SELECT CAST((epoch(f.h) - epoch(w.h0)) // 3600 AS BIGINT) + 1 AS i,
         CAST(f.x AS BIGINT) AS x, w.n
  FROM filled f CROSS JOIN w
),
withb AS (
  SELECT i, x,
         CASE WHEN i = 1 THEN 0
              WHEN i = n THEN {LTTB_BUCKETS + 1}
              ELSE ((i - 2) * {LTTB_BUCKETS}) // (n - 2) + 1 END AS bkt
  FROM idx
),
anchors AS (
  SELECT bkt, CAST(sum(i) AS BIGINT) AS si, CAST(sum(x) AS BIGINT) AS sx,
         count(*) AS c
  FROM withb GROUP BY bkt
),
scored AS (
  SELECT wb.bkt, wb.i, wb.x,
         abs(CAST(p.si AS DECIMAL(38,0)) * nx.c * (wb.x * p.c * nx.c)
           - CAST(nx.si AS DECIMAL(38,0)) * p.c * (wb.x * p.c * nx.c)
           + CAST(nx.si AS DECIMAL(38,0)) * p.c * (p.sx * nx.c)
           - CAST(wb.i AS DECIMAL(38,0)) * p.c * nx.c * (p.sx * nx.c)
           + CAST(wb.i AS DECIMAL(38,0)) * p.c * nx.c * (nx.sx * p.c)
           - CAST(p.si AS DECIMAL(38,0)) * nx.c * (nx.sx * p.c)) AS a2
  FROM withb wb
  JOIN anchors p ON p.bkt = wb.bkt - 1
  JOIN anchors nx ON nx.bkt = wb.bkt + 1
  WHERE wb.bkt BETWEEN 1 AND {LTTB_BUCKETS}
),
sel AS (
  SELECT i, x FROM scored
  QUALIFY row_number() OVER (PARTITION BY bkt ORDER BY a2 DESC, i) = 1
)
SELECT i, x FROM sel
UNION ALL
SELECT i, x FROM withb WHERE bkt = 0 OR bkt = {LTTB_BUCKETS + 1}
"""


# --- group-sequential SPRT (hourly looks) ----------------------------------

import math  # noqa: E402  (stdlib; constants snapped at import, below)

SPRT_P0 = 0.18  # H0 conversion rate (purchase share of all events)
SPRT_P1 = 0.22  # H1 conversion rate
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05
#: micro-nat-snapped LLR increments and Wald boundaries — computed ONCE
#: here and embedded as integer literals in BOTH the Spark expression and
#: the oracle SQL, so the walk is pure BIGINT in both engines (FIXTURES
#: rule 5: transcendentals only at fixed arity, snapped before any sum).
#: Micro (1e6), not nano: K·A must fit int64 even at 100 TB trial counts
#: (1e12 trials × 2e5 ≈ 2e17 < 2^63; nano would overflow at ~5e10).
SPRT_A_N = round(math.log(SPRT_P1 / SPRT_P0) * 1e6)  # per conversion
SPRT_B_N = round(math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1e6)  # per miss
SPRT_UP_N = round(math.log((1 - SPRT_BETA) / SPRT_ALPHA) * 1e6)
SPRT_LO_N = round(math.log(SPRT_BETA / (1 - SPRT_ALPHA)) * 1e6)


def sprt_conversion_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT on the purchase-conversion rate with HOURLY looks —
    the early-stopping sequential A/B monitor (group-sequential at the
    hour boundary: decisions are made when a batch lands, the
    production shape) for H0: p={SPRT_P0} vs H1: p={SPRT_P1} at
    α=β=0.05. One row: totals, the first boundary crossing (hour +
    which boundary), and the final log-likelihood ratio.

    Exact shape: the stream collapses to the BOUNDED per-hour
    (trials, conversions) table first; the LLR walk is
    LLR_t = A·K_t + B·(N_t−K_t) with A/B/boundaries pre-snapped
    integer micro-nats, so the cumulative walk, the crossing scan, and
    the decision are pure BIGINT comparisons — order-independent and
    identical in both engines. The only window runs over the ≤#hours
    grid (bounded by the observation window, never data volume)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        (F.col("event_type") == "purchase").alias("conv"),
    )
    per_h = ev.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("conv"), 1).otherwise(0)).alias("k"),
    )
    return sprt_from_hourly(per_h)


def sprt_from_hourly(per_h: DataFrame) -> DataFrame:
    """The SPRT walk over a (h, n, k) per-hour count table — shared by
    the batch op and the streaming twin (whose stream state IS the
    bounded per-hour table)."""
    w = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    cum = per_h.select(
        "h",
        F.sum("n").over(w).alias("nn"),
        F.sum("k").over(w).alias("kk"),
    ).select(
        "h",
        (
            F.col("kk") * F.lit(SPRT_A_N)
            + (F.col("nn") - F.col("kk")) * F.lit(SPRT_B_N)
        ).alias("llr"),
    )
    crossed = cum.select(
        "h",
        F.when(F.col("llr") >= SPRT_UP_N, 1)
        .when(F.col("llr") <= SPRT_LO_N, -1)
        .otherwise(0)
        .alias("flag"),
    ).filter(F.col("flag") != 0)
    first = crossed.groupBy().agg(
        F.min(F.struct("h", "flag")).alias("m")
    )
    tot = per_h.groupBy().agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("n_trials"),
        F.sum("k").alias("k_conv"),
    )
    return tot.crossJoin(F.broadcast(first)).select(
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.col("n_trials").cast("bigint").alias("n_trials"),
        F.col("k_conv").cast("bigint").alias("k_conv"),
        F.when(F.col("m").isNull(), "continue")
        .when(F.col("m.flag") == 1, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
        F.expr("cast(cast(m.h as long) div 3600 as bigint)").alias(
            "cross_epoch_hour"
        ),
        (
            F.col("k_conv") * F.lit(SPRT_A_N)
            + (F.col("n_trials") - F.col("k_conv")) * F.lit(SPRT_B_N)
        ).cast("bigint").alias("llr_final_micro"),
    )


SPRT_SQL = f"""
WITH per_h AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
  FROM events GROUP BY 1
), cum AS (
  SELECT h,
         sum(k) OVER (ORDER BY h) * {SPRT_A_N}
         + (sum(n) OVER (ORDER BY h) - sum(k) OVER (ORDER BY h))
           * {SPRT_B_N} AS llr
  FROM per_h
), crossed AS (
  SELECT h, CASE WHEN llr >= {SPRT_UP_N} THEN 1
                 WHEN llr <= {SPRT_LO_N} THEN -1 ELSE 0 END AS flag
  FROM cum
), first AS (
  SELECT (SELECT struct_pack(h := h, flag := flag)
          FROM crossed WHERE flag <> 0 ORDER BY h LIMIT 1) AS m
), tot AS (
  SELECT count(*) AS n_hours, sum(n) AS n_trials, sum(k) AS k_conv
  FROM per_h
)
SELECT CAST(t.n_hours AS BIGINT) AS n_hours,
       CAST(t.n_trials AS BIGINT) AS n_trials,
       CAST(t.k_conv AS BIGINT) AS k_conv,
       CASE WHEN f.m IS NULL THEN 'continue'
            WHEN f.m.flag = 1 THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(epoch(f.m.h) // 3600 AS BIGINT) AS cross_epoch_hour,
       CAST(t.k_conv * {SPRT_A_N}
            + (t.n_trials - t.k_conv) * {SPRT_B_N} AS BIGINT)
         AS llr_final_micro
FROM tot t CROSS JOIN first f
"""


# --- classical seasonal decomposition (hourly, period 24) -------------------

SEAS_PERIOD = 24


def seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the gap-filled
    hourly value series (period {SEAS_PERIOD}): trend = centered 24h
    moving average, seasonal index s(hod) = mean detrended value per
    hour-of-day — the decomposition a monitoring stack runs before
    alerting on "down vs yesterday" (statsmodels seasonal_decompose
    shape). 24 rows: (hod, n_obs, seasonal dollars 6dp).

    Exact shape: everything lives on the BOUNDED hour grid. The
    centered even-period MA (half-weight ends) is computed ×48 so it
    stays integer: T2_t = x_{{t−12}} + 2·Σ_{{|j|<12}} x_{{t+j}} +
    x_{{t+12}}, built by a CONTRIBUTION EXPLODE (each grid hour sends
    w_j·x to t = i−j over a 25-row broadcast offset table — the
    rolling-DAU pattern, never a per-frame rescan); only hours whose
    weight mass is the full 48 keep a trend (exact interior test).
    Detrended d_t = 48·x_t − T2_t is integer cents×48; the per-hod
    mean is one exact integer sum / (48·cnt·100), snapped to 6dp."""
    tune(spark)
    return seasonal_from_filled(spark, _hourly_filled(spark, sf_dir))


def seasonal_from_filled(spark: SparkSession, filled_h: DataFrame) -> DataFrame:
    """The decomposition fold over a gap-filled (h, x) hourly table —
    shared by the batch op and the streaming twin (whose stream state
    IS the bounded per-hour sum table)."""
    filled = filled_h.select(
        F.expr("cast(cast(h as long) div 3600 as bigint)").alias("i"), "x"
    )
    offs = spark.range(-(SEAS_PERIOD // 2), SEAS_PERIOD // 2 + 1).select(
        F.col("id").alias("j"),
        F.when(F.abs("id") == SEAS_PERIOD // 2, 1).otherwise(2).alias("w"),
    )
    t2 = (
        filled.crossJoin(F.broadcast(offs))
        .select(
            (F.col("i") - F.col("j")).alias("t"),
            (F.col("x") * F.col("w")).alias("c"),
            "w",
        )
        .groupBy("t")
        .agg(F.sum("c").alias("t2"), F.sum("w").alias("wsum"))
        .filter(F.col("wsum") == 2 * SEAS_PERIOD)
    )
    d = filled.join(t2, filled["i"] == t2["t"]).select(
        F.pmod(F.col("t"), F.lit(SEAS_PERIOD)).cast("bigint").alias("hod"),
        (F.lit(2 * SEAS_PERIOD) * F.col("x") - F.col("t2")).alias("d"),
    )
    return (
        d.groupBy("hod")
        .agg(F.sum("d").alias("sd"), F.count(F.lit(1)).alias("n_obs"))
        .select(
            "hod",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.expr(
                f"cast(round(sd / ({2 * SEAS_PERIOD}.0 * n_obs * 100) * 1e6)"
                " as bigint) / 1e6"
            ).alias("seasonal_dollars"),
        )
        .orderBy("hod")
    )


SEASONAL_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
idx AS (
  SELECT CAST(epoch(h) // 3600 AS BIGINT) AS i, CAST(x AS BIGINT) AS x
  FROM filled
),
offs AS (
  SELECT j, CASE WHEN abs(j) = {SEAS_PERIOD // 2} THEN 1 ELSE 2 END AS w
  FROM (SELECT unnest(range(-{SEAS_PERIOD // 2}, {SEAS_PERIOD // 2 + 1})) AS j)
),
t2 AS (
  SELECT i.i - o.j AS t, sum(i.x * o.w) AS t2, sum(o.w) AS wsum
  FROM idx i CROSS JOIN offs o
  GROUP BY 1 HAVING sum(o.w) = {2 * SEAS_PERIOD}
),
d AS (
  SELECT ((t2.t % {SEAS_PERIOD}) + {SEAS_PERIOD}) % {SEAS_PERIOD} AS hod,
         {2 * SEAS_PERIOD} * i.x - t2.t2 AS d
  FROM idx i JOIN t2 ON t2.t = i.i
)
SELECT CAST(hod AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n_obs,
       CAST(round(sum(d) / ({2 * SEAS_PERIOD}.0 * count(*) * 100) * 1e6)
            AS BIGINT) / 1e6 AS seasonal_dollars
FROM d GROUP BY hod ORDER BY hod
"""


# --- embedding-space drift monitor ------------------------------------------

EMB_DRIFT_TOP = 5  # report the 5 dims with the largest mean shift
EMB_COMP_SCALE = 1_000_000  # components snapped to integer micro-units
EMB_PROD_SCALE = 1_000_000_000_000  # mean-product terms in pico-units


def embedding_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two corpus snapshots (even vs odd
    vec_id — the deterministic half-split): per-dimension mean-vector
    shift, top {EMB_DRIFT_TOP} dims by |shift|, plus the cosine
    between the two mean vectors — the monitor an embedding pipeline
    runs after a model or corpus refresh (centroid drift ≈ systematic
    encoder change; single-dim spikes ≈ a broken feature/normalization
    lane). The reference re-embeds blindly (`indexer.py:62-66`); this
    is the check that says whether downstream indexes must rebuild.

    Exact shape: components snap to integer micro-units at the scan,
    so per-(dim, half) sums are pure BIGINT (order-independent); the
    per-dim mean products feeding the cosine snap to integer
    pico-units BEFORE the 64-element sum (FIXTURES rule 5). Explode is
    dims×rows but collapses map-side to the 2×64-row (half, dim)
    table; no window, no python, one shuffle of 128 rows."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return emb_drift_from_per_dim(emb_drift_per_dim(emb))


ANISO_BINS = 10  # cosine histogram bins over [-1, 1]


def embedding_anisotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy / collapse monitor: the distribution
    of pairwise cosines over a deterministic pair sample (vec_id 2k
    paired with 2k+1). Healthy embedding spaces have near-zero mean
    pairwise cosine; representation collapse (all vectors pointing one
    way — the classic failure after a bad contrastive run or an
    un-normalized encoder refresh) shows as the mass piling into the
    top bins and the mean rising toward 1 (Ethayarajh 2019's
    anisotropy diagnostic, run as a table scan). Companion to
    `embedding_drift_monitor` (BETWEEN-snapshot shift; this is the
    WITHIN-snapshot geometry).

    Exact shape: pairing is one self-equi-join on `vec_id div 2`
    (shuffle on an 8-byte key, no sampling RNG — deterministic at any
    parallelism); each pair's cosine snaps to micro-units immediately
    (one fixed-arity double per pair); the histogram and mean are
    integer count/sum aggregation over the snapped values.

    Output: (bin, lo_6, n_pairs, share_6, mean_cos_micro) — always
    exactly {ANISO_BINS} rows (empty bins explicit zero rows, via the
    bin spine), ordered by bin; mean_cos_micro is the global snapped
    mean in integer micro-units, repeated per row."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.expr("vec_id div 2").alias("k"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.expr("vec_id div 2").alias("k"), F.col("embedding").alias("vb")
    )
    from spec_search_spark.functions.vector import cosine_similarity

    pairs = a.join(b, "k").select(
        F.round(cosine_similarity(F.col("va"), F.col("vb")) * 1_000_000)
        .cast("bigint")
        .alias("cos6")
    )
    binned = pairs.select(
        F.least(
            F.lit(ANISO_BINS - 1),
            F.greatest(
                F.lit(0),
                ((F.col("cos6") + 1_000_000) * ANISO_BINS / 2_000_000).cast(
                    "bigint"
                ),
            ),
        ).alias("bin"),
        "cos6",
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("cos6").alias("s")
    )
    tot = hist.groupBy().agg(
        F.sum("n_pairs").alias("n"), F.sum("s").alias("st")
    )
    # full bin spine: a COLLAPSED space piles all mass into one bin —
    # the exact condition this monitor exists for — so empty bins must
    # appear as explicit zero rows, not be silently absent
    spine = spark.range(ANISO_BINS).select(F.col("id").alias("bin"))
    return (
        spine.join(hist, "bin", "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "cast(bin as int) AS bin",
            f"cast(bin * 2000000 div {ANISO_BINS} as bigint) - 1000000 AS lo_6",
            "cast(coalesce(n_pairs, 0) as bigint) AS n_pairs",
            "cast(round(cast(coalesce(n_pairs, 0) as double) / n * 1e6)"
            " as bigint) / 1e6 AS share_6",
            "cast(round(cast(st as double) / n) as bigint) AS mean_cos_micro",
        )
        .orderBy("bin")
    )


def _anisotropy_sql() -> str:
    from spec_search_spark.functions.vector import cosine_similarity_sql

    return ANISOTROPY_SQL_TMPL.replace(
        "{cos}", cosine_similarity_sql("va", "vb")
    )


ANISOTROPY_SQL_TMPL = f"""
WITH a AS (SELECT vec_id // 2 AS k, embedding AS va FROM embeddings
           WHERE vec_id % 2 = 0),
b AS (SELECT vec_id // 2 AS k, embedding AS vb FROM embeddings
      WHERE vec_id % 2 = 1),
pairs AS (
  SELECT CAST(round(({{cos}}) * 1000000) AS BIGINT) AS cos6
  FROM a JOIN b USING (k)
),
binned AS (
  SELECT least({ANISO_BINS - 1},
               greatest(0, (cos6 + 1000000) * {ANISO_BINS} // 2000000)) AS bin,
         cos6
  FROM pairs
),
hist AS (SELECT bin, count(*) AS n_pairs, sum(cos6) AS s FROM binned GROUP BY bin),
tot AS (SELECT sum(n_pairs) AS n, sum(s) AS st FROM hist),
spine AS (SELECT unnest(range(0, {ANISO_BINS})) AS bin)
SELECT CAST(spine.bin AS INT) AS bin,
       CAST(spine.bin * 2000000 // {ANISO_BINS} AS BIGINT) - 1000000 AS lo_6,
       CAST(coalesce(hist.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(round(CAST(coalesce(hist.n_pairs, 0) AS DOUBLE) / n * 1e6)
            AS BIGINT) / 1e6 AS share_6,
       CAST(round(CAST(st AS DOUBLE) / n) AS BIGINT) AS mean_cos_micro
FROM spine LEFT JOIN hist ON hist.bin = spine.bin CROSS JOIN tot
ORDER BY bin
"""


def emb_drift_per_dim(emb: DataFrame) -> DataFrame:
    """The (dim, sa, na, sb, nb) integer-sum aggregation over an
    embeddings table — stateless explode + one partial/final agg, so
    it runs identically on a batch scan and on a readStream (the
    streaming twin's ONLY state is this ≤n_dims-row table)."""
    comp = emb.select(
        (F.col("vec_id") % 2 == 0).alias("half_a"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "half_a",
        "dim",
        F.expr(f"cast(round(x * {EMB_COMP_SCALE}) as bigint)").alias("xm"),
    )
    return comp.groupBy("dim").agg(
        F.sum(F.when(F.col("half_a"), F.col("xm")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("half_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half_a"), 0).otherwise(F.col("xm"))).alias("sb"),
        F.sum(F.when(F.col("half_a"), 0).otherwise(1)).alias("nb"),
    )


def emb_drift_from_per_dim(per_dim: DataFrame) -> DataFrame:
    """The drift-scoring fold over a (dim, sa, na, sb, nb) integer sum
    table — shared by the batch monitor and the streaming twin (the
    per-dim sums ARE the bounded stream state). Dims where either half
    is empty are dropped before any division (ADVICE r6: a corpus
    whose vec_ids are all even or all odd would otherwise divide by
    zero with engine-dependent NULL/Inf semantics; mirrored in
    EMB_DRIFT_SQL)."""
    per_dim = per_dim.filter((F.col("na") > 0) & (F.col("nb") > 0))
    # cosine of the mean vectors from three pico-snapped integer sums
    prods = per_dim.selectExpr(
        f"cast(round(((cast(sa as double) / na)) * ((cast(sb as double) / nb))"
        f" / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0"
        f" * {EMB_PROD_SCALE}) as bigint) AS pab",
        f"cast(round(((cast(sa as double) / na)) * ((cast(sa as double) / na))"
        f" / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0"
        f" * {EMB_PROD_SCALE}) as bigint) AS paa",
        f"cast(round(((cast(sb as double) / nb)) * ((cast(sb as double) / nb))"
        f" / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0"
        f" * {EMB_PROD_SCALE}) as bigint) AS pbb",
    )
    cos = prods.groupBy().agg(
        F.sum("pab").alias("nab"),
        F.sum("paa").alias("naa"),
        F.sum("pbb").alias("nbb"),
    ).selectExpr(
        "cast(round(cast(nab as double) / sqrt(cast(naa as double)) / sqrt(cast(nbb as double)) * 1e6)"
        " as bigint) / 1e6 AS mean_cosine_6"
    )
    return (
        per_dim.crossJoin(F.broadcast(cos))
        .selectExpr(
            "dim",
            "cast(round((cast(sa as double) / na)) as bigint) AS mean_a_micro",
            "cast(round((cast(sb as double) / nb)) as bigint) AS mean_b_micro",
            "cast(round(abs((cast(sa as double) / na) - (cast(sb as double) / nb))) as bigint)"
            " AS abs_shift_micro",
            "mean_cosine_6",
        )
        .orderBy(F.desc("abs_shift_micro"), F.asc("dim"))
        .limit(EMB_DRIFT_TOP)
    )


EMB_DRIFT_SQL = f"""
WITH comp AS (
  SELECT vec_id % 2 = 0 AS half_a, d AS dim,
         CAST(round(embedding[d + 1] * {EMB_COMP_SCALE}) AS BIGINT) AS xm
  FROM embeddings,
       LATERAL unnest(range(0, len(embedding))) AS u(d)
),
per_dim AS (
  SELECT dim,
         sum(CASE WHEN half_a THEN xm ELSE 0 END) AS sa,
         sum(CASE WHEN half_a THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN half_a THEN 0 ELSE xm END) AS sb,
         sum(CASE WHEN half_a THEN 0 ELSE 1 END) AS nb
  FROM comp GROUP BY dim
  HAVING sum(CASE WHEN half_a THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN half_a THEN 0 ELSE 1 END) > 0
),
prods AS (
  SELECT CAST(round(((cast(sa as double) / na)) * ((cast(sb as double) / nb))
           / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0
           * {EMB_PROD_SCALE}) AS BIGINT) AS pab,
         CAST(round(((cast(sa as double) / na)) * ((cast(sa as double) / na))
           / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0
           * {EMB_PROD_SCALE}) AS BIGINT) AS paa,
         CAST(round(((cast(sb as double) / nb)) * ((cast(sb as double) / nb))
           / {EMB_COMP_SCALE}.0 / {EMB_COMP_SCALE}.0
           * {EMB_PROD_SCALE}) AS BIGINT) AS pbb
  FROM per_dim
),
cosd AS (
  SELECT CAST(round(cast(sum(pab) as double) / sqrt(cast(sum(paa) as double))
              / sqrt(cast(sum(pbb) as double)) * 1e6) AS BIGINT) / 1e6
           AS mean_cosine_6
  FROM prods
)
SELECT dim,
       CAST(round((cast(sa as double) / na)) AS BIGINT) AS mean_a_micro,
       CAST(round((cast(sb as double) / nb)) AS BIGINT) AS mean_b_micro,
       CAST(round(abs((cast(sa as double) / na) - (cast(sb as double) / nb))) AS BIGINT)
         AS abs_shift_micro,
       mean_cosine_6
FROM per_dim CROSS JOIN cosd
ORDER BY abs_shift_micro DESC, dim ASC
LIMIT {EMB_DRIFT_TOP}
"""


# --- Page-Hinkley changepoint (mean-increase alarm) --------------------------

PH_SCALE = 1_000_000  # per-hour terms snapped to micro-cents
PH_LAMBDA = 500_000_000_000  # alarm threshold (micro-cents): fires on the
# sf0.01 fixture (PH_max ≈ 7.98e11) — both alarm branches exercised across
# the sf ladder; a production deployment calibrates λ to its own scale


def page_hinkley_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley mean-increase monitor on the gap-filled hourly
    value series — the classic sequential changepoint ALARM (Page
    1954; the standard drift detector in river/MOA): m_t = Σ_{{i≤t}}
    (x_i − x̄_i), PH_t = m_t − min_{{s≤t}} m_s, alarm when PH_t > λ.
    Where CUSUM (cusum_changepoint_hourly) retrospectively locates the
    best split, Page-Hinkley answers the ONLINE question: at which
    hour would a monitor have fired?

    Exact shape: everything lives on the BOUNDED hour grid. Each
    term x_i − S_i/i is one fixed-arity double from exact integers,
    snapped to micro-cents BEFORE the cumulative sums (FIXTURES rule
    5); m_t and its prefix min accumulate in DECIMAL(38,0) windows
    over the grid, so the walk is order-independent and identical in
    both engines. One row: n_hours, ph_max, the first alarm hour
    (NULL when PH never crosses λ), and the decision."""
    tune(spark)
    return ph_from_filled(_hourly_filled(spark, sf_dir))


def ph_from_filled(filled: DataFrame) -> DataFrame:
    """The Page-Hinkley fold over a gap-filled (h, x) hourly table —
    shared by the batch op and the streaming twin."""
    w = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    cum = filled.select(
        "h",
        "x",
        F.sum("x").over(w).alias("s"),
        F.row_number().over(W.orderBy("h")).alias("i"),
    )
    terms = cum.select(
        "h",
        F.expr(
            f"cast(round((x - s / cast(i as double)) * {PH_SCALE})"
            " as bigint)"
        ).alias("t"),
    )
    m = terms.select(
        "h", F.sum(F.expr("cast(t as decimal(38,0))")).over(w).alias("mt")
    )
    ph = m.select(
        "h",
        (F.col("mt") - F.min("mt").over(w)).alias("ph"),
    )
    first = ph.filter(F.col("ph") > PH_LAMBDA).groupBy().agg(
        F.min("h").alias("ah")
    )
    agg = ph.groupBy().agg(
        F.count(F.lit(1)).alias("n_hours"), F.max("ph").alias("ph_max")
    )
    return agg.crossJoin(F.broadcast(first)).selectExpr(
        "cast(n_hours as bigint) AS n_hours",
        "cast(ph_max as bigint) AS ph_max_micro",
        "cast(cast(ah as long) div 3600 as bigint) AS alarm_epoch_hour",
        "CASE WHEN ah IS NULL THEN 'no_alarm' ELSE 'alarm' END AS decision",
    )


PAGE_HINKLEY_SQL = f"""
WITH {_HOURLY_FILLED_SQL.lstrip()},
cum AS (
  SELECT h, x, sum(x) OVER (ORDER BY h) AS s,
         row_number() OVER (ORDER BY h) AS i
  FROM filled
),
terms AS (
  SELECT h, CAST(round((x - s / CAST(i AS DOUBLE)) * {PH_SCALE})
              AS BIGINT) AS t
  FROM cum
),
m AS (SELECT h, sum(CAST(t AS DECIMAL(38,0))) OVER (ORDER BY h) AS mt
      FROM terms),
ph AS (SELECT h, mt - min(mt) OVER (ORDER BY h) AS ph FROM m),
first AS (
  SELECT (SELECT min(h) FROM ph WHERE ph > {PH_LAMBDA}) AS ah
),
agg AS (SELECT count(*) AS n_hours, max(ph) AS ph_max FROM ph)
SELECT CAST(a.n_hours AS BIGINT) AS n_hours,
       CAST(a.ph_max AS BIGINT) AS ph_max_micro,
       CAST(epoch(f.ah) // 3600 AS BIGINT) AS alarm_epoch_hour,
       CASE WHEN f.ah IS NULL THEN 'no_alarm' ELSE 'alarm' END AS decision
FROM agg a CROSS JOIN first f
"""


QUERIES = {
    "ks_test_priority_revenue": ks_test_priority_revenue,
    "sprt_conversion_hourly": sprt_conversion_hourly,
    "seasonal_decompose_hourly": seasonal_decompose_hourly,
    "page_hinkley_hourly": page_hinkley_hourly,
    "embedding_drift_monitor": embedding_drift_monitor,
    "embedding_anisotropy_report": embedding_anisotropy_report,
    "holt_forecast_hourly": holt_forecast_hourly,
    "holt_backtest_mase": holt_backtest_mase,
    "lttb_downsample_hourly": lttb_downsample_hourly,
    "psi_value_drift": psi_value_drift,
    "benford_first_digit": benford_first_digit,
    "hourly_autocorrelation": hourly_autocorrelation,
    "cramers_v_priority_status": cramers_v_priority_status,
    "cusum_changepoint_hourly": cusum_changepoint_hourly,
    "wilcoxon_ampm_hourly": wilcoxon_ampm_hourly,
    "mann_kendall_daily_by_priority": mann_kendall_daily_by_priority,
    "mann_kendall_hourly": mann_kendall_hourly,
    "theil_sen_hourly": theil_sen_hourly,
}

ORACLES = {
    "ks_test_priority_revenue": KS_SQL,
    "sprt_conversion_hourly": SPRT_SQL,
    "seasonal_decompose_hourly": SEASONAL_SQL,
    "page_hinkley_hourly": PAGE_HINKLEY_SQL,
    "embedding_drift_monitor": EMB_DRIFT_SQL,
    "embedding_anisotropy_report": _anisotropy_sql(),
    "holt_forecast_hourly": HOLT_SQL,
    "holt_backtest_mase": HOLT_BACKTEST_SQL,
    "lttb_downsample_hourly": LTTB_SQL,
    "psi_value_drift": PSI_SQL,
    "benford_first_digit": BENFORD_SQL,
    "hourly_autocorrelation": ACF_SQL,
    "cramers_v_priority_status": CRAMERS_SQL,
    "mann_kendall_hourly": MANN_KENDALL_SQL,
    "theil_sen_hourly": THEIL_SEN_SQL,
    "cusum_changepoint_hourly": CUSUM_SQL,
    "wilcoxon_ampm_hourly": WILCOXON_SQL,
    "mann_kendall_daily_by_priority": MK_PANEL_SQL,
}
