"""Window/analytic + event-time operator pack over `events` and
`orders` (SURVEY.md §2.5 — absent in the reference, required by the
target engine; §2.3's as-of join composition lives here too).

Scale notes: every window partitions by a key (user_id / custkey) —
one shuffle per distinct partitioning, reused by consecutive window
functions over the same (partitionBy, orderBy). Global (unpartitioned)
windows are avoided entirely — they serialize onto one task at 100 TB.

Determinism: window order keys always end in a unique column
(event_id / orderkey); running DOUBLE sums fold in the identical
order in both engines → bit-equal, but we still round defensively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (row_number ≤ k).

    Scale: AQE-coalesced single shuffle on custkey; rank filter is
    applied before any further join, cutting data 25×.
    """
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total of event value (rows-frame cumulative)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


WINDOW_RUNNING_SQL = f"""
SELECT user_id, event_id,
       strftime(ts, '{_TS_FMT_DUCK}') AS ts_s,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_value
FROM events
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta vs previous event per user: value change + gap in ms."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) / F.lit(1000)
        ).cast("bigint").alias("gap_ms"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER w, 2) AS value_delta,
       CAST((epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000 AS BIGINT) AS gap_ms
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap starts a new session;
    per-user session stats.

    Scale: the lag + cumulative-sum-of-boundaries idiom is one shuffle
    on user_id and streams within each partition — the standard
    scalable sessionizer (vs. a quadratic self-join).
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("bigint").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.max("session_value"), 2).alias("max_session_value"),
        )
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         round(sum(value), 2) AS session_value
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(max(session_id) AS BIGINT) AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       round(max(session_value), 2) AS max_session_value
FROM per_session GROUP BY user_id
"""


def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract JSON prop and aggregate per event type
    (`events.props` is a JSON string → get_json_object, codegen'd)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       round(avg(json_extract_string(props, '$.k')::BIGINT), 4) AS avg_k,
       count(*) AS n
FROM events
GROUP BY event_type
"""


def variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT miss-path semantics (the sibling of
    `scalar_sql.variant_shred_stats`, which covers the happy typed
    path): `try_variant_get` on an ABSENT field must be null-safe —
    `n_plan_present` counts rows where '$.plan' resolved, and both
    engines must agree it is 0 — while the present field groups into
    k-deciles with an exact integer-cents value sum. Schema-on-read
    columns at 100 TB are exactly this: most paths missing from most
    rows, and the engine's null behavior is load-bearing."""
    ev = _t(spark, sf_dir, "events")
    v = ev.selectExpr(
        "value", "parse_json(props) AS v"
    ).selectExpr(
        "variant_get(v, '$.k', 'bigint') AS k",
        "try_variant_get(v, '$.plan', 'string') AS plan",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    return (
        v.groupBy(F.expr("CAST(k div 10 AS INT)").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.sum(F.when(F.col("plan").isNotNull(), 1).otherwise(0)).alias(
                "n_plan_present"
            ),
        )
    )


VARIANT_SQL = """
SELECT CAST(json_extract(props, '$.k')::BIGINT // 10 AS INT) AS k_decile,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(sum(CASE WHEN json_extract_string(props, '$.plan') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_plan_present
FROM events
GROUP BY 1
"""


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time buckets (batch form of the streaming window;
    the Structured-Streaming twin is streaming/incremental.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def asof_join_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every 'click', the same user's most recent
    'purchase' at or before the click (SURVEY.md §2.3 — Spark has no
    native as-of; composed as union + last_value window).

    Scale: ONE shuffle on user_id and a streaming window — no range
    join, no per-user collect. Equivalent to DuckDB's native ASOF JOIN
    (the oracle). Purchases are first deduped to one per (user, ts)
    (max event_id) so tie-breaks are engine-independent.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_event_id"), F.round(F.max("value"), 2).alias("p_value"))
    )
    tagged = clicks.select(
        "user_id", "ts", F.col("event_id"), F.lit(None).cast("bigint").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"), F.lit(1).alias("kind"),
    ).unionByName(
        purchases.select(
            "user_id", "ts", F.lit(None).cast("bigint").alias("event_id"),
            "p_event_id", "p_value", F.lit(0).alias("kind"),
        )
    )
    # order purchases before clicks at equal ts → "at or before" semantics
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        tagged.withColumn("last_p_id", F.last("p_event_id", ignorenulls=True).over(w))
        .withColumn("last_p_ts", F.last(F.when(F.col("kind") == 0, F.col("ts")), True).over(w))
        .withColumn("last_p_value", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
    )
    return matched.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts"),
        F.col("last_p_id").alias("purchase_id"),
        F.date_format("last_p_ts", _TS_FMT).alias("purchase_ts"),
        F.col("last_p_value").alias("purchase_value"),
    )


ASOF_SQL = f"""
WITH purchases AS (
  SELECT user_id, ts, max(event_id) AS p_event_id, round(max(value), 2) AS p_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id AS click_id, c.user_id,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       p.p_event_id AS purchase_id,
       strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
       p.p_value AS purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""


def window_range_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time RANGE frame: per-user sum/count of events in
    the trailing 10 minutes — a numeric range frame over epoch-micros
    (identical semantics in both engines; Spark's native interval
    range frames apply here too, epoch keeps the oracle exact)."""
    ev = _t(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-10 * 60 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_10min"),
        F.round(F.sum("value").over(w), 2).alias("sum_10min"),
    )


WINDOW_RANGE_SQL = f"""
SELECT user_id, event_id,
       strftime(ts, '{_TS_FMT_DUCK}') AS ts_s,
       count(*) OVER w AS n_10min,
       round(sum(value) OVER w, 2) AS sum_10min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value analytics per user ordered by time."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
        F.round(F.col("value") - F.first("value").over(w), 2).alias("delta_vs_first"),
    )


WINDOW_FIRST_LAST_SQL = """
SELECT user_id, event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type,
       round(value - first_value(value) OVER w, 2) AS delta_vs_first
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def scd2_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change capture + latest-snapshot (the SCD-2 "current view" a
    warehouse MERGE maintains): treat each user's event stream as a
    versioned entity — count versions, count REAL changes (event_type
    differs from the previous version; the initial version counts),
    and surface the current state, all in one pass.

    Scale: one shuffle on user_id for the window; the per-user
    aggregate rides the SAME partitioning (no second exchange), so the
    plan is scan → exchange(user_id) → window → partial/final agg.
    Current state comes from the rn_desc=1 row inside the aggregate —
    no self-join back to the fact table."""
    ev = _t(spark, sf_dir, "events")
    wa = W.partitionBy("user_id").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    rows = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        (
            F.lag("event_type").over(wa).isNull()
            | (F.lag("event_type").over(wa) != F.col("event_type"))
        )
        .cast("bigint")
        .alias("changed"),
        F.row_number().over(wd).alias("rn_desc"),
    )
    return (
        rows.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum("changed").alias("n_changes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.max(F.when(F.col("rn_desc") == 1, F.col("event_type"))).alias("cur_type"),
            F.round(
                F.max(F.when(F.col("rn_desc") == 1, F.col("value"))), 2
            ).alias("cur_value"),
        )
        .orderBy("user_id")
    )


SCD2_SQL = """
WITH v AS (
  SELECT user_id, ts, event_type, value,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS changed,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_desc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*) AS n_versions,
       CAST(SUM(changed) AS BIGINT) AS n_changes,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
       MAX(CASE WHEN rn_desc = 1 THEN event_type END) AS cur_type,
       round(MAX(CASE WHEN rn_desc = 1 THEN value END), 2) AS cur_value
FROM v GROUP BY user_id ORDER BY user_id
"""


def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample: a dense hourly spine per event_type over
    the observed range, missing hours zero-filled for additive measures
    and forward-filled (last observation carried forward) for the level
    measure — the standard gap-fill a monitoring/feature pipeline needs
    before any rolling computation.

    Scale shape: the spine is #types × #hours — corpus-sublinear (time
    ranges grow in wall-clock, not data volume), built with
    sequence()+explode from a one-row bounds aggregate (crossJoin of a
    single row, not a driver collect). The left join back to observed
    buckets shuffles the tiny spine against the pre-aggregated hourly
    table, never the raw events. Forward-fill is one
    last(ignorenulls) running window per type, carrying the ROUNDED
    hourly sum — rounding happens before the carry in both engines, so
    the carried value is bit-identical (an avg here would land on .5
    boundaries where the two engines' double sums disagree by an ulp).
    """
    ev = _t(spark, sf_dir, "events")
    obs = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    bounds = obs.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    types = obs.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(obs, ["event_type", "h"], "left")
        .withColumn("carried_sum", F.last("sum_value", ignorenulls=True).over(w))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
            "carried_sum",
        )
    )


GAP_FILL_SQL = """
WITH obs AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
), bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
spine AS (
  SELECT t.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM obs) t
  CROSS JOIN bounds
  CROSS JOIN LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h) gs
)
SELECT s.event_type,
       strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(o.n, 0) AS n,
       coalesce(o.sum_value, 0.0) AS sum_value,
       last_value(o.sum_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_sum
FROM spine s
LEFT JOIN obs o ON o.h = s.h AND o.event_type = s.event_type
"""


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN gap-session operator (`F.session_window`, 30-min
    gap) — the declarative twin of the manual lag+cumsum `sessionize`:
    one groupBy produces per-session rows with the engine-computed
    window bounds, and the same aggregate runs unchanged in Structured
    Streaming (streaming/ uses the same function with a watermark).

    Semantics pinned by the oracle: session_window treats windows as
    [start, last_ts + gap), so a gap of EXACTLY 30 minutes starts a
    new session (>=, where the manual sessionizer's docstring idiom
    uses >); the oracle replicates >= and end = max(ts) + 30 min.

    Scale: one shuffle on (user_id) with Spark's session-merge
    aggregation — no window function, no lag materialization.
    """
    ev = _t(spark, sf_dir, "events")
    sw = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )
    return sw.select(
        "user_id",
        F.date_format("w.start", _TS_FMT).alias("session_start"),
        F.date_format("w.end", _TS_FMT).alias("session_end"),
        "n_events",
        "session_value",
    )


SESSION_WINDOW_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM marked
)
SELECT user_id,
       strftime(min(ts), '{_TS_FMT_DUCK}') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '{_TS_FMT_DUCK}') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sess
GROUP BY user_id, session_id
"""


# --- interval overlap join (grid-bucketed) ----------------------------------

OVERLAP_GRID_US = 300_000_000     # 5-minute grid cells
CLICK_SPAN_US = 600_000_000       # click activity interval: 10 min
ERROR_SPAN_US = 120_000_000       # error/outage interval: 2 min
ERROR_USER_MOD = 29               # rare-outage filter keeps |B| small


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key — the join type Spark
    lacks natively (an overlap predicate alone plans as a nested-loop
    cross product). Pairs every click activity interval [ts, ts+10min]
    with every overlapping outage interval [ts, ts+2min] (errors from
    a sparse user set), closed-interval semantics.

    Scale shape: GRID BUCKETING. Each interval explodes to the
    5-minute grid cells it touches (≤ span/grid + 1 rows — a bounded,
    tunable expansion), the join runs as a plain shuffle hash join on
    the cell key, the overlap predicate verifies exactly, and DISTINCT
    collapses pairs found in multiple shared cells. At 100 TB: no
    broadcast requirement on either side, shuffle volume is
    (rows x expansion), hot cells (time-of-day skew) are ordinary
    skewed join keys for AQE. The naive theta join the oracle runs is
    O(|A| x |B|) and exists only to certify this plan.

    Arithmetic in epoch-micros bigints end-to-end — exact in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"),
        us.alias("a_s"),
        (us + F.lit(CLICK_SPAN_US)).alias("a_e"),
    )
    b = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("user_id") % ERROR_USER_MOD == 0)
    ).select(
        F.col("event_id").alias("b_id"),
        us.alias("b_s"),
        (us + F.lit(ERROR_SPAN_US)).alias("b_e"),
    )

    def cells(lo: str, hi: str) -> F.Column:
        return F.explode(
            F.sequence(
                F.expr(f"{lo} div {OVERLAP_GRID_US}"),
                F.expr(f"{hi} div {OVERLAP_GRID_US}"),
            )
        )

    ag = a.withColumn("cell", cells("a_s", "a_e"))
    bg = b.withColumn("cell", cells("b_s", "b_e"))
    return (
        ag.join(bg, "cell")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select(
            "a_id",
            "b_id",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_us"),
        )
        .distinct()
    )


INTERVAL_OVERLAP_SQL = f"""
WITH a AS (
  SELECT event_id AS a_id, epoch_us(ts) AS a_s,
         epoch_us(ts) + {CLICK_SPAN_US} AS a_e
  FROM events WHERE event_type = 'click'
), b AS (
  SELECT event_id AS b_id, epoch_us(ts) AS b_s,
         epoch_us(ts) + {ERROR_SPAN_US} AS b_e
  FROM events WHERE event_type = 'error' AND user_id % {ERROR_USER_MOD} = 0
)
SELECT a_id, b_id,
       least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-funnel analysis (view → click → purchase): a user
    advances a stage only with an event AT OR AFTER their previous
    stage's first event — the standard product-analytics funnel, built
    as chained filtered-min aggregations (each stage is one
    partial+final min+count pass joined to the previous stage's
    per-user timestamps; no window over raw events, no self-join
    explosion). At 100 TB each stage shuffles user-cardinality rows,
    not event rows.

    Output: (stage, step, n_users, pct_of_entry)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        v.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("stage"), F.lit("view").alias("step"), "n_users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("stage"), F.lit("click").alias("step"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("stage"), F.lit("purchase").alias("step"), "n_users"
            )
        )
    )
    entry = v.agg(F.count(F.lit(1)).alias("entry_n"))
    return stages.crossJoin(F.broadcast(entry)).select(
        "stage",
        "step",
        "n_users",
        F.round(F.col("n_users") / F.col("entry_n"), 6).alias("pct_of_entry"),
    )


FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id),
s AS (
  SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM v
  UNION ALL SELECT 2, 'click', count(*) FROM c
  UNION ALL SELECT 3, 'purchase', count(*) FROM p
)
SELECT stage, step, n_users,
       round(n_users / (SELECT n_users FROM s WHERE stage = 1), 6) AS pct_of_entry
FROM s
"""


RETENTION_MAX_OFFSET = 7  # day-offsets reported; bounds the matrix


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen DATE, and
    for each day offset 0..RETENTION_MAX_OFFSET, how many of that
    cohort were active that day. Two user-cardinality aggregates and
    one distinct — every shuffle is ∝ users×active-days, never raw
    events (the per-day distinct collapses map-side first).

    Output: (cohort, day_offset, n_active)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"), "day_offset"
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


RETENTION_SQL = f"""
WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY user_id)
SELECT strftime(first.cohort, '%Y-%m-%d') AS cohort,
       date_diff('day', first.cohort, ev.d) AS day_offset,
       count(*) AS n_active
FROM ev JOIN first USING (user_id)
WHERE date_diff('day', first.cohort, ev.d) <= {RETENTION_MAX_OFFSET}
GROUP BY 1, 2
"""


def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join AGAIN, through the cogrouped-pandas API surface
    (§2.11): clicks and purchases cogrouped per user, matched with
    pandas `merge_asof` inside an Arrow-batched kernel. Same output
    and SAME DuckDB ASOF oracle as asof_join_purchase — two
    independent engines' worth of implementations pinned to one
    result, and the demonstration that `cogroup().applyInPandas`
    (Spark's two-sided UDF shape) composes into the operator set.

    Scale: both sides shuffle once on the cogroup key; the kernel sees
    one BUCKET of users per call (pmod(user_id, n_buckets)) and runs
    ONE grouped `merge_asof(..., by="user_id")` over the whole batch —
    per-user semantics, batch-sized Python overhead. Cogrouping on the
    raw user_id called the kernel once per user (1,500 calls at sf0.1;
    at corpus scale, millions) and per-call overhead dominated the
    slot 10:1 (guide §4: amortize the Python boundary over whole
    batches). The window composition (asof_join_purchase) is the plan
    to prefer — no Python in the hot path — but cogroup is the escape
    hatch for match logic SQL cannot express; this query proves the
    seam with logic SQL CAN check."""
    import pandas as pd  # noqa: F811

    ev = _t(spark, sf_dir, "events")
    # bucket count scales with the session's parallelism; the OUTPUT is
    # bucket-count-independent (matching is per-user inside the kernel),
    # pinned by the shuffle-partitions determinism sweep.
    n_buckets = max(128, spark.sparkContext.defaultParallelism * 4)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.pmod("user_id", F.lit(n_buckets)).alias("bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("purchase_id"),
            F.round(F.max("value"), 2).alias("purchase_value"),
        )
        .withColumn("bucket", F.pmod("user_id", F.lit(n_buckets)))
    )

    fmt = "%Y-%m-%d %H:%M:%S.%f"

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                columns=[
                    "click_id", "user_id", "click_ts",
                    "purchase_id", "purchase_ts", "purchase_value",
                ]
            )
        # merge_asof(by=) requires the ON key globally sorted on both
        # sides; matching is still per-user, identical to the per-user
        # cogroup it replaces (right is unique per (user_id, ts)).
        left = left.sort_values("ts", kind="mergesort")
        if not len(right):
            # explicit empty-right guard (ADVICE r11): a bucket with
            # clicks but zero purchases emits the clicks with null
            # purchase columns, mirroring the empty-left guard, rather
            # than relying on merge_asof(by=) accepting an empty right
            # frame on whatever pandas version is pinned
            m = left.copy()
            m["click_ts"] = m["ts"].dt.strftime(fmt)
            m["purchase_id"] = pd.Series(pd.NA, index=m.index, dtype="Int64")
            m["purchase_ts"] = pd.Series(None, index=m.index, dtype="object")
            m["purchase_value"] = pd.Series(
                float("nan"), index=m.index, dtype="float64"
            )
            return m[
                ["click_id", "user_id", "click_ts",
                 "purchase_id", "purchase_ts", "purchase_value"]
            ]
        right = (
            right.sort_values("ts", kind="mergesort")
            .rename(columns={"ts": "p_ts"})
            .drop(columns=["bucket"])
        )
        m = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="p_ts",
            by="user_id",
            direction="backward",
        )
        m["click_ts"] = m["ts"].dt.strftime(fmt)
        m["purchase_ts"] = m["p_ts"].dt.strftime(fmt)
        m["purchase_id"] = m["purchase_id"].astype("Int64")
        return m[
            ["click_id", "user_id", "click_ts",
             "purchase_id", "purchase_ts", "purchase_value"]
        ]

    return (
        clicks.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(
            merge,
            "click_id bigint, user_id bigint, click_ts string, "
            "purchase_id bigint, purchase_ts string, purchase_value double",
        )
    )


def window_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-rank family in one query: per-nation
    customer spend quartiles (`ntile`), `percent_rank`, and
    `cume_dist`. Partitioned by nation — never a global window — and
    ordered with the unique custkey tiebreak, so every rank value is a
    deterministic rational both engines compute identically.

    Rounding: Spark's round(x, 6) rounds the double's SHORTEST-DECIMAL
    string (BigDecimal.valueOf — double(333/640) prints "0.5203125",
    HALF_UP → .520313) while DuckDB rounds the scaled PRODUCT
    (0.5203125·1e6 = 520312.4999… → .520312), so rank-shaped rationals
    diverge (found by the sf0.1 sweep). The snap
    cast(round(x*1e6) as bigint)/1e6 forces BOTH engines down the
    identical scaled-product path; contract pinned in
    tests/test_rounding_contract.py.

    Output: (c_custkey, c_nationkey, spend, quartile, pr, cd)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    w = W.partitionBy("c_nationkey").orderBy(F.desc("spend"), "c_custkey")
    snap = lambda c: (  # noqa: E731
        F.expr(f"cast(round(({c}) * 1e6) as bigint) / 1e6")
    )
    return spend.select(
        "c_custkey",
        "c_nationkey",
        "spend",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        snap("percent_rank() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, c_custkey)").alias("pr"),
        snap("cume_dist() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, c_custkey)").alias("cd"),
    )


WINDOW_NTILE_SQL = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_nationkey, spend,
       ntile(4) OVER w AS quartile,
       CAST(round(percent_rank() OVER w * 1e6) AS BIGINT) / 1e6 AS pr,
       CAST(round(cume_dist() OVER w * 1e6) AS BIGINT) / 1e6 AS cd
FROM spend JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend DESC, c_custkey)
"""


def feature_store_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time join: for every label event
    (purchase), the freshest value of THREE feature streams as of that
    moment — last click value, last view value, and seconds since the
    last error. The training-set materialization every feature store
    (Feast/Tecton-style) performs, with the leakage guarantee: no
    feature may come from after the label timestamp.

    Spark-first shape: where the naive build runs K as-of joins (K
    shuffles of the spine), ALL feature streams union into ONE stream
    tagged by kind, and a single per-user ordered window carries each
    feature forward (`last(..., ignorenulls)` per stream) — one
    shuffle + one sort TOTAL, regardless of how many features ride
    along. Feature rows order before the spine at equal ts, so
    at-or-before is inclusive. Each stream is first deduped to one row
    per (user, ts) making every tie-break engine-independent. The
    DuckDB oracle is the contrast: three native ASOF JOINs.

    Output: (purchase_id, user_id, ts, last_click_value,
    last_view_value, secs_since_error)."""
    ev = _t(spark, sf_dir, "events")

    def stream(kind: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy("user_id", "ts")
            .agg(F.round(F.max("value"), 2).alias("v"))
        )

    spine = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )

    null_d = F.lit(None).cast("double")
    null_t = F.lit(None).cast("timestamp")
    null_id = F.lit(None).cast("bigint")

    def feature_row(df: DataFrame, click_v, view_v, err_ts) -> DataFrame:
        return df.select(
            "user_id",
            "ts",
            null_id.alias("purchase_id"),
            F.lit(0).alias("kind"),
            click_v.alias("click_v"),
            view_v.alias("view_v"),
            err_ts.alias("err_ts"),
        )

    clicks = feature_row(stream("click"), F.col("v"), null_d, null_t)
    views = feature_row(stream("view"), null_d, F.col("v"), null_t)
    errors = feature_row(stream("error"), null_d, null_d, F.col("ts"))
    spine_t = spine.select(
        "user_id",
        "ts",
        "purchase_id",
        F.lit(1).alias("kind"),
        null_d.alias("click_v"),
        null_d.alias("view_v"),
        null_t.alias("err_ts"),
    )
    unioned = clicks.unionByName(views).unionByName(errors).unionByName(spine_t)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        unioned.withColumn("lc", F.last("click_v", ignorenulls=True).over(w))
        .withColumn("lv", F.last("view_v", ignorenulls=True).over(w))
        .withColumn("le", F.last("err_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
    )
    return carried.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts"),
        F.col("lc").alias("last_click_value"),
        F.col("lv").alias("last_view_value"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("le")))
            / F.lit(1000000.0)
        ).alias("secs_since_error"),
    )


FEATURE_PIT_SQL = f"""
WITH clicks AS (
  SELECT user_id, ts, round(max(value), 2) AS v FROM events
  WHERE event_type = 'click' GROUP BY user_id, ts
), views AS (
  SELECT user_id, ts, round(max(value), 2) AS v FROM events
  WHERE event_type = 'view' GROUP BY user_id, ts
), errors AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
  GROUP BY user_id, ts
), spine AS (
  SELECT user_id, ts, max(event_id) AS purchase_id FROM events
  WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT s.purchase_id, s.user_id, strftime(s.ts, '{{fmt}}') AS ts,
       c.v AS last_click_value,
       v.v AS last_view_value,
       (epoch_us(s.ts) - epoch_us(e.ts)) / 1000000.0 AS secs_since_error
FROM spine s
ASOF LEFT JOIN clicks c ON s.user_id = c.user_id AND c.ts <= s.ts
ASOF LEFT JOIN views v ON s.user_id = v.user_id AND v.ts <= s.ts
ASOF LEFT JOIN errors e ON s.user_id = e.user_id AND e.ts <= s.ts
""".replace("{fmt}", _TS_FMT_DUCK)


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) event-time windows: 1-hour windows every
    30 minutes via `F.window(ts, '1 hour', '30 minutes')` — each event
    lands in exactly length/slide = 2 windows. The tumbling twin is
    hourly_event_rollup; sliding is the shape alert pipelines use
    (rate over the last hour, refreshed every half hour). Spark
    implements it as a 2-row generate + partial+final agg — shuffle ∝
    windows, not events². The oracle expands each event to its two
    slide-aligned starts explicitly.

    Output: (window_start, event_type, n, sum_value)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


SLIDING_WINDOW_SQL = """
WITH g AS (
  SELECT event_type, value,
         time_bucket(INTERVAL 30 MINUTE, ts) AS b
  FROM events
),
expanded AS (
  SELECT event_type, value,
         unnest([b - INTERVAL 30 MINUTE, b]) AS ws
  FROM g
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM expanded GROUP BY 1, 2
"""


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of `value` (the TimescaleDB
    `time_weight('LOCF')` hyperfunction shape): each observation holds
    until the next one, so it is weighted by its holding duration in
    epoch-micros — a plain mean over irregular samples over-weights
    bursts. The last observation per user has no successor and carries
    zero weight (pure LOCF-until-next semantics; both engines agree).

    One window pass (lead over the user partition) then one keyed
    aggregation — single hash shuffle on user_id, partial aggregation
    map-side; the integer micros weights keep the oracle exact.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    wt = F.lead(us).over(w) - us
    return (
        ev.select("user_id", "value", wt.alias("wt"))
        .filter(F.col("wt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("wt").alias("held_micros"),
            F.round(F.sum(F.col("value") * F.col("wt")) / F.sum("wt"), 6).alias("twa"),
        )
        .filter(F.col("held_micros") > 0)
    )


TIME_WEIGHTED_SQL = """
WITH weighted AS (
  SELECT user_id, value,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS wt
  FROM events
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(wt) AS BIGINT) AS held_micros,
       round(sum(value * wt) / sum(wt), 6) AS twa
FROM weighted
WHERE wt IS NOT NULL
GROUP BY user_id
HAVING sum(wt) > 0
"""


QUERIES = {
    "window_topk_per_customer": window_topk_per_customer,
    "window_range_10min": window_range_10min,
    "window_first_last": window_first_last,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "sessionize": sessionize,
    "json_props_agg": json_props_agg,
    "variant_typed_extract": variant_typed_extract,
    "hourly_event_rollup": hourly_event_rollup,
    "asof_join_purchase": asof_join_purchase,
    "scd2_current_snapshot": scd2_current_snapshot,
    "gap_fill_hourly": gap_fill_hourly,
    "interval_overlap_join": interval_overlap_join,
    "session_window_native": session_window_native,
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "sliding_window_counts": sliding_window_counts,
    "feature_store_pit": feature_store_pit,
    "window_ntile_ranks": window_ntile_ranks,
    "asof_join_cogroup": asof_join_cogroup,
    "time_weighted_avg": time_weighted_avg,
}

ORACLES = {
    "window_topk_per_customer": WINDOW_TOPK_SQL,
    "window_range_10min": WINDOW_RANGE_SQL,
    "window_first_last": WINDOW_FIRST_LAST_SQL,
    "window_running_sum": WINDOW_RUNNING_SQL,
    "window_lag_delta": WINDOW_LAG_SQL,
    "sessionize": SESSIONIZE_SQL,
    "json_props_agg": JSON_PROPS_SQL,
    "variant_typed_extract": VARIANT_SQL,
    "hourly_event_rollup": HOURLY_SQL,
    "asof_join_purchase": ASOF_SQL,
    "scd2_current_snapshot": SCD2_SQL,
    "gap_fill_hourly": GAP_FILL_SQL,
    "interval_overlap_join": INTERVAL_OVERLAP_SQL,
    "session_window_native": SESSION_WINDOW_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "retention_cohorts": RETENTION_SQL,
    "sliding_window_counts": SLIDING_WINDOW_SQL,
    "feature_store_pit": FEATURE_PIT_SQL,
    "window_ntile_ranks": WINDOW_NTILE_SQL,
    "asof_join_cogroup": ASOF_SQL,
    "time_weighted_avg": TIME_WEIGHTED_SQL,
}
