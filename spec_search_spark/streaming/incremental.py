"""Structured Streaming operators (SURVEY.md §2.10).

The reference's vestigial streaming surface is a commented-out
FastAPI webhook (`/root/reference/app.py:252-259` →
`indexer.py:59-78`) that would have indexed files incrementally.
Spark-first equivalents:

- :func:`hourly_stream_counts` — the streaming twin of
  operators.windows.hourly_event_rollup: readStream over the events
  parquet → event-time tumbling aggregation → memory sink. In tests
  it is driven to completion synchronously and must equal the batch
  result.
- :func:`incremental_index` — foreachBatch running the V1 index
  pipeline per micro-batch (the webhook's per-file indexing, but
  batched and idempotent by composite id).

Scale: on a cluster the source would be Kafka/files-on-arrival; the
aggregation state is bounded by the watermark; foreachBatch writes are
idempotent upserts keyed on the composite id so replays are safe.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spec_search_spark.session import local_df, tune


def _drained(spark: SparkSession, name: str, ckpt: str) -> DataFrame:
    """Read a drained memory sink ONCE, pin its (bounded) rows to
    executor block storage, and free the sink. Every twin otherwise
    leaves behind a driver-heap-resident memory-sink table plus an
    on-disk checkpoint for the life of the session; across a 60+-drain
    bench session those accumulate into GC pressure that reads as
    drain-time noise (BENCH_STREAM_r06's stream_page_hinkley 8.2s
    outlier — its state is one row; the cost was session aging, not
    the plan: an isolated drain is ~2s). localCheckpoint is eager, so
    the copy happens NOW and the temp view + checkpoint dir can go."""
    out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, schema sniffed from a batch
    scan so both testdata generations load (see catalog.load_table:
    nanos-as-long needs a `ts div 1000` truncation; native
    TIMESTAMP(MICROS) needs none)."""
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    raw = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = static_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(ts_type, T.TimestampType):
        # NTZ generation: normalize to LTZ under the UTC session tz so
        # watermarks/windows match the batch catalog (catalog.load_table).
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def hourly_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time aggregation, driven to completion
    against the static parquet (memory sink, complete mode)."""
    name = f"hourly_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt)


def stream_hourly_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() adapter: the streaming aggregation driven to
    completion; equals the batch hourly rollup (same oracle)."""
    return hourly_stream_counts(spark, sf_dir)


# identical result set to operators.windows.hourly_event_rollup — the
# tumbling window start IS date_trunc('hour') for aligned 1-hour windows.
STREAM_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""

def stream_dedup_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    dropDuplicatesWithinWatermark on (user_id, event_type) — the
    streaming twin of the batch dedup north star. The watermark lets
    the state store evict keys older than the lateness bound, so state
    is O(keys-per-watermark-window), not O(all keys ever) — the only
    shape that survives an unbounded 100 TB/day stream. Append mode:
    each first-seen key is emitted exactly once; the result SET equals
    batch DISTINCT regardless of micro-batch boundaries (first-seen
    order is nondeterministic, so only key columns are emitted)."""
    name = f"dedup_stream_{uuid.uuid4().hex[:8]}"
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt)


STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""

def stream_sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows: session_window(ts, 30 min)
    merges events whose gaps stay UNDER the timeout into one growing
    window, state evicted by the watermark — the streaming twin of the
    batch lag+cumsum sessionizer (operators.windows.sessionize). Note
    the boundary difference, pinned by the oracle: session_window
    SPLITS at gap >= 30 min (window end is exclusive), the batch
    idiom at gap > 30 min."""
    name = f"sess_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt)


# gap >= 30 min splits (session_window's exclusive end), vs the batch
# sessionizer's strict >; session_start is the first event's ts.
STREAM_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30*60*1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start, user_id,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS session_value
FROM sess GROUP BY user_id, sid
"""

def stream_stream_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with a time-range condition:
    click→purchase attribution within 10 minutes per user. Both sides
    carry watermarks so the join state evicts rows outside the
    attribution window — the bounded-state shape; without the time
    bound the state would grow with the whole stream. Inner-join
    append emission is match-driven, so the result SET equals the
    batch join regardless of micro-batching."""
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purch_ts"),
            F.col("value").alias("purch_value"),
        )
        .withWatermark("purch_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purch_ts") >= F.col("click_ts"))
        & (F.col("purch_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purch_ts") - F.unix_micros("click_ts")).alias("gap_us"),
        F.round("purch_value", 2).alias("purch_value"),
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    # No-data micro-batches OFF for THIS query only (restored below):
    # an INNER stream-stream join emits match-driven during data
    # batches — the trailing no-data batch exists to evict state and
    # emit outer-side nulls, neither of which produces rows here, yet
    # it re-runs the full 2-sided state-store commit cycle (measured:
    # ~2.5s of the r7 7.3s drain outlier; result set identical with a
    # single batch). Aggregation twins KEEP the default — append-mode
    # aggregations need no-data batches to finalize windows.
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    return _drained(spark, name, ckpt)


STREAM_STREAM_JOIN_SQL = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us,
       round(p.value, 2) AS purch_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
"""

def stream_static_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined per
    micro-batch against the STATIC customer dimension (user_id →
    c_custkey), aggregated to spend per (market segment, event type).
    Structured Streaming plans the static side as an ordinary batch
    relation inside every micro-batch — small dims broadcast, so the
    stream never shuffles for the join; only the aggregation keeps
    state, bounded by the segment×type key space. This is the standard
    Kafka-enrichment topology at 100 TB/day: static side refreshed by
    snapshot, stream side never blocked.

    Output: (c_mktsegment, event_type, n, sum_value)."""
    from spec_search_spark.catalog import load_table

    name = f"enrich_stream_{uuid.uuid4().hex[:8]}"
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .join(F.broadcast(customer), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt)


STREAM_STATIC_ENRICH_SQL = """
SELECT c_mktsegment, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def stream_sliding_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of windows.sliding_window_counts: overlapping
    1-hour windows sliding every 30 minutes over event time, state
    evicted by the watermark. Each event updates exactly 2 window
    states; the state store holds only windows newer than the
    watermark — the alerting topology (rate over the last hour,
    refreshed every half hour) that must survive an unbounded stream.

    Output: (window_start, event_type, n, sum_value)."""
    name = f"sliding_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
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
    ckpt = tempfile.mkdtemp(prefix="ckpt_slide_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt)


# identical result set to the batch sliding window — same oracle shape
STREAM_SLIDING_SQL = """
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


def stream_heavy_users_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch: heavy-hitter USERS over the event
    stream, with the sketch itself as the ONLY streaming state. Each
    event explodes into D (d, bucket) increments (integer hash rows,
    same family as `lm_quality.heavy_hitters_cms`) and a streaming
    groupBy maintains the D×W bucket-count table — O(96 rows) of state
    regardless of stream volume, the textbook reason count-min is the
    streaming-native frequency sketch (a per-user count table would
    grow with the key space and never evict).

    After the stream drains, the estimate per user is the batch
    min-over-rows probe of the final bucket table, verified one-sided
    against exact batch counts — identical output to running the
    sketch in batch, which is what the oracle does.

    Output: (user_id, n_exact, n_est, overcount) for users with
    estimated count ≥ total/HH_DENOM."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.lm_quality import CMS_ROWS, CMS_W, HH_DENOM
    from spec_search_spark.functions.text import FP_MOD

    name = f"cms_stream_{uuid.uuid4().hex[:8]}"
    incs = _events_stream(spark, sf_dir).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (((F.col("user_id") * a + b) % FP_MOD) % CMS_W).alias(
                            "bucket"
                        ),
                    )
                    for d, a, b in CMS_ROWS
                ]
            )
        ).alias("r")
    )
    agg = incs.groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("bc")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_cms_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    buckets = _drained(spark, name, ckpt)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    rows = None
    for d, a, b in CMS_ROWS:
        proj = exact.select(
            "user_id",
            "n_exact",
            F.lit(d).alias("d"),
            (((F.col("user_id") * a + b) % FP_MOD) % CMS_W).alias("bucket"),
        )
        rows = proj if rows is None else rows.unionByName(proj)
    est = (
        rows.join(buckets, ["d", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("bc").alias("n_est"))
    )
    total = exact.agg(F.sum("n_exact").alias("n_total"))
    return (
        est.crossJoin(F.broadcast(total))  # one row
        .filter(F.col("n_est") * HH_DENOM >= F.col("n_total"))
        .select(
            "user_id",
            "n_exact",
            "n_est",
            (F.col("n_est") - F.col("n_exact")).alias("overcount"),
        )
    )


def _stream_cms_sql() -> str:
    from spec_search_spark.functions.text import FP_MOD
    from spec_search_spark.operators.lm_quality import CMS_ROWS, CMS_W, HH_DENOM

    values = ", ".join(f"({d}, {a}, {b})" for d, a, b in CMS_ROWS)
    return f"""
WITH exact AS (
  SELECT user_id, count(*) AS n_exact FROM events GROUP BY user_id
), proj AS (
  SELECT r.d, ((e.user_id * r.a + r.b) % {FP_MOD}) % {CMS_W} AS bucket,
         e.user_id, e.n_exact
  FROM exact e CROSS JOIN (VALUES {values}) r(d, a, b)
), buckets AS (
  SELECT d, bucket, CAST(sum(n_exact) AS BIGINT) AS bc FROM proj GROUP BY d, bucket
), est AS (
  SELECT p.user_id, p.n_exact, min(b.bc) AS n_est
  FROM proj p JOIN buckets b ON p.d = b.d AND p.bucket = b.bucket
  GROUP BY p.user_id, p.n_exact
), total AS (
  SELECT CAST(sum(n_exact) AS BIGINT) AS n_total FROM exact
)
SELECT user_id, n_exact, n_est, n_est - n_exact AS overcount
FROM est CROSS JOIN total
WHERE n_est * {HH_DENOM} >= n_total
"""


STREAM_CMS_SQL = _stream_cms_sql()


def stream_psi_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Population Stability Index: the train/serve drift
    monitor run ON the stream. Bin edges and the half-window midpoint
    are fixed up front from the reference snapshot (a 4-scalar bounded
    collect — the deployment analog of shipping training-time bin
    edges into the monitor's config; ML drift monitors never re-derive
    bins from serving traffic), and the ONLY streaming state is the
    per-(half, bin) count table — ≤ 2×PSI_BINS rows at any stream
    volume, the same bounded-state argument as `stream_heavy_users`.
    After the drain, the shared nano-unit PSI fold
    (`drift.psi_from_per_bin`) scores the final table.

    Identical output to the batch `psi_value_drift` (same oracle)."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.drift import PSI_BINS, psi_from_per_bin

    name = f"psi_stream_{uuid.uuid4().hex[:8]}"
    b = (
        load_table(spark, sf_dir, "events")
        .groupBy()
        .agg(
            F.unix_micros(F.min("ts")).alias("t0us"),
            F.unix_micros(F.max("ts")).alias("t1us"),
            F.expr("cast(round(min(value) * 100) as bigint)").alias("vmin"),
            F.expr("cast(round(max(value) * 100) as bigint)").alias("vmax"),
        )
        .collect()[0]
    )
    mid = (b["t0us"] + b["t1us"]) / 2  # double, same IEEE division as batch
    binned = _events_stream(spark, sf_dir).select(
        (F.unix_micros("ts") <= F.lit(mid)).alias("first_half"),
        F.least(
            F.lit(PSI_BINS - 1),
            F.expr(
                f"cast(((cast(round(value * 100) as bigint) - {b['vmin']}) * {PSI_BINS})"
                f" div ({b['vmax']} - {b['vmin']} + 1) as int)"
            ),
        ).alias("bin"),
    )
    agg = binned.groupBy("first_half", "bin").agg(F.count(F.lit(1)).alias("n"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_psi_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    per_bin = (
        _drained(spark, name, ckpt)
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("first_half"), F.col("n")).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("first_half"), 0).otherwise(F.col("n"))).alias("c2"),
        )
    )
    return psi_from_per_bin(per_bin)


def stream_seasonal_anomaly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `behavior.seasonal_anomaly_report`: the
    (day-of-week × hour) baseline (mean/σ from exact integer-cents
    moments) is fixed up front from the reference snapshot — the
    training-time artifact, exactly like `stream_psi_drift`'s bin
    edges — and the stream carries ONLY the per-bucket
    [n, n_anomalies] counts as state: ≤ 168 rows at any stream volume.
    Same output and oracle as the batch operator."""
    from spec_search_spark.operators.behavior import SEASONAL_SIGMA, seasonal_baseline

    name = f"seasonal_stream_{uuid.uuid4().hex[:8]}"
    base = seasonal_baseline(spark, sf_dir)  # bounded: ≤168 rows
    ev = _events_stream(spark, sf_dir).select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    flagged = ev.join(F.broadcast(base), ["dow", "hod"]).selectExpr(
        "dow",
        "hod",
        f"CASE WHEN abs(cents / 100.0 - mu) > {SEASONAL_SIGMA} * sigma"
        " THEN 1 ELSE 0 END AS is_anom",
    )
    agg = flagged.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.sum("is_anom").alias("n_anom"),
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_seasonal_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = _drained(spark, name, ckpt)
    return counts.join(F.broadcast(base), ["dow", "hod"]).selectExpr(
        "dow",
        "hod",
        "n",
        "cast(round(mu * 1e4) as bigint) / 1e4 AS mean_value",
        "cast(round(sigma * 1e4) as bigint) / 1e4 AS sigma_value",
        "cast(n_anom as bigint) AS n_anomalies",
    )


def stream_benford_digits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Benford first-digit monitor over `events.value`: the
    fabricated-feed screen run ON the stream. The ONLY streaming state
    is the per-digit count table — ≤ 9 rows at any stream volume (the
    same bounded-state argument as `stream_psi_drift`); after the
    drain, the shared chi-square fold (`drift.benford_from_per_digit`)
    scores the final table against log10(1+1/d)."""
    from spec_search_spark.operators.drift import benford_from_per_digit

    name = f"benford_stream_{uuid.uuid4().hex[:8]}"
    # Benford is defined on nonzero amounts: values rounding to 0 cents
    # have leading digit 0 (1/d blows up) — drop them in BOTH engines.
    digits = (
        _events_stream(spark, sf_dir)
        .filter(F.expr("cast(round(value * 100) as bigint) >= 1"))
        .select(
            F.expr(
                "cast(substring(cast(cast(round(value * 100) as bigint)"
                " as string), 1, 1) as int)"
            ).alias("d")
        )
    )
    agg = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_benford_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return benford_from_per_digit(_drained(spark, name, ckpt).select("d", "n"))


def stream_mad_outlier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming robust-outlier monitor over `events.value`: the
    median/MAD gate (batch: `rank_stats.mad_outlier_orders`) run ON the
    stream. The med/MAD/threshold artifact is fixed up front from the
    reference snapshot via the distributed rank walk (a 2-scalar
    bounded collect — the training-time robust baseline, exactly like
    `stream_psi_drift`'s bin edges), and the ONLY streaming state is
    the single global [n, n_outliers] aggregate row."""
    from spec_search_spark.operators.rank_stats import (
        MAD_K,
        _lower_median,
    )

    tune(spark)
    from spec_search_spark.catalog import load_table

    cents = load_table(spark, sf_dir, "events").select(
        F.expr("cast(round(value * 100) as bigint)").alias("v")
    )
    per_v = cents.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    med = _lower_median(per_v, "v").collect()[0]["med"]
    per_d = (
        cents.select(F.abs(F.col("v") - F.lit(int(med))).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mad = _lower_median(per_d, "v").collect()[0]["med"]
    thr = round(MAD_K * int(mad))

    name = f"mad_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .select(
            F.expr(
                f"abs(cast(round(value * 100) as bigint) - {int(med)})"
            ).alias("d")
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"case when d > {thr} then 1 else 0 end")).alias(
                "n_out"
            ),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_mad_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt).select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(int(med)).cast("bigint").alias("med_cents"),
        F.lit(int(mad)).cast("bigint").alias("mad_cents"),
        F.lit(thr).cast("bigint").alias("thr_cents"),
        F.col("n_out").cast("bigint").alias("n_outliers"),
        F.expr(
            "cast(round(n_out / cast(n as double) * 1e6) as bigint) / 1e6"
        ).alias("outlier_share_6"),
    )


def stream_hourly_acf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming lag-1/lag-24 autocorrelation monitor: the
    seasonality probe run ON the stream. The ONLY streaming state is
    the per-hour sum table — bounded by the observation window's hour
    count at any stream volume (the tumbling-aggregate state
    `stream_hourly_counts` already carries). After the drain, the
    gap-fill + exact mean-centered fold (`drift.acf_from_filled`)
    scores the final table; identical output and oracle as the batch
    `hourly_autocorrelation`."""
    from spec_search_spark.operators.drift import acf_from_filled

    name = f"acf_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_acf_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    per_h = _drained(spark, name, ckpt).select("h", "x")
    bounds = per_h.groupBy().agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    filled = grid.join(per_h, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    return acf_from_filled(filled)


def stream_cusum_changepoint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM level-shift monitor: the changepoint scan run
    ON the stream. Streaming state is the same bounded per-hour sum
    table as `stream_hourly_acf` (hour count fixes it, not stream
    volume); after the drain, the gap-fill + exact integer CUSUM fold
    (`drift.cusum_from_filled`) scores the final table — identical
    output and oracle as the batch `cusum_changepoint_hourly`."""
    from spec_search_spark.operators.drift import cusum_from_filled

    name = f"cusum_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_cusum_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    per_h = _drained(spark, name, ckpt).select("h", "x")
    bounds = per_h.groupBy().agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    filled = grid.join(per_h, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    return cusum_from_filled(filled)


def stream_sprt_decision_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming group-sequential SPRT: the hourly-look conversion
    monitor run ON the stream — exactly the deployment shape the batch
    `sprt_conversion_hourly` models (a decision is re-evaluated as
    each hour's batch lands). Streaming state is ONLY the bounded
    per-hour (trials, conversions) count table (hour count fixes it,
    not stream volume); after the drain, the shared pure-BIGINT LLR
    walk (`drift.sprt_from_hourly`) scores the final table — identical
    output and oracle as the batch op."""
    from spec_search_spark.operators.drift import sprt_from_hourly

    name = f"sprt_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_sprt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return sprt_from_hourly(_drained(spark, name, ckpt).select("h", "n", "k"))


def stream_seasonal_decompose_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming seasonal decomposition: the hour-of-day seasonal
    index recomputed ON the stream. Streaming state is the same
    bounded per-hour sum table as `stream_hourly_acf`/CUSUM (hour
    count fixes it, not stream volume); after the drain the gap-fill +
    exact integer contribution-explode fold
    (`drift.seasonal_from_filled`) scores the final table — identical
    output and oracle as the batch `seasonal_decompose_hourly`."""
    from spec_search_spark.operators.drift import seasonal_from_filled

    name = f"seasdec_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_seasdec_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    per_h = _drained(spark, name, ckpt).select("h", "x")
    bounds = per_h.groupBy().agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    filled = grid.join(per_h, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    return seasonal_from_filled(spark, filled)


def stream_page_hinkley_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Page-Hinkley alarm: the online mean-increase monitor
    run ON the stream — the deployment shape the detector was designed
    for. Stream state is the bounded per-hour sum table; after the
    drain the gap-fill + micro-snapped integer PH walk
    (`drift.ph_from_filled`) scores the final table — identical output
    and oracle as the batch `page_hinkley_hourly`."""
    from spec_search_spark.operators.drift import ph_from_filled

    name = f"ph_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x")
        )
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_ph_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    per_h = _drained(spark, name, ckpt).select("h", "x")
    bounds = per_h.groupBy().agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    filled = grid.join(per_h, "h", "left").select(
        "h", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    return ph_from_filled(filled)


def _stream_ph_sql() -> str:
    from spec_search_spark.operators.drift import PAGE_HINKLEY_SQL

    return PAGE_HINKLEY_SQL


def stream_embedding_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `drift.embedding_drift_monitor`: the
    per-dimension mean-shift + mean-cosine monitor computed ON the
    embeddings feed — the shape that watches an encoder refresh as
    vectors arrive instead of after a full re-scan. Streaming state is
    the shared `emb_drift_per_dim` integer-sum table: ≤ n_dims rows
    (the DIMENSIONALITY bounds it, never stream volume) of pure BIGINT
    sums, so the aggregation is order- and batch-boundary-independent.
    After the drain the shared scoring fold (`emb_drift_from_per_dim`)
    ranks the shifts — identical output and oracle as the batch
    monitor."""
    from spec_search_spark.operators.drift import (
        emb_drift_from_per_dim,
        emb_drift_per_dim,
    )

    tune(spark)
    name = f"embdrift_stream_{uuid.uuid4().hex[:8]}"
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).schema
    emb = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    per_dim = emb_drift_per_dim(emb)
    ckpt = tempfile.mkdtemp(prefix="ckpt_embdrift_")
    q = (
        per_dim.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return emb_drift_from_per_dim(
        _drained(spark, name, ckpt).select("dim", "sa", "na", "sb", "nb")
    )


def _stream_emb_drift_sql() -> str:
    from spec_search_spark.operators.drift import EMB_DRIFT_SQL

    return EMB_DRIFT_SQL


def stream_roc_auc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model-evaluation gate: exact tie-aware ROC-AUC of the
    batch-trained logistic quality model, scored over the documents
    feed — the deployment shape (train offline, watch the live AUC of
    the deployed artifact on arriving traffic). The β is the batch
    IRLS artifact injected as literals (a one-row bounded collect, the
    model file of a real deployment); scoring is the stateless shared
    feature projection (`ml._logreg_feats`) + the same probability
    expression text, and the ONLY streaming state is the
    (p6 → c1, c0) distinct-score count table — bounded by the ppm
    grid, never by stream volume (the same bounded-count-table
    argument as `stream_psi_drift`). After the drain the shared
    `ml.roc_auc_from_counts` fold (bucketed rank walk) scores the
    table — identical output and oracle as the batch
    `roc_auc_doc_model`."""
    from spec_search_spark.operators.ml import (
        _LR_P6,
        _logreg_feats,
        _trained_logreg,
        roc_auc_from_counts,
    )

    tune(spark)
    _, beta = _trained_logreg(spark, sf_dir)
    b = beta.collect()[0]  # one-row model artifact
    name = f"rocauc_stream_{uuid.uuid4().hex[:8]}"
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    docs = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    scored = (
        _logreg_feats(docs)
        .withColumn("b06", F.lit(int(b["b06"])).cast("bigint"))
        .withColumn("b16", F.lit(int(b["b16"])).cast("bigint"))
        .withColumn("b26", F.lit(int(b["b26"])).cast("bigint"))
        .selectExpr("y", f"{_LR_P6} AS p6")
    )
    per_v = scored.groupBy("p6").agg(
        F.sum("y").alias("c1"),
        F.sum(F.expr("1 - y")).alias("c0"),
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_rocauc_")
    q = (
        per_v.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return roc_auc_from_counts(
        _drained(spark, name, ckpt).select("p6", "c1", "c0")
    )


def _stream_roc_auc_sql() -> str:
    from spec_search_spark.operators.ml import _roc_auc_sql

    return _roc_auc_sql()


def stream_t_closeness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `pii.t_closeness_report`: the privacy audit
    run ON the customer ingest feed — the shape that watches a skewed
    batch of sign-ups push a QI group past the EMD threshold as rows
    arrive. Streaming state is the shared (QI, band) count-cell table:
    |QI space| × 3 rows at any stream volume (the bounded-count-table
    argument of `stream_psi_drift`). After the drain the shared
    integer-EMD fold (`t_closeness_from_cells`) scores the final
    table — identical output and oracle as the batch audit."""
    from spec_search_spark.operators.pii import (
        _BAL_IDX,
        t_closeness_from_cells,
    )

    tune(spark)
    name = f"tclose_stream_{uuid.uuid4().hex[:8]}"
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "customer.parquet")
    ).schema
    cust = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "customer.parquet")
        .parquet(sf_dir)
    )
    cells = (
        cust.selectExpr("c_nationkey", "c_mktsegment", f"{_BAL_IDX} AS idx")
        .groupBy("c_nationkey", "c_mktsegment", "idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_tclose_")
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return t_closeness_from_cells(
        _drained(spark, name, ckpt).select(
            "c_nationkey", "c_mktsegment", "idx", "n"
        )
    )


def _stream_tclose_sql() -> str:
    from spec_search_spark.operators.pii import T_CLOSENESS_SQL

    return T_CLOSENESS_SQL


def _stream_seasdec_sql() -> str:
    from spec_search_spark.operators.drift import SEASONAL_SQL

    return SEASONAL_SQL


def _stream_sprt_sql() -> str:
    from spec_search_spark.operators.drift import SPRT_SQL

    return SPRT_SQL


def _stream_acf_sql() -> str:
    from spec_search_spark.operators.drift import ACF_SQL

    return ACF_SQL


def _stream_cusum_sql() -> str:
    from spec_search_spark.operators.drift import CUSUM_SQL

    return CUSUM_SQL


def stream_burstiness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Fano-factor burstiness monitor: per event type, is
    arrival load Poisson-like or bursty — computed ON the stream.
    Streaming state is the bounded per-(type, hour) count table (the
    per-type refinement of the hourly-sum state the ACF/CUSUM twins
    carry); after the drain, the shared exact-moment fold
    (`behavior.burstiness_from_counts`) scores the final table —
    identical output and oracle as the batch `burstiness_by_type`."""
    from spec_search_spark.operators.behavior import burstiness_from_counts

    name = f"burst_stream_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_burst_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return burstiness_from_counts(_drained(spark, name, ckpt).select("event_type", "h", "c"))


def _stream_burstiness_sql() -> str:
    from spec_search_spark.operators.behavior import BURSTINESS_SQL

    return BURSTINESS_SQL


def _stream_mad_sql() -> str:
    # the batch MAD oracle retargeted at the stream's source column
    from spec_search_spark.operators.rank_stats import MAD_SQL

    return MAD_SQL.replace(
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders",
        "CAST(round(value * 100) AS BIGINT) AS v FROM events",
    )


def _stream_benford_sql() -> str:
    # the batch Benford oracle retargeted at the stream's source column
    from spec_search_spark.operators.drift import BENFORD_SQL

    return BENFORD_SQL.replace(
        "CAST(round(o_totalprice * 100) AS BIGINT)",
        "CAST(round(value * 100) AS BIGINT)",
    ).replace(
        "FROM orders GROUP BY 1",
        "FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 1 GROUP BY 1",
    )


def stream_quality_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quality-gate funnel over the documents feed: the
    ingest-time acceptance monitor (batch: `pipeline_ops.
    quality_funnel_report`). Every document is charged to its FIRST
    failing gate by the identical shared per-row cascade
    (`funnel_staged`), and the ONLY streaming state is the
    (source, stage) count table — ≤ sources × 6 rows at any stream
    volume, the same bounded-state argument as `stream_psi_drift`.
    After the drain, the shared presentation fold snaps the per-source
    shares; the oracle is the batch funnel's SQL verbatim."""
    from spec_search_spark.operators.pipeline_ops import (
        funnel_report_from_counts,
        funnel_staged,
    )

    tune(spark)
    name = f"funnel_stream_{uuid.uuid4().hex[:8]}"
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    docs = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    per = funnel_staged(docs).groupBy("source", "stage").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_funnel_")
    q = (
        per.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return funnel_report_from_counts(
        _drained(spark, name, ckpt).select("source", "stage", "n_docs")
    )


def stream_merge_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply — the lakehouse MERGE run per micro-batch
    (batch sibling: `maintenance.merge_upsert_cdc`): the change feed
    arrives as a file stream (two files, maxFilesPerTrigger=1 so two
    genuine micro-batches), and foreachBatch merges each batch into a
    VERSIONED snapshot (read snapshot_v{i}, full-outer merge, write
    snapshot_v{i+1} — never read-and-overwrite the same files, which
    is the atomicity rule every table format enforces). Delta-batch
    keys are disjoint (split by key parity), so sequential application
    equals the single batch MERGE and the batch oracle can price the
    final snapshot exactly.

    Output: one row (n_rows, key_sum, cents_total) of the final
    snapshot — identical to applying the whole CDC feed at once."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.maintenance import (
        MERGE_BASE_SKIP_MOD,
        MERGE_BASE_SKIP_REM,
        MERGE_DELETE_MOD,
        MERGE_DELTA_MOD,
        MERGE_PRICE_BUMP_CENTS,
    )

    tune(spark)
    root = tempfile.mkdtemp(prefix="stream_merge_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    base = orders.filter(
        F.expr(f"o_orderkey % {MERGE_BASE_SKIP_MOD} != {MERGE_BASE_SKIP_REM}")
    )
    snap0 = os.path.join(root, "snapshot_v0")
    base.write.parquet(snap0)
    delta_dir = os.path.join(root, "delta")
    delta = orders.filter(
        F.expr(f"o_orderkey % {MERGE_DELTA_MOD} = 0")
    ).selectExpr(
        "o_orderkey",
        f"CASE WHEN o_orderkey % {MERGE_DELETE_MOD} = 0 THEN 'D' ELSE 'U' END"
        " AS op",
        f"cents + {MERGE_PRICE_BUMP_CENTS} AS new_cents",
        "cast(o_orderkey % 2 as int) AS half",
    )
    # two files -> two micro-batches (disjoint keys by parity)
    delta.filter("half = 0").drop("half").coalesce(1).write.parquet(
        os.path.join(delta_dir, "h0")
    )
    delta.filter("half = 1").drop("half").coalesce(1).write.parquet(
        os.path.join(delta_dir, "h1")
    )
    schema = "o_orderkey bigint, op string, new_cents bigint"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(delta_dir)
    )
    state = {"version": 0}

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        cur = os.path.join(root, f"snapshot_v{state['version']}")
        nxt = os.path.join(root, f"snapshot_v{state['version'] + 1}")
        snap = spark.read.parquet(cur)
        merged = (
            snap.join(batch, "o_orderkey", "full_outer")
            .selectExpr(
                "o_orderkey",
                """CASE
                  WHEN op = 'D' THEN NULL
                  WHEN op = 'U' THEN new_cents
                  ELSE cents END AS cents""",
            )
            .filter(F.col("cents").isNotNull())
        )
        merged.write.parquet(nxt)
        state["version"] += 1

    ckpt = tempfile.mkdtemp(prefix="ckpt_merge_")
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = spark.read.parquet(
        os.path.join(root, f"snapshot_v{state['version']}")
    )
    return final.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum("cents").cast("bigint").alias("cents_total"),
    )


def _stream_merge_sql() -> str:
    from spec_search_spark.operators.maintenance import (
        MERGE_BASE_SKIP_MOD,
        MERGE_BASE_SKIP_REM,
        MERGE_DELETE_MOD,
        MERGE_DELTA_MOD,
        MERGE_PRICE_BUMP_CENTS,
    )

    return f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), base AS (
  SELECT * FROM o
  WHERE o_orderkey % {MERGE_BASE_SKIP_MOD} != {MERGE_BASE_SKIP_REM}
), delta AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {MERGE_DELETE_MOD} = 0 THEN 'D' ELSE 'U' END AS op,
         cents + {MERGE_PRICE_BUMP_CENTS} AS new_cents
  FROM o WHERE o_orderkey % {MERGE_DELTA_MOD} = 0
), merged AS (
  SELECT coalesce(b.o_orderkey, d.o_orderkey) AS o_orderkey,
         CASE WHEN d.op = 'D' THEN NULL
              WHEN d.op = 'U' THEN d.new_cents
              ELSE b.cents END AS cents
  FROM base b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
)
SELECT count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(cents) AS BIGINT) AS cents_total
FROM merged WHERE cents IS NOT NULL
"""


def stream_percolate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percolation — the alerting primitive ON the feed
    (batch sibling: `bm25.percolate_alerts`): stored queries are fixed
    up front from the reference snapshot (the training-time artifact,
    exactly like stream_psi's bin edges) and BROADCAST onto the
    document stream; each arriving doc matches queries row-locally
    (both terms in its own token array — no cross-row state), so the
    ONLY streaming state is the per-query match-count table, ≤ 10
    rows at any stream volume. Oracle = the batch percolator SQL."""
    from spec_search_spark.functions.text import tokens
    from spec_search_spark.operators.bm25 import PERC_VOCAB_TOP

    tune(spark)
    docs_static = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    postings = docs_static.select(
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    top = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(PERC_VOCAB_TOP)
        .select("term")
    )
    a, b = top.alias("a"), top.alias("b")
    queries = (
        a.crossJoin(b)
        .filter(F.col("a.term") < F.col("b.term"))
        .select(F.col("a.term").alias("t1"), F.col("b.term").alias("t2"))
    )
    qrows = queries.collect()  # ≤ C(top,2) rows — the stored alert set
    qdf = local_df(spark, [tuple(r) for r in qrows], "t1 string, t2 string")

    name = f"percolate_stream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(docs_static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    toks = F.array_distinct(tokens(F.col("text")))
    matched = stream.select(toks.alias("tk")).join(
        F.broadcast(qdf),
        F.array_contains(F.col("tk"), F.col("t1"))
        & F.array_contains(F.col("tk"), F.col("t2")),
    )
    agg = matched.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_docs"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_percolate_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return qdf.join(_drained(spark, name, ckpt), ["t1", "t2"], "left").select(
        "t1",
        "t2",
        F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
    )


def _import_percolate_sql() -> str:
    from spec_search_spark.operators.bm25 import PERCOLATE_SQL

    return PERCOLATE_SQL


def _import_funnel_sql() -> str:
    from spec_search_spark.operators.pipeline_ops import QUALITY_FUNNEL_SQL

    return QUALITY_FUNNEL_SQL


def _import_psi_sql() -> str:
    # same one-row result as the batch drift score: the stream twin's
    # oracle IS the batch oracle (stream_hourly_counts precedent)
    from spec_search_spark.operators.drift import PSI_SQL

    return PSI_SQL


def _import_seasonal_sql() -> str:
    from spec_search_spark.operators.behavior import SEASONAL_SQL

    return SEASONAL_SQL


def stream_winnowing_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming winnowing fingerprint inventory (batch sibling:
    `winnowing.winnowing_fingerprint_stats`, minus the cross-document
    distinct-hash column — a second chained aggregation streaming
    can't express in one query): each arriving document's fingerprint
    COUNT is computed ROW-LOCALLY with pure array expressions (k-gram
    poly-hash fold → packed (hash, pos) keys → window-min over array
    slices → distinct), so the only streaming state is the ≤|sources|
    per-source aggregate — contamination telemetry ON the ingest feed
    at any stream volume.

    Output: (source, n_docs, total_fps, avg_fps)."""
    from spec_search_spark.operators.winnowing import make_winnow_count_udf

    tune(spark)
    docs_static = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stream = (
        spark.readStream.schema(docs_static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    winnow_count = make_winnow_count_udf()
    per_doc = stream.select(
        "source", winnow_count(F.col("text")).alias("n_fp")
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_fp").alias("total_fps"),
        F.round(F.avg("n_fp"), 4).alias("avg_fps"),
    )
    name = f"winnow_stream_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_winnow_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt).orderBy("source")


def _stream_winnowing_sql() -> str:
    from spec_search_spark.operators.winnowing import _SEL_SQL

    # per_doc is built by LEFT JOINing documents to fps so a document
    # whose normalized text is shorter than K+W-1 chars (zero
    # fingerprints) still counts in n_docs/avg_fps with n_fp=0 — the
    # streaming side counts EVERY arriving doc (telemetry semantics),
    # unlike the batch sibling which inventories only fingerprinted
    # docs. Deriving per_doc from fps alone would silently diverge the
    # moment a short document enters the fixture.
    return f"""
WITH {_SEL_SQL},
per_doc AS (
  SELECT d.source, d.doc_id, count(f.doc_id) AS n_fp
  FROM documents d LEFT JOIN fps f
    ON d.doc_id = f.doc_id AND d.source = f.source
  GROUP BY d.source, d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_fp) AS BIGINT) AS total_fps,
       round(CAST(avg(n_fp) AS DOUBLE), 4) AS avg_fps
FROM per_doc
GROUP BY source
ORDER BY source
"""




def stream_url_canonical_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-level dedup on the ingest feed (batch sibling:
    `url_ops.url_canonicalize_dedup`): each arriving document's two
    synthetic URLs are canonicalized ROW-LOCALLY by the shared codegen
    chain, then streaming dropDuplicates on (source, canonical) feeds
    a per-source distinct count — the live "how much of the crawl is
    URL-duplicate" monitor. State is one row per distinct canonical
    URL; a production deployment bounds it with
    dropDuplicatesWithinWatermark on the arrival time (URL re-shares
    cluster in time), which changes the eviction policy, not the plan.

    Output: (source, n_canon_distinct) — the batch report's canonical
    column, same oracle fragment."""
    from spec_search_spark.operators.url_ops import canonical_url, urls_from_docs

    tune(spark)
    name = f"urldedup_stream_{uuid.uuid4().hex[:8]}"
    static_schema = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).schema
    docs = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    canon = urls_from_docs(docs).select(
        "source", canonical_url(F.col("url")).alias("canon")
    )
    agg = (
        canon.dropDuplicates(["source", "canon"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_canon_distinct"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_urldedup_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _drained(spark, name, ckpt).orderBy("source")


def _stream_url_dedup_sql() -> str:
    from spec_search_spark.operators.url_ops import _URLS_SQL, _canon_sql

    return f"""
WITH urls AS ({_URLS_SQL})
SELECT source,
       CAST(count(DISTINCT {_canon_sql('url')}) AS BIGINT) AS n_canon_distinct
FROM urls
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "stream_hourly_counts": stream_hourly_counts_query,
    "stream_dedup_pairs": stream_dedup_pairs_query,
    "stream_sessionize": stream_sessionize_query,
    "stream_stream_join": stream_stream_join_query,
    "stream_static_enrich": stream_static_enrich_query,
    "stream_sliding_counts": stream_sliding_counts_query,
    "stream_heavy_users": stream_heavy_users_query,
    "stream_psi_drift": stream_psi_drift_query,
    "stream_seasonal_anomaly": stream_seasonal_anomaly_query,
    "stream_benford_digits": stream_benford_digits_query,
    "stream_mad_outlier": stream_mad_outlier_query,
    "stream_hourly_acf": stream_hourly_acf_query,
    "stream_cusum_changepoint": stream_cusum_changepoint_query,
    "stream_sprt_decision": stream_sprt_decision_query,
    "stream_seasonal_decompose": stream_seasonal_decompose_query,
    "stream_page_hinkley": stream_page_hinkley_query,
    "stream_burstiness": stream_burstiness_query,
    "stream_quality_funnel": stream_quality_funnel_query,
    "stream_merge_upsert": stream_merge_upsert_query,
    "stream_percolate": stream_percolate_query,
    "stream_embedding_drift": stream_embedding_drift_query,
    "stream_roc_auc": stream_roc_auc_query,
    "stream_t_closeness": stream_t_closeness_query,
    "stream_winnowing_stats": stream_winnowing_stats_query,
    "stream_url_canonical_dedup": stream_url_canonical_dedup_query,
}
ORACLES = {
    "stream_hourly_counts": STREAM_HOURLY_SQL,
    "stream_dedup_pairs": STREAM_DEDUP_SQL,
    "stream_sessionize": STREAM_SESSIONIZE_SQL,
    "stream_stream_join": STREAM_STREAM_JOIN_SQL,
    "stream_static_enrich": STREAM_STATIC_ENRICH_SQL,
    "stream_sliding_counts": STREAM_SLIDING_SQL,
    "stream_heavy_users": STREAM_CMS_SQL,
    "stream_psi_drift": _import_psi_sql(),
    "stream_seasonal_anomaly": _import_seasonal_sql(),
    "stream_benford_digits": _stream_benford_sql(),
    "stream_mad_outlier": _stream_mad_sql(),
    "stream_hourly_acf": _stream_acf_sql(),
    "stream_cusum_changepoint": _stream_cusum_sql(),
    "stream_sprt_decision": _stream_sprt_sql(),
    "stream_seasonal_decompose": _stream_seasdec_sql(),
    "stream_page_hinkley": _stream_ph_sql(),
    "stream_burstiness": _stream_burstiness_sql(),
    "stream_quality_funnel": _import_funnel_sql(),
    "stream_merge_upsert": _stream_merge_sql(),
    "stream_percolate": _import_percolate_sql(),
    "stream_embedding_drift": _stream_emb_drift_sql(),
    "stream_roc_auc": _stream_roc_auc_sql(),
    "stream_t_closeness": _stream_tclose_sql(),
    "stream_winnowing_stats": _stream_winnowing_sql(),
    "stream_url_canonical_dedup": _stream_url_dedup_sql(),
}


def incremental_index(spark: SparkSession, docs_dir: str, out_dir: str | None = None) -> str:
    """foreachBatch incremental V1 index: each micro-batch of documents
    is chunked+embedded and upserted (dedup by composite id) into a
    parquet index dir. Returns the index path."""
    from spec_search_spark.operators.similarity import build_index_df

    tune(spark)
    out = out_dir or os.path.join(tempfile.mkdtemp(prefix="incr_index_"), "index")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(docs_dir)
    )

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        build_index_df(batch).write.mode("append").parquet(out)

    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return out
