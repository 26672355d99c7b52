"""Stateful streaming (applyInPandasWithState) + bucketed-join +
corrupt-record quarantine tests."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F


def test_stateful_user_stats_match_batch(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.streaming.stateful import user_running_stats

    stream = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in user_running_stats(spark, sf_dir).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["t"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("t"))
        .collect()
    }
    assert set(stream) == set(batch)
    for u in batch:
        assert stream[u][0] == batch[u][0], u
        assert abs(stream[u][1] - batch[u][1]) < 0.05, u


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """bucketBy co-location: a join on the bucket key needs no Exchange
    on either side — the 100 TB repeated-join pattern."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.plans.audit import plan_of

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    # a fresh derby metastore doesn't know about leftover warehouse
    # dirs from earlier sessions — remove the locations too
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_of(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange hashpartitioning" not in join_section, join_section
    assert joined.count() == 3


def test_corrupt_record_quarantine(spark):
    """PERMISSIVE json ingest with _corrupt_record: bad rows are
    quarantined, good rows parse — the engine-side analog of the
    reference's per-file try/except isolation (indexer.py:114-122)."""
    import os

    d = tempfile.mkdtemp(prefix="quar_")
    path = os.path.join(d, "data.json")
    with open(path, "w") as f:
        f.write(json.dumps({"id": 1, "v": 10.5}) + "\n")
        f.write('{"id": 2, "v": BROKEN}\n')
        f.write(json.dumps({"id": 3, "v": 7.25}) + "\n")
        f.write("not json at all\n")
    schema = "id bigint, v double, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 2
    assert {r["id"] for r in good.collect()} == {1, 3}


def test_transform_with_state_user_counts(spark, sf_dir):
    """v2 arbitrary-state API (transformWithStateInPandas): final
    per-user totals equal batch GROUP BY counts. Skips where the
    protobuf dependency of the v2 driver worker is unavailable."""
    import pytest

    from spec_search_spark.streaming import stateful as st

    if not st.tws_available():
        pytest.skip("google.protobuf unavailable: transformWithState v2 needs it")
    got = {r.user_id: r.n_events for r in st.user_counts_tws(spark, sf_dir).collect()}
    from spec_search_spark.catalog import load_table

    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want
