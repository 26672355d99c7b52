"""Custom `sheets` DataSource: S1 listing-pruned scan, S3 header
records mode, S4 ranged scan, S6 write-back round trip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from spec_search_spark.operators.sheets_connector import (
    build_sheets_fixture,
    read_sheets,
)
from spec_search_spark.sources.sheets_source import SHEET_SUFFIX, register


@pytest.fixture(scope="module")
def fixture_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sheets_fixture"))
    return build_sheets_fixture(sf_dir, out)


def test_grid_scan_matches_documents(spark, sf_dir, fixture_dir):
    from spec_search_spark.catalog import load_table

    cells = (
        read_sheets(spark, fixture_dir)
        .select(F.posexplode("cells").alias("col_idx", "cell_text"))
        .filter(F.col("cell_text").isNotNull())
        .count()
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    assert cells == docs.count()


def test_listing_pruning_via_pushdown(spark, fixture_dir):
    df = read_sheets(spark, fixture_dir).filter(F.col("file_name") == "sheet_001")
    rows = df.collect()
    assert rows and all(r["file_name"] == "sheet_001" for r in rows)
    # the filter must reach the reader: with pushdown the scan opens
    # exactly one file, observable as a single input partition
    assert df.rdd.getNumPartitions() == 1


def test_ranged_scan(spark, fixture_dir):
    full = {
        (r["file_name"], r["row_idx"]): r["cells"]
        for r in read_sheets(spark, fixture_dir).collect()
    }
    ranged = (
        spark.read.format("sheets")
        .option("range", "B1:C2")
        .load(fixture_dir)
        .collect()
    )
    assert ranged
    for r in ranged:
        assert 0 <= r["row_idx"] <= 1  # rows 1..2 → idx 0..1
        expected = full[(r["file_name"], r["row_idx"])][1:3]  # cols B..C
        assert list(r["cells"]) == list(expected)


def test_records_mode_header_schema(spark, tmp_path):
    doc = {
        "file_id": 7,
        "file_name": "people",
        "tabs": [
            {
                "sheet_id": 107,
                "tab_name": "t",
                "values": [
                    ["name", "age", "city"],
                    ["ada", "36", "london"],
                    ["grace", "85"],  # short row → padded with ''
                ],
            }
        ],
    }
    with open(os.path.join(tmp_path, f"people{SHEET_SUFFIX}"), "w") as fh:
        json.dump(doc, fh)
    register(spark)
    df = spark.read.format("sheets").option("mode", "records").load(str(tmp_path))
    assert df.columns == ["name", "age", "city"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["ada"]["city"] == "london"
    assert rows["grace"]["city"] == ""


def test_write_back_round_trip(spark, fixture_dir, tmp_path):
    register(spark)
    src = read_sheets(spark, fixture_dir)
    out = str(tmp_path / "written")
    os.makedirs(out)
    src.write.format("sheets").mode("overwrite").save(out)

    # the sink wrote the fixture layout: same file set, same content
    assert sorted(os.listdir(out)) == sorted(
        f for f in os.listdir(fixture_dir) if f.endswith(SHEET_SUFFIX)
    )
    back = read_sheets(spark, out)
    orig = {(r["file_id"], r["sheet_id"], r["tab_name"], r["row_idx"]): list(r["cells"])
            for r in src.collect()}
    got = {(r["file_id"], r["sheet_id"], r["tab_name"], r["row_idx"]): list(r["cells"])
           for r in back.collect()}
    assert got == orig

    # overwrite replaces: writing a 1-row subset leaves only that sheet
    sub = src.filter(F.col("file_name") == "sheet_000").limit(1)
    sub.write.format("sheets").mode("overwrite").save(out)
    assert os.listdir(out) == [f"sheet_000{SHEET_SUFFIX}"]


def test_vocab_shuffle_fallback_identical(spark, sf_dir, monkeypatch):
    """hashed_shingle_postings above BROADCAST_VOCAB_MAX must fall back
    to a shuffle join with identical rows (the 100 TB path where the
    vocabulary outgrows the broadcast limit)."""
    from spec_search_spark.operators import dedup

    def rows(df):
        return sorted((r["doc_id"], r["h"]) for r in df.collect())

    broadcast_rows = rows(dedup.hashed_shingle_postings(spark, sf_dir))
    monkeypatch.setattr(dedup, "BROADCAST_VOCAB_MAX", 0)
    dedup._HASHED_POSTINGS.clear()  # bust the session memo
    try:
        shuffle_rows = rows(dedup.hashed_shingle_postings(spark, sf_dir))
    finally:
        dedup._HASHED_POSTINGS.clear()
    assert shuffle_rows == broadcast_rows


def test_stream_sink_upserts_rows(spark, tmp_path):
    """Streaming sheet sink: micro-batches upsert at row granularity;
    a second run over new input overlays changed rows and keeps
    untouched ones."""
    import json as _json
    import time

    from spec_search_spark.sources.sheets_source import GRID_SCHEMA

    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(out)

    def run_batch(rows):
        spark.createDataFrame(rows, GRID_SCHEMA).write.mode("append").parquet(inp)
        q = (
            spark.readStream.schema(GRID_SCHEMA)
            .parquet(inp)
            .writeStream.format("sheets")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination(60)
        time.sleep(0.2)

    run_batch(
        [
            (1, "s1", 101, "t", 0, ["a0", "b0"]),
            (1, "s1", 101, "t", 1, ["a1", "b1"]),
        ]
    )
    run_batch([(1, "s1", 101, "t", 1, ["A1!", "B1!"]), (1, "s1", 101, "t", 2, ["a2"])])

    with open(os.path.join(out, f"s1{SHEET_SUFFIX}")) as fh:
        doc = _json.load(fh)
    values = doc["tabs"][0]["values"]
    assert values[0] == ["a0", "b0"]        # untouched row survives
    assert values[1] == ["A1!", "B1!"]      # upserted row replaced
    assert values[2] == ["a2"]              # new row appended


def test_stream_reader_multi_epoch_exactly_once(spark, fixture_dir, tmp_path):
    """Files arriving in waves are each ingested exactly once, one or
    more micro-batches per wave (no drop, no replay)."""
    import uuid

    from spec_search_spark.operators.sheets_connector import feed_files_in_waves

    register(spark)
    n_files = len([f for f in os.listdir(fixture_dir) if f.endswith(SHEET_SUFFIX)])
    assert n_files > 2
    name = f"stream_rd_{uuid.uuid4().hex[:8]}"
    feed = str(tmp_path / "feed")
    stream = spark.readStream.format("sheets").load(feed)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        waves = feed_files_in_waves(fixture_dir, feed, q, 2)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert waves == (n_files + 1) // 2
    # each wave drains before the next arrives -> at least one
    # non-empty batch per wave
    assert n_batches >= waves
    got = spark.table(name)
    batch = read_sheets(spark, fixture_dir)
    assert got.count() == batch.count()
    assert (
        got.select("file_id", "sheet_id", "row_idx").distinct().count()
        == got.count()
    )


def test_stream_reader_restart_resumes_from_checkpoint(spark, fixture_dir, tmp_path):
    """Stop the stream between arrival waves and restart on the same
    checkpoint: the committed union of both runs is every file exactly
    once (the offset log is the source of truth)."""
    from spec_search_spark.operators.sheets_connector import feed_files_in_waves

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    feed = str(tmp_path / "feed")
    files = sorted(f for f in os.listdir(fixture_dir) if f.endswith(SHEET_SUFFIX))
    assert len(files) > 2

    def start():
        return (
            spark.readStream.format("sheets")
            .load(feed)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    import shutil

    os.makedirs(feed, exist_ok=True)
    q = start()
    try:
        for f in files[:2]:
            shutil.copy(os.path.join(fixture_dir, f), os.path.join(feed, f))
        q.processAllAvailable()
    finally:
        q.stop()
    q2 = start()
    try:
        feed_files_in_waves(fixture_dir, feed, q2, 2)  # copies the rest
    finally:
        q2.stop()
    # exactly-once is defined by the sink's transaction log: an aborted
    # attempt may leave orphan part-files that only _spark_metadata
    # excludes — read the COMMITTED file set, as a downstream consumer
    # of a file sink must
    committed = []
    meta = os.path.join(out, "_spark_metadata")
    for entry in sorted(os.listdir(meta)):
        if entry.endswith(".compact") or entry.isdigit():
            with open(os.path.join(meta, entry)) as fh:
                for line in fh:
                    if line.startswith("{"):
                        committed.append(json.loads(line)["path"])
    got = spark.read.parquet(*committed)
    batch = read_sheets(spark, fixture_dir)
    assert got.count() == batch.count()
    assert (
        got.select("file_id", "sheet_id", "row_idx").distinct().count()
        == got.count()
    )
