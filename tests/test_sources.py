"""Round-trip tests for the format adapters: every format preserves
row count and values (array columns survive the text formats via
json encoding)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.sources import read_table_any, write_table_any


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_documents_roundtrip(spark, sf_dir, fmt):
    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix=f"rt_{fmt}_") + "/t"
    write_table_any(docs, path, fmt)
    back = read_table_any(spark, path, fmt, schema=docs.schema)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    b = {r["doc_id"]: r["text"] for r in back.select("doc_id", "text").collect()}
    assert a == b


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_embeddings_array_roundtrip(spark, sf_dir, fmt):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    path = tempfile.mkdtemp(prefix=f"rte_{fmt}_") + "/t"
    write_table_any(emb, path, fmt)
    back = read_table_any(spark, path, fmt, schema=emb.schema)
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    rt = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert set(orig) == set(rt)
    for k in orig:
        assert orig[k] == pytest.approx(rt[k], abs=1e-6)


def test_unsupported_format_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        write_table_any(docs, "/tmp/x", "avro-nope")
    with pytest.raises(ValueError):
        read_table_any(spark, "/tmp/x", "csv")  # schema required


def test_small_file_compaction(spark, sf_dir):
    """Small-file compaction: the maintenance pass every long-lived
    100 TB table needs. A fragmented write (64 files for a tiny table)
    is compacted by sizing the output partition count from the actual
    input bytes against a target file size — data unchanged, file count
    collapsed, no skew introduced (coalesce, not repartition: no
    shuffle)."""
    import glob
    import os

    li = load_table(spark, sf_dir, "lineitem")
    frag = tempfile.mkdtemp(prefix="frag_") + "/t"
    li.repartition(64).write.parquet(frag)
    n_frag = len(glob.glob(frag + "/part-*.parquet"))
    assert n_frag >= 32  # genuinely fragmented

    target_bytes = 32 * 1024 * 1024
    in_bytes = sum(
        os.path.getsize(p) for p in glob.glob(frag + "/part-*.parquet")
    )
    n_out = max(1, (in_bytes + target_bytes - 1) // target_bytes)
    compacted = tempfile.mkdtemp(prefix="compact_") + "/t"
    spark.read.parquet(frag).coalesce(int(n_out)).write.parquet(compacted)
    n_comp = len(glob.glob(compacted + "/part-*.parquet"))
    assert n_comp == n_out < n_frag

    before = spark.read.parquet(frag)
    after = spark.read.parquet(compacted)
    assert after.count() == before.count()
    key = [r[0] for r in after.groupBy().agg(F.sum("l_orderkey")).collect()]
    key0 = [r[0] for r in before.groupBy().agg(F.sum("l_orderkey")).collect()]
    assert key == key0


def test_fixed_width_roundtrip_and_overflow(spark, tmp_path):
    """Fixed-width: values survive the positional layout cell-for-cell,
    and a value wider than its slot fails LOUDLY (silent truncation is
    how positional feeds corrupt data)."""
    from spec_search_spark.sources.formats import read_fixed_width, write_fixed_width

    df = spark.createDataFrame(
        [(1, "AB", 314159), (22, "C", -7)], "k long, s string, cents long"
    )
    widths = [("k", 4), ("s", 3), ("cents", 10)]
    path = str(tmp_path / "fw")
    write_fixed_width(df, path, widths)
    back = read_fixed_width(
        spark, path, widths, types={"k": "bigint", "cents": "bigint"}
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))

    with pytest.raises(ValueError, match="exceed width"):
        write_fixed_width(df, str(tmp_path / "fw2"), [("k", 4), ("s", 3), ("cents", 2)])
