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
