"""PQ invariants: code compactness, ADC recall vs exact brute force
(value parity vs the unrolled oracle is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.vector import l2_squared
from spec_search_spark.operators.pq import (
    K_CODES,
    M_SUB,
    QUERY_VEC_ID,
    TOP_K,
    pq_ann_search,
    pq_encode,
)


def test_codes_are_compact_and_total(spark, sf_dir):
    codes = pq_encode(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n
    bad = codes.filter(
        (F.size("codes") != M_SUB)
        | F.exists("codes", lambda c: (c < 0) | (c >= K_CODES))
    ).count()
    assert bad == 0


def test_adc_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("q"))
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", l2_squared(F.col("e"), F.col("q")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(TOP_K)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    pq_rows = pq_ann_search(spark, sf_dir).collect()
    pq_ids = [r["vec_id"] for r in pq_rows]
    assert len(pq_rows) == TOP_K
    # exact re-rank output must be sorted by true distance
    dists = [r["dist2"] for r in pq_rows]
    assert dists == sorted(dists)
    # approx never beats exact by construction of re-rank; recall of the
    # two-phase search against brute force should be substantial
    recall = len(exact_ids & set(pq_ids)) / TOP_K
    assert recall >= 0.7, f"PQ recall collapsed: {recall}"
    # the query vector itself (distance 0) must always survive
    assert QUERY_VEC_ID in pq_ids
