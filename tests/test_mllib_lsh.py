"""Recall property tests for the MLlib LSH variants (rows-only ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_brp_ann_recall_vs_exact(spark, sf_dir):
    from spec_search_spark.operators.mllib_lsh import mllib_brp_ann
    from spec_search_spark.functions.vector import l2_squared
    from spec_search_spark.catalog import load_table
    from pyspark.sql.window import Window as W

    got = {}
    for r in mllib_brp_ann(spark, sf_dir).collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    assert set(got) == {0, 1, 2, 3, 4}

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    w = W.partitionBy("probe_id").orderBy(F.asc("dist2"), F.asc("vec_id"))
    exact = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn("dist2", F.round(l2_squared(F.col("embedding"), F.col("probe_vec")), 4))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["probe_id"], set()).add(r["vec_id"])
    recalls = [len(truth[p] & got.get(p, set())) / len(truth[p]) for p in truth]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_brp_ann_deterministic(spark, sf_dir):
    from spec_search_spark.operators.mllib_lsh import mllib_brp_ann

    a = sorted(tuple(r) for r in mllib_brp_ann(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in mllib_brp_ann(spark, sf_dir).collect())
    assert a == b


def test_minhash_near_dup_estimates_jaccard(spark, sf_dir):
    """Every returned pair's estimated Jaccard distance must be ≤ 0.2
    and roughly agree with the exact token-set Jaccard (MinHash is an
    unbiased estimator; allow generous tolerance at 8 tables)."""
    from spec_search_spark.operators.mllib_lsh import mllib_minhash_near_dup
    from spec_search_spark.catalog import load_table

    pairs = mllib_minhash_near_dup(spark, sf_dir).collect()
    assert all(r["jaccard_dist"] <= 0.2 for r in pairs)
    if not pairs:
        pytest.skip("no near-dup pairs at this sf")
    docs = {
        r["doc_id"]: set((r["text"] or "").split())
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in pairs[:20]:
        a, b = docs[r["doc1"]], docs[r["doc2"]]
        exact_dist = 1.0 - len(a & b) / len(a | b)
        assert abs(exact_dist - r["jaccard_dist"]) <= 0.45, (r, exact_dist)
