"""Physical-plan regression tests: the scale-design invariants
(pushdown, broadcast, partial agg, TakeOrdered) must survive future
edits — a correct-but-shuffle-happy plan is a failure here."""

from __future__ import annotations


def test_plan_audit_all_pass(spark, sf_dir):
    from spec_search_spark.plans.audit import audit

    results = audit(spark, sf_dir)
    failures = [(n, c) for n, c, ok in results if not ok]
    assert not failures, failures


def test_two_phase_topk_single_shuffle(spark, sf_dir):
    """The probe-search queries must run the partial top-k
    (MapInPandas) BELOW their single shuffle exchange: the full scored
    table never exchanges onto the handful of probe_id reducer tasks —
    only the ≤ k×partitions×probes survivor set does."""
    import re

    from spec_search_spark.operators.ivf import ivf_ann_search
    from spec_search_spark.operators.similarity import ann_lsh_bucketed, knn_multi_probe
    from spec_search_spark.plans.audit import plan_of

    for fn in (knn_multi_probe, ann_lsh_bucketed, ivf_ann_search):
        plan = plan_of(fn(spark, sf_dir))
        tree = plan.split("\n\n", 1)[0]
        # exactly one shuffle exchange ("- Exchange (n)"; BroadcastExchange
        # is a different token and InMemoryTableScan subtrees don't count)
        shuffles = re.findall(r"- Exchange \(\d+\)", tree)
        assert len(shuffles) == 1, (fn.__name__, tree)
        # and the partial top-k sits BELOW it (later in top-down text)
        assert tree.index("- Exchange (") < tree.index("MapInPandas ("), (
            fn.__name__,
            tree,
        )


def test_neardup_banding(spark, sf_dir):
    """embedding_near_dup's candidate generation must (a) prune — the
    banded candidate set is strictly smaller than the raw within-label
    pair count, (b) produce no false positives — every output pair
    passes the exact cosine check (is a subset of the exact all-pairs
    result), and (c) keep recall ≥ 0.8 even on random vectors at the
    loose test threshold (the LSH worst case; production thresholds
    near 1.0 give recall > 0.999)."""
    from pyspark.sql import functions as F

    from spec_search_spark.catalog import load_table
    from spec_search_spark.functions.vector import cosine_similarity
    from spec_search_spark.operators.similarity import (
        COSINE_NEARDUP_THRESHOLD,
        embedding_near_dup,
        neardup_candidates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    block_pairs = sum(
        r["c"] * (r["c"] - 1) // 2
        for r in emb.groupBy("label").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n_cand = neardup_candidates(spark, sf_dir).count()
    assert 0 < n_cand < block_pairs, (n_cand, block_pairs)

    a, b = emb.alias("a"), emb.alias("b")
    exact = {
        (r["vec1"], r["vec2"])
        for r in a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos_sim",
            F.round(cosine_similarity(F.col("a.embedding"), F.col("b.embedding")), 4),
        )
        .filter(F.col("cos_sim") >= COSINE_NEARDUP_THRESHOLD)
        .select(F.col("a.vec_id").alias("vec1"), F.col("b.vec_id").alias("vec2"))
        .collect()
    }
    got = {
        (r["vec1"], r["vec2"]) for r in embedding_near_dup(spark, sf_dir).collect()
    }
    assert got <= exact, got - exact          # exact re-check: no false positives
    assert len(got) >= 0.8 * len(exact), (len(got), len(exact))
