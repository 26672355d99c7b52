"""Distributed k-means + SemDeDup invariants (value parity vs the
unrolled-CTE DuckDB oracle is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.operators.kmeans import (
    K_CLUSTERS,
    SEMDEDUP_TAU,
    _assign,
    _emb,
    _init_centroids,
    _update,
    kmeans_assign,
    kmeans_cluster_sizes,
    semantic_dedup,
)


def test_assignment_is_total_and_bounded(spark, sf_dir):
    df = kmeans_assign(spark, sf_dir)
    n_emb = _emb(spark, sf_dir).count()
    assert df.count() == n_emb
    assert df.select("vec_id").distinct().count() == n_emb
    clusters = {r["cluster"] for r in df.select("cluster").distinct().collect()}
    assert clusters <= set(range(K_CLUSTERS))
    assert df.filter(F.col("dist2") < 0).count() == 0


def test_iteration_does_not_increase_inertia(spark, sf_dir):
    # Lloyd's guarantee: total inertia is non-increasing across an
    # assign→update→assign step (up to the 6dp centroid rounding, which
    # bounds the violation by ~dim*1e-6 per point).
    emb = _emb(spark, sf_dir)
    cent = _init_centroids(emb).localCheckpoint(eager=True)
    a1 = _assign(emb, cent)
    i1 = a1.agg(F.sum("dist2")).first()[0]
    cent2 = _update(a1, cent).localCheckpoint(eager=True)
    i2 = _assign(emb, cent2).agg(F.sum("dist2")).first()[0]
    assert i2 <= i1 + 1e-3 * emb.count()


def test_sizes_partition_the_corpus(spark, sf_dir):
    sizes = kmeans_cluster_sizes(spark, sf_dir)
    total = sizes.agg(F.sum("n")).first()[0]
    assert total == _emb(spark, sf_dir).count()
    assert sizes.filter(F.col("inertia") < 0).count() == 0


def test_semdedup_keeps_earliest_member(spark, sf_dir):
    df = semantic_dedup(spark, sf_dir)
    dropped = df.filter(~F.col("keep"))
    # every dropped vector points at a strictly earlier keeper-or-dup
    assert dropped.filter(
        F.col("dup_of").isNull() | (F.col("dup_of") >= F.col("vec_id"))
    ).count() == 0
    # the first vector of any cluster can never be dropped
    w_first = (
        df.groupBy("cluster").agg(F.min("vec_id").alias("first_vec"))
    )
    firsts = df.join(
        w_first,
        (df.cluster == w_first.cluster) & (df.vec_id == w_first.first_vec),
    )
    assert firsts.filter(~F.col("keep")).count() == 0
    assert 0.5 < SEMDEDUP_TAU < 1.0


def test_silhouette_matches_direct_reference(spark, sf_dir):
    """Per-point s = 1 - sqrt(a2/b2) recomputed from the collected
    assignment's own distance table (trained centroids reused)."""
    import math

    from spec_search_spark.operators.kmeans import (
        _emb,
        _trained_centroids,
        kmeans_silhouette,
    )

    rows = {r["cluster"]: r for r in kmeans_silhouette(spark, sf_dir).collect()}
    cents = {r["cid"]: r["c"] for r in _trained_centroids(spark, sf_dir).collect()}
    per_cluster: dict = {}
    for r in _emb(spark, sf_dir).collect():
        dists = sorted(
            (
                round(sum((e - c) ** 2 for e, c in zip(r["e"], cv)), 6),
                cid,
            )
            for cid, cv in cents.items()
        )
        (a2, cid), (b2, _) = dists[0], dists[1]
        s = 0.0 if b2 == 0 else 1.0 - math.sqrt(a2 / b2)
        per_cluster.setdefault(cid, []).append(round(s * 1e9) / 1e9)
    for cid, ss in per_cluster.items():
        r = rows[cid]
        assert r["n"] == len(ss)
        assert abs(r["mean_silhouette_6"] - sum(ss) / len(ss)) < 2e-6
        assert 0.0 <= r["mean_silhouette_6"] <= 1.0
