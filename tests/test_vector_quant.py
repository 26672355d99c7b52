"""SQ8 quantization semantics: code-vector bounds and ANN recall of
the int8 approximate scan vs the exact cosine ranking."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.vector import cosine_similarity
from spec_search_spark.operators import vector_quant as vq
from spec_search_spark.operators.similarity import N_PROBES, TOP_K


def test_quantized_codes_within_int8_range(spark, sf_dir):
    q = vq._quantized(load_table(spark, sf_dir, "embeddings"))
    bounds = q.select(
        F.array_max("qv").alias("mx"), F.array_min("qv").alias("mn")
    ).agg(F.max("mx").alias("mx"), F.min("mn").alias("mn")).first()
    assert bounds.mx <= vq.Q_MAX and bounds.mn >= -vq.Q_MAX
    # every vector's max-abs component quantizes to exactly +/-127
    # (that component divided by its own scale is exactly Q_MAX)
    at_limit = q.filter(
        (F.array_max("qv") == vq.Q_MAX) | (F.array_min("qv") == -vq.Q_MAX)
    ).count()
    assert at_limit == q.count()


def test_ann_int8_recall_vs_exact(spark, sf_dir):
    got = {
        (r.probe_id, r.vec_id)
        for r in vq.ann_int8_rerank(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    w = W.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    exact = {
        (r.probe_id, r.vec_id)
        for r in (
            emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "vec_id",
                F.round(
                    cosine_similarity(F.col("embedding"), F.col("probe_vec")), 4
                ).alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .collect()
        )
    }
    # int8 error is ~0.4%; with a 50-candidate pool the exact top-10
    # should essentially always survive — require >= 90% recall overall
    assert len(got & exact) >= int(0.9 * len(exact)), (
        len(got & exact),
        len(exact),
    )


def test_matryoshka_recall_properties(spark, sf_dir):
    from spec_search_spark.operators.vector_quant import (
        MRL_DIMS,
        matryoshka_recall_report,
    )
    from spec_search_spark.operators.similarity import N_PROBES, TOP_K

    rows = matryoshka_recall_report(spark, sf_dir).collect()
    # every (dim, probe) cell present — zero-recall cells must not drop
    assert len(rows) == len(MRL_DIMS) * N_PROBES
    by = {(r["dim"], r["probe_id"]): r for r in rows}
    for (d, p), r in by.items():
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_6"] - r["n_hits"] / TOP_K) < 1e-6
    # the full-dim rows are the ground truth against itself
    for p in range(N_PROBES):
        assert by[(MRL_DIMS[-1], p)]["n_hits"] == TOP_K
    # monotone on average: longer prefixes can't be worse overall
    import statistics

    means = [
        statistics.mean(by[(d, p)]["n_hits"] for p in range(N_PROBES))
        for d in MRL_DIMS
    ]
    assert means[-1] == max(means)
