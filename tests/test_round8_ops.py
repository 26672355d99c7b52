"""Round-8 operators: IVFADC delta upsert + sparse retrieval.
Value parity vs the DuckDB oracles is covered by tools/selfcheck.py;
these pin the semantic invariants an oracle replay can't distinguish
from coincidence."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ivfpq_delta_clones_follow_base(spark, sf_dir):
    """A frozen quantizer is a pure function: identical clone vectors
    must land in their base twins' clusters, so per-cluster delta
    counts equal the base counts of the cloned residue class — and the
    delta total equals the residue-class population."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.ivfpq import (
        DELTA_MOD,
        DELTA_RESIDUE,
        ivfpq_delta_upsert,
    )

    rows = ivfpq_delta_upsert(spark, sf_dir).collect()
    assert all(r["n_delta"] == r["n_base"] for r in rows), [
        (r["cluster"], r["n_base"], r["n_delta"]) for r in rows
    ]
    n_residue = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.pmod(F.col("vec_id"), F.lit(DELTA_MOD)) == DELTA_RESIDUE)
        .count()
    )
    assert sum(r["n_delta"] for r in rows) == n_residue
    # a populated cluster must carry a code checksum only if its codes
    # are not all zero; an empty cluster must carry zero
    for r in rows:
        if r["n_delta"] == 0:
            assert r["code_checksum"] == 0


def test_sparse_retrieval_scores_recompute(spark, sf_dir):
    """Direct recompute of the winners' dot products from the postings
    definition (independent driver-side fold over collected term
    weights) — and the query doc itself never appears."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.bm25 import (
        Q_TERMS,
        SPARSE_QUERY_DOC,
        SPARSE_TOP_K,
        _tokens,
        sparse_retrieval_topk,
    )

    res = sparse_retrieval_topk(spark, sf_dir).collect()
    assert 0 < len(res) <= SPARSE_TOP_K
    assert all(r["doc_id"] != SPARSE_QUERY_DOC for r in res)
    assert all(1 <= r["n_terms"] <= Q_TERMS for r in res)
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)

    # rebuild postings for the winner + the query, fold identically
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    post = tf.join(dfreq, "tok").select(
        "doc_id",
        "tok",
        F.round(
            (F.lit(1.0) + F.log("tf"))
            * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)),
            9,
        ).alias("w"),
    )
    qrows = sorted(
        post.filter(F.col("doc_id") == SPARSE_QUERY_DOC).collect(),
        key=lambda r: (-r["w"], r["tok"]),
    )[:Q_TERMS]
    qw = {r["tok"]: r["w"] for r in qrows}
    winner = res[0]["doc_id"]
    wrows = post.filter(F.col("doc_id") == winner).collect()
    terms = sorted(
        (r["tok"], round(qw[r["tok"]] * r["w"], 9))
        for r in wrows
        if r["tok"] in qw
    )
    acc = 0.0
    for _tok, p in terms:
        acc += p
    assert round(acc, 6) == res[0]["score"]
    assert len(terms) == res[0]["n_terms"]
