"""Hard-negative mining for retrieval training — the disagreement set
between the lexical and semantic arms of the hybrid stack: documents
one arm ranks in its top-K that the other arm misses entirely. These
are exactly the pairs a contrastive training pipeline wants —
BM25-positive / dense-negative rows are hard negatives for the dense
model (lexically matched, semantically missed), and the converse rows
are the paraphrase-style matches a lexical miner never surfaces
(the ANCE / RocketQA mining recipe, run cross-arm instead of
cross-epoch).

Not in the reference (one retrieval arm, `/root/reference/
app.py:50-52`); first-class for the training-data north star — mining
feeds the trainer, the trainer feeds the index.

Scale shape (identical to hybrid_search_rrf's arms, which this module
reuses semantically):
- vector arm: best-chunk distance per doc over the V1 chunk index,
  TakeOrdered at HYBRID_ARM_K;
- keyword arm: postings pre-filtered to the query's tokens AT THE
  SCAN (pushed IN filter), integer idf weights, TakeOrdered;
- the disagreement is two LEFT ANTI joins between the two ≤K-row
  arms — constant-size work after the arms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import tokens as _tok
from spec_search_spark.functions.vector import l2_squared
from spec_search_spark.operators.similarity import (
    DEFAULT_DIM,
    HYBRID_ARM_K,
    HYBRID_QUERY,
    IDF_SCALE,
    _hybrid_search_sql,
    build_index,
    embed_text_local,
)
from spec_search_spark.session import tune


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-arm disagreement report for HYBRID_QUERY.

    Output: (category, doc_id, rank) — category 'lex_only' (keyword
    arm hit, vector arm miss → dense-model hard negative) or
    'sem_only' (the converse), rank = position in the hitting arm."""
    tune(spark)
    q_tokens = [t for t in HYBRID_QUERY.lower().split() if t]

    index = build_index(spark, sf_dir)
    probe = F.array(
        *[F.lit(x) for x in embed_text_local(HYBRID_QUERY, DEFAULT_DIM)]
    )
    doc_dist = (
        index.withColumn(
            "dist2", F.round(l2_squared(F.col("embedding"), probe), 6)
        )
        .groupBy("doc_id")
        .agg(F.min("dist2").alias("best_dist2"))
        .orderBy(F.asc("best_dist2"), F.asc("doc_id"))
        .limit(HYBRID_ARM_K)
    )
    w_vec = Window.orderBy(F.asc("best_dist2"), F.asc("doc_id"))  # ≤ K rows
    vec_arm = doc_dist.withColumn(
        "rank", F.row_number().over(w_vec).cast("bigint")
    ).select("doc_id", "rank")

    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select("doc_id", F.explode(_tok(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isin(q_tokens))
        .distinct()
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    kw_score = (
        postings.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("w", F.expr(f"(n_docs * {IDF_SCALE}L) div df"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("kw_score"))
        .orderBy(F.desc("kw_score"), F.asc("doc_id"))
        .limit(HYBRID_ARM_K)
    )
    w_kw = Window.orderBy(F.desc("kw_score"), F.asc("doc_id"))  # ≤ K rows
    kw_arm = kw_score.withColumn(
        "rank", F.row_number().over(w_kw).cast("bigint")
    ).select("doc_id", "rank")

    lex_only = kw_arm.join(vec_arm.select("doc_id"), "doc_id", "left_anti").select(
        F.lit("lex_only").alias("category"), "doc_id", "rank"
    )
    sem_only = vec_arm.join(kw_arm.select("doc_id"), "doc_id", "left_anti").select(
        F.lit("sem_only").alias("category"), "doc_id", "rank"
    )
    return lex_only.unionByName(sem_only).orderBy("category", "rank")


def _mining_sql() -> str:
    """Reuse the hybrid oracle's arm CTEs (everything before the RRF
    fusion select) and replace the fusion with the two anti-joins."""
    hybrid = _hybrid_search_sql()
    arms = hybrid[: hybrid.index("SELECT COALESCE(")]
    return f"""{arms}
SELECT 'lex_only' AS category, doc_id, CAST(kw_rank AS BIGINT) AS rank
FROM kw_arm WHERE doc_id NOT IN (SELECT doc_id FROM vec_arm)
UNION ALL
SELECT 'sem_only' AS category, doc_id, CAST(vec_rank AS BIGINT) AS rank
FROM vec_arm WHERE doc_id NOT IN (SELECT doc_id FROM kw_arm)
ORDER BY category, rank
"""


QUERIES = {"hard_negative_mining": hard_negative_mining}
ORACLES = {"hard_negative_mining": _mining_sql()}
