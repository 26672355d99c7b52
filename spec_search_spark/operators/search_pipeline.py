"""End-to-end search flagship — the retrieval-side sibling of
`corpus_build.corpus_build_pipeline`: one oracle-checked query
chaining the search stack the way a production RAG retriever runs it:

    chunk index → vector arm (best-chunk L2 top-K)
                + keyword arm (integer-idf overlap top-K)
        → RRF fusion (the hybrid pool)
        → doc-level mean-pooled embeddings
        → MMR diversification (λ = 0.7) of the pool

emitting the final diversified ranking WITH full per-stage provenance
(each pick's vector-arm rank, keyword-arm rank, fused RRF score,
embedding relevance, and MMR score) as one DataFrame. Every stage
reuses the oracle-checked operator it names (`similarity.
hybrid_search_rrf`'s arms and fusion, `similarity.
doc_embeddings_pooled`, `mmr`'s integer-unit greedy); what this query
proves is their INTEROPERATION — the fused pool joins the pooled
embeddings on doc_id, and the MMR phase consumes the pool the fusion
produced, in one lineage.

Scale shape (the two-phase discipline): everything corpus-scale —
both retrieval arms (TakeOrdered at arm depth, postings pre-filtered
to query tokens at the scan), the fusion (≤ 2·HYBRID_ARM_K rows), and
the pooled-embedding join — is distributed; the greedy selection runs
over the FIXED TOP_K-row fused pool (bounded centroids-class collect,
mmr.py's argument verbatim, independent of corpus size).

Cross-engine determinism: relevance and penalty are both cosines in
the SAME 10⁻⁴ integer units (rel = cos(pooled_doc, query_vec), pen =
max cos to the selected set), so the greedy argmax compares exact
integers (mmr_e5 = 7·rel_e4 − 3·pen_e4) and the unrolled
MATERIALIZED-CTE oracle replays the identical selection; RRF scores
are 9dp-rounded doubles (the hybrid query's existing contract) and
ride along as provenance only.

Reference parity: composes reference E1+E2 (`app.py:48-61`) with the
LangChain retriever options its stack exposes but never turns on
(`search_type="mmr"`, hybrid fusion) — engine surface here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from spec_search_spark.functions.vector import (
    cosine_similarity_sql,
    embed_text_local,
)
from spec_search_spark.operators.mmr import LAM_NUM, PEN_NUM, _sim_e4, greedy_mmr
from spec_search_spark.operators.similarity import (
    DEFAULT_DIM,
    HYBRID_QUERY,
    doc_embeddings_pooled,
    hybrid_search_rrf,
)
from spec_search_spark.session import local_df, tune

SEARCH_SELECT_K = 5  # diversified picks out of the TOP_K fused pool

SEARCH_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("doc_id", LongType()),
        StructField("vec_rank", IntegerType()),
        StructField("kw_rank", IntegerType()),
        StructField("rrf", DoubleType()),
        StructField("rel_e4", LongType()),
        StructField("mmr_e5", LongType()),
    ]
)


def _pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed phase: hybrid fused TOP_K pool joined to the
    doc-level pooled embeddings, with the query-relevance cosine in
    integer units. ≤ TOP_K rows out."""
    fused = hybrid_search_rrf(spark, sf_dir)
    pooled = doc_embeddings_pooled(spark, sf_dir).select("doc_id", "pooled")
    qvec = F.array(
        *[F.lit(x) for x in embed_text_local(HYBRID_QUERY, DEFAULT_DIM)]
    )
    return fused.join(pooled, "doc_id").select(
        "doc_id",
        "vec_rank",
        "kw_rank",
        "rrf",
        _sim_e4(F.col("pooled"), qvec).alias("rel_e4"),
        "pooled",
    )


def search_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See module docstring.

    Output: (rank, doc_id, vec_rank, kw_rank, rrf, rel_e4, mmr_e5) —
    SEARCH_SELECT_K rows in selection order."""
    tune(spark)
    # the pool feeds the pairwise-similarity self-join twice plus the
    # provenance collect — pin the ≤ TOP_K rows
    pool = _pool(spark, sf_dir).localCheckpoint(eager=True)
    a = pool.select(F.col("doc_id").alias("da"), F.col("pooled").alias("pa"))
    b = pool.select(F.col("doc_id").alias("db"), F.col("pooled").alias("pb"))
    pairs = (
        a.join(F.broadcast(b), F.col("da") != F.col("db"))
        .select("da", "db", _sim_e4(F.col("pa"), F.col("pb")).alias("s_e4"))
        .collect()
    )
    rows = {
        r["doc_id"]: r
        for r in pool.select(
            "doc_id", "vec_rank", "kw_rank", "rrf", "rel_e4"
        ).collect()
    }
    sim = {(r["da"], r["db"]): r["s_e4"] for r in pairs}

    rel = {d: r["rel_e4"] for d, r in rows.items()}
    out = []
    for rank, d, score in greedy_mmr(rel, sim, SEARCH_SELECT_K):
        r = rows[d]
        out.append(
            (rank, d, r["vec_rank"], r["kw_rank"], r["rrf"], r["rel_e4"], score)
        )
    return local_df(spark, out, SEARCH_SCHEMA)


def _search_pipeline_sql() -> str:
    from spec_search_spark.operators.similarity import (
        _hybrid_search_sql,
    )

    # the hybrid oracle is a full WITH...SELECT statement — nest it
    # wholesale as the fused-pool derived table (the DECONTAMINATE_SQL
    # pattern), and rebuild the pooled embeddings + greedy chain on top.
    from spec_search_spark.operators.similarity import (
        _INDEX_CHUNKS_CTE,
        embedding_sql_ctes,
    )

    probe_lit = (
        "["
        + ", ".join(repr(x) for x in embed_text_local(HYBRID_QUERY, DEFAULT_DIM))
        + "]"
    )
    relcos = cosine_similarity_sql("p.pooled", probe_lit)
    pcos = cosine_similarity_sql("a.pooled", "b.pooled")
    parts = [
        f"""
WITH fused AS MATERIALIZED (
  SELECT * FROM ({_hybrid_search_sql()}) f
),
{_INDEX_CHUNKS_CTE},
{embedding_sql_ctes('__chunks', 'id', 'chunk', DEFAULT_DIM).lstrip()},
per_dim AS (
  SELECT c.doc_id, comp.d, round(avg(comp.c), 6) AS v
  FROM __comp comp JOIN __chunks c ON comp.id = c.id
  GROUP BY c.doc_id, comp.d
),
pooled AS MATERIALIZED (
  SELECT doc_id, list(v ORDER BY d) AS pooled FROM per_dim GROUP BY doc_id
),
pool AS MATERIALIZED (
  SELECT f.doc_id, f.vec_rank, f.kw_rank, f.rrf,
         CAST(round({relcos} * 10000, 0) AS BIGINT) AS rel_e4,
         p.pooled
  FROM fused f JOIN pooled p ON p.doc_id = f.doc_id
),
pair AS MATERIALIZED (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(round({pcos} * 10000, 0) AS BIGINT) AS s_e4
  FROM pool a JOIN pool b ON a.doc_id <> b.doc_id
),
picks1 AS MATERIALIZED (
  SELECT doc_id, vec_rank, kw_rank, rrf, rel_e4,
         {LAM_NUM} * rel_e4 AS mmr_e5
  FROM pool ORDER BY mmr_e5 DESC, doc_id LIMIT 1
),
picked1 AS MATERIALIZED (SELECT doc_id FROM picks1)"""
    ]
    for k in range(2, SEARCH_SELECT_K + 1):
        parts.append(
            f""",
picks{k} AS MATERIALIZED (
  SELECT c.doc_id, c.vec_rank, c.kw_rank, c.rrf, c.rel_e4,
         {LAM_NUM} * c.rel_e4 - {PEN_NUM} * max(p.s_e4) AS mmr_e5
  FROM pool c JOIN pair p
    ON p.da = c.doc_id AND p.db IN (SELECT doc_id FROM picked{k - 1})
  WHERE c.doc_id NOT IN (SELECT doc_id FROM picked{k - 1})
  GROUP BY c.doc_id, c.vec_rank, c.kw_rank, c.rrf, c.rel_e4
  ORDER BY mmr_e5 DESC, c.doc_id LIMIT 1
),
picked{k} AS MATERIALIZED (SELECT doc_id FROM picked{k - 1}
              UNION ALL SELECT doc_id FROM picks{k})"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, doc_id,"
        f" CAST(vec_rank AS INT) AS vec_rank, CAST(kw_rank AS INT) AS kw_rank,"
        f" rrf, rel_e4, CAST(mmr_e5 AS BIGINT) AS mmr_e5 FROM picks{k}"
        for k in range(1, SEARCH_SELECT_K + 1)
    )
    return "".join(parts) + "\n" + sel


QUERIES = {"search_pipeline_e2e": search_pipeline_e2e}
ORACLES = {"search_pipeline_e2e": _search_pipeline_sql()}
