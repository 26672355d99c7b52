"""Graph analytics over the near-dup candidate graph: PageRank
centrality of documents inside their similarity neighborhoods (which
duplicates are the "hubs" a survivor-selection policy should prefer) —
the second iterative-graph operator next to dedup's connected
components (`dedup.py`), sharing the same LSH edge set.

Determinism across engines is the interesting problem: float PageRank
sums neighbor contributions in nondeterministic order, so Spark and
DuckDB can differ in the last ulp and a rounded comparison is fragile
(the q11 lesson). This implementation instead defines FIXED-POINT
PageRank: scores are bigint micro-units (SCALE = 1e12), every division
is integer `div`, every sum is an exact bigint sum — the algorithm is
bit-identical in any engine and the oracle comparison is exact, not
tolerance-based. Fixed iteration count keeps the oracle expressible as
unrolled CTEs (no recursion, no convergence test).

Scale: per iteration the edge table shuffles twice (join scores on
src, re-aggregate on dst) — the canonical distributed-PageRank shape;
scores/degrees are node-sized, edges dominate. The single driver-side
scalar is the node COUNT (one long). Iterations are a Python loop over
DataFrames — the lazy plan unrolls exactly like the SQL CTEs do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.operators.dedup import (
    _materialize,
    _minhash_lsh_sql,
    minhash_lsh_candidates,
)
from spec_search_spark.session import tune

SCALE = 1_000_000_000_000  # bigint micro-units: 1.0 == 1e12
DAMP_NUM = 85  # damping 0.85 as an integer percentage
PR_ITERS = 3


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (SCALE-scaled bigints, `div` arithmetic,
    PR_ITERS unrolled rounds) over the undirected MinHash-LSH candidate
    graph. Vertices = docs with ≥1 candidate edge (undirected ⇒ no
    dangling mass). Returns (doc_id, deg, pr_fixed)."""
    tune(spark)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _EDGES:
        edges, deg = _EDGES[key]
    else:
        pairs = minhash_lsh_candidates(spark, sf_dir)
        edges = _materialize(
            pairs.select(F.col("doc1").alias("a"), F.col("doc2").alias("b")).unionByName(
                pairs.select(F.col("doc2").alias("a"), F.col("doc1").alias("b"))
            )
        )
        deg = _materialize(
            edges.groupBy(F.col("a").alias("doc_id")).agg(
                F.count(F.lit(1)).alias("deg")
            )
        )
        _EDGES[key] = (edges, deg)
    n_nodes = deg.count()  # bounded driver scalar (one long)
    base = SCALE // n_nodes
    teleport = (15 * base) // 100

    pr = deg.select("doc_id", F.lit(base).cast("bigint").alias("pr"))
    for i in range(PR_ITERS):
        contrib = (
            edges.join(pr.join(deg, "doc_id"), edges.a == F.col("doc_id"))
            .select(F.col("b").alias("dst"), F.expr("pr div deg").alias("c"))
        )
        s = contrib.groupBy(F.col("dst").alias("doc_id")).agg(F.sum("c").alias("s"))
        pr = deg.join(s, "doc_id", "left").select(
            "doc_id",
            (
                F.lit(teleport)
                + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div 100")
            ).cast("bigint").alias("pr"),
        )
        if i < PR_ITERS - 1:
            # break the growing lineage: each round reads the
            # materialized previous scores, not the whole replayed plan
            pr = _materialize(pr)
    return (
        deg.join(pr, "doc_id")
        .select("doc_id", "deg", F.col("pr").alias("pr_fixed"))
        .orderBy("doc_id")
    )


def _pagerank_sql() -> str:
    ctes = [
        f"pairs AS ({_minhash_lsh_sql()})",
        "edges AS (SELECT doc1 AS a, doc2 AS b FROM pairs"
        " UNION ALL SELECT doc2, doc1 FROM pairs)",
        "deg AS (SELECT a AS doc_id, COUNT(*) AS deg FROM edges GROUP BY a)",
        "n AS (SELECT COUNT(*) AS c FROM deg)",
        f"pr0 AS (SELECT doc_id, CAST({SCALE} // c AS BIGINT) AS pr FROM deg, n)",
    ]
    for i in range(PR_ITERS):
        prev = f"pr{i}"
        cur = f"pr{i + 1}"
        ctes.append(
            f"""{cur} AS (
  SELECT d.doc_id,
         CAST((15 * ({SCALE} // n.c)) // 100
              + ({DAMP_NUM} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM deg d CROSS JOIN n
  LEFT JOIN (SELECT e.b AS doc_id, SUM(p.pr // dg.deg) AS s
             FROM edges e
             JOIN {prev} p ON p.doc_id = e.a
             JOIN deg dg ON dg.doc_id = e.a
             GROUP BY e.b) s ON s.doc_id = d.doc_id)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT d.doc_id, d.deg, p.pr AS pr_fixed
FROM deg d JOIN pr{PR_ITERS} p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


_EDGES: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


QUERIES = {
    "graph_pagerank": graph_pagerank,
}

ORACLES = {
    "graph_pagerank": _pagerank_sql(),
}
