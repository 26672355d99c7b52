"""Graph ANN: a k-NN-graph index built IN-PLAN (NN-descent over
IVF-style cell candidates) plus a beam-search query walk — the
HNSW-class capability of the reference (Chroma's hnswlib index,
`/root/reference/app.py:39`) re-expressed as data + joins instead of
a pointer-chasing in-memory graph.

Why this shape (r9 verdict, next-round task 1): hnswlib builds a
navigable graph by incremental insertion with per-node neighbor lists
— inherently sequential and memory-resident, the wrong shape for a
distributed engine. The Spark-native equivalent keeps the SAME
artifact (a bounded-degree k-NN graph, node-sized state like
PageRank's scores) but builds it with set-at-a-time operators:

1. **Coarse cells** (the IVF seam): every vector is assigned to its
   CELL_ASSIGN nearest of k_cells = max(K_CELLS_MIN, N/TARGET_CELL)
   fixed seed vectors (seeds = the first k_cells corpus vectors by
   vec_id — the same deterministic seeding convention as
   `ivf.train_centroids`, and unlike trained centroids it is
   SQL-expressible, so the WHOLE build gets a DuckDB value oracle,
   not a rows-only check). Multi-assignment (2 cells) puts
   cell-boundary neighbors into the same block.
2. **Seed edges**: within-cell candidate pairs → per-node top-M by
   (d2_e4, id). Quadratic only within a cell, and the cell COUNT
   scales with the corpus (k_cells ∝ N/TARGET_CELL), so expected cell
   size stays ~TARGET_CELL·CELL_ASSIGN and Σ cell² stays LINEAR in N —
   the banded-LSH argument `dedup.minhash_lsh_candidates` relies on.
   Measured (SCALE.md r10 curves): the r10-initial fixed-16-cell
   build scaled α≈2.1 cold (13s → 1364s at sf0.1→1.0); the dynamic
   cell count is the fix, not a docstring promise. At every
   driver-checked sf (N ≤ 2000 = 16·TARGET_CELL) k_cells still
   resolves to 16, so oracle values are unchanged there.
3. **NN-descent refinement** (NND_ROUNDS unrolled rounds, like
   PageRank's fixed PR_ITERS): general neighbors = out ∪ in edges;
   propose every neighbor-of-neighbor pair; keep per-node top-M.
   Per-round state is ≤ N×M edges, per-node candidate fan-out ≤
   (2M)² — never all-pairs, every join an equi-join on a node id.
4. **Beam search**: seed the beam with the probe's graph neighbors,
   then HOPS rounds of expand-neighbors → score → keep per-probe
   top-BEAM; answer = top-K over everything visited. Fixed hop count
   keeps the oracle expressible as unrolled CTEs (no convergence
   test), exactly like `graph.graph_pagerank`.

Determinism across engines: every distance is collapsed to bigint
units d2_e4 = CAST(round(l2² × 1e4) AS BIGINT) immediately after the
one shared IEEE fold (`l2_squared` / `l2_squared_sql` fold the
identical sequence), and every selection orders by (d2_e4, id) —
integer comparisons only, so Spark and DuckDB replay the identical
graph, beam, and result (the fixed-point-PageRank philosophy).

Honest quality note (measured at sf0.1, see tests/test_graph_ann.py
and SCALE.md): the synthetic embeddings are near-i.i.d. unit vectors
(top-10 neighbor label agreement 0.096, neighbor-of-neighbor overlap
0.035) — the known worst case for graph ANN. Recall@10 on the
registered probes (vec_id < N_PROBES, which are also cell seeds, the
same convention the IVF arm uses) is 1.0 at ~256 distance evals per
probe — above the IVF arm (0.98) at nprobe=1's budget (~250) and half
nprobe=2's (~500). On probes disjoint from the seeds, recall is ~0.7:
the random-vector ceiling, not a plan defect; on corpus text
embeddings (clustered) both numbers rise together.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.vector import l2_squared, l2_squared_sql
from spec_search_spark.session import prune_memo, tune


def _pin(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint: materialize NOW and TRUNCATE lineage.
    The build is iterative and its artifacts are re-embedded in every
    later search/report plan — with plain persist the analyzed tree
    keeps the full unrolled lineage and the driver re-canonicalizes it
    per query (measured: a memoized 50-row answer still cost ~1.5 s to
    read). A LogicalRDD makes downstream plans tiny."""
    return df.localCheckpoint(eager=True)

K_CELLS_MIN = 16  # floor of the coarse Voronoi cell count
TARGET_CELL = 125  # target vectors per cell (×CELL_ASSIGN memberships)


def _k_cells(n: int) -> int:
    """Cell count for an N-vector corpus: N/TARGET_CELL keeps cell
    size (and therefore the within-cell quadratic seed cost per cell)
    constant as the corpus grows — total seed-pair cost linear in N."""
    return max(K_CELLS_MIN, n // TARGET_CELL)


#: SQL mirror of the dynamic cell count (scalar subquery — DuckDB
#: computes the same max(floor) the Spark side gets from its driver
#: count)
K_CELLS_SQL = (
    f"(SELECT GREATEST({K_CELLS_MIN}, count(*) // {TARGET_CELL}) FROM embeddings)"
)
CELL_ASSIGN = 2  # each vector joins its 2 nearest cells
GRAPH_M = 12  # graph out-degree (per-node neighbor-list size)
NND_ROUNDS = 1  # NN-descent refinement rounds (unrolled)
BEAM = 20  # beam width of the query walk
HOPS = 2  # beam-expansion rounds (unrolled)
TOP_K = 10
N_PROBES = 5  # probes = vec_id < 5 (repo-wide convention)


def _d2e4(a: Column, b: Column) -> Column:
    """Exact-integer distance: one shared IEEE fold, one rounding."""
    return F.round(l2_squared(a, b) * F.lit(1e4)).cast("bigint")


def _d2e4_sql(a: str, b: str) -> str:
    return f"CAST(round({l2_squared_sql(a, b)} * 1e4) AS BIGINT)"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "embeddings")


def _cell_memb(vectors: DataFrame, emb: DataFrame, k_cells: int) -> DataFrame:
    """(vec_id, cid): each vector's CELL_ASSIGN nearest of the k_cells
    fixed seed vectors (seeds always come from the CORPUS table `emb`;
    `vectors` may be the corpus itself or a delta batch). The seed
    table is k_cells rows — always the broadcast side."""
    seeds = emb.filter(F.col("vec_id") < k_cells).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    wc = W.partitionBy("vec_id").orderBy(F.asc("cd2"), F.asc("cid"))
    return (
        vectors.crossJoin(F.broadcast(seeds))  # bounded: k_cells rows
        .select(
            "vec_id", "cid", _d2e4(F.col("embedding"), F.col("cvec")).alias("cd2")
        )
        .withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= CELL_ASSIGN)
        .select("vec_id", "cid")
    )


def _topm(pairs_with_dist: DataFrame, m: int = GRAPH_M) -> DataFrame:
    """Per-src top-m by (d2_e4, dst): (src, dst, d2_e4, rank). The
    window partitions by src — every node is a key, so the shuffle is
    corpus-spread, never single-task."""
    w = W.partitionBy("src").orderBy(F.asc("d2_e4"), F.asc("dst"))
    return (
        pairs_with_dist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
    )


def _with_dist(pairs: DataFrame, emb: DataFrame) -> DataFrame:
    """(src, dst) → (src, dst, d2_e4) via two id equi-joins against the
    embedding table (shuffle on id at scale; AQE broadcasts when the
    corpus side is small)."""
    ea = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("esrc"))
    eb = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("edst"))
    return (
        pairs.join(ea, "src")
        .join(eb, "dst")
        .select("src", "dst", _d2e4(F.col("esrc"), F.col("edst")).alias("d2_e4"))
    )


#: (applicationId, sf_dir) → (materialized refined graph (src, dst,
#: d2_e4, rank), materialized symmetric adjacency (src, dst),
#: materialized cell membership (vec_id, cid), k_cells). Deployment
#: semantics: a graph index is built once and persisted (hnswlib
#: serializes its graph the same way); repeated searches/inserts in
#: one session hit the built artifacts — including the cell count, so
#: a delta insert never re-counts the corpus (and can never route
#: through cells inconsistent with the frozen membership).
_GRAPH: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame, int]] = {}


def build_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once accessor for the refined k-NN graph."""
    return _built(spark, sf_dir)[0]


def _built(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _GRAPH:
        return _GRAPH[key]
    edges, adj, memb, k_cells = _build_edges(spark, sf_dir, pin=_pin)
    prune_memo(_GRAPH, key[0])
    _GRAPH[key] = (edges, adj, memb, k_cells)
    return _GRAPH[key]


def _build_edges(
    spark: SparkSession, sf_dir: str, pin
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """The build lineage, parameterized on the materialization policy:
    production passes `_pin` (eager localCheckpoint per stage);
    `plans/audit.py` passes identity to inspect the FULL un-truncated
    plan (a checkpointed DF reads as a bare LogicalRDD, which would
    blind the audit to the build's joins and windows)."""
    emb = _emb(spark, sf_dir)

    # 1. coarse cells: nearest CELL_ASSIGN of the corpus-proportional
    # k_cells fixed seeds — pinned with the graph (delta inserts route
    # through it). The count is the one driver-side scalar (the
    # PageRank n_nodes pattern).
    k_cells = _k_cells(emb.count())
    memb = pin(_cell_memb(emb, emb, k_cells))

    # 2. seed edges: within-cell pairs (equi-join on the cell id — the
    # quadratic stays inside bounded cells), per-node top-M
    a = memb.select("cid", F.col("vec_id").alias("src"))
    b = memb.select("cid", F.col("vec_id").alias("dst"))
    seedpairs = (
        a.join(b, "cid")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()  # a pair sharing both cells appears once
    )
    edges = pin(_topm(_with_dist(seedpairs, emb)))

    # 3. NN-descent rounds: neighbor-of-neighbor proposals, re-prune.
    # The round adjacency reads the checkpointed edges, so its two
    # self-join branches recompute only a node-sized union+distinct —
    # cheaper than another eager checkpoint.
    for _ in range(NND_ROUNDS):
        adj = (
            edges.select("src", "dst").union(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
        )
        non = (
            adj.select(F.col("src").alias("v"), F.col("dst").alias("u"))
            .join(adj.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v")
            .filter(F.col("u") != F.col("w"))
            .select(F.col("u").alias("src"), F.col("w").alias("dst"))
        )
        cand = non.union(edges.select("src", "dst")).distinct()
        edges = pin(_topm(_with_dist(cand, emb)))

    # the symmetric adjacency every search walks — built and pinned
    # once with the graph (the search-time artifact, like the IVF
    # cached index)
    adj = pin(
        edges.select("src", "dst").union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    return edges, adj, memb, k_cells


def knn_graph_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built index as data: (src, rank, dst, d2_e4), N×GRAPH_M rows
    — what a deployment writes parquet-bucketed by src. Full DuckDB
    value oracle (the entire build chain is SQL-expressible)."""
    return build_graph(spark, sf_dir).select(
        "src", F.col("rank").cast("int").alias("rank"), "dst", "d2_e4"
    ).orderBy("src", "rank")


def _probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )


def _scored(
    cand: DataFrame, emb: DataFrame, probes: DataFrame, bcast: bool = True
) -> DataFrame:
    """(probe_id, vec_id) → + d2_e4 to the probe vector.

    `bcast` forces the probe side broadcast ONLY when it is bounded by
    construction (the N_PROBES query set). The delta-insert path passes
    False: its probe table is corpus-proportional (the delta batch),
    so the hint would grow the broadcast with N — AQE still broadcasts
    it at small scale and falls back to a shuffle join when the batch
    is genuinely large (self-review r10 finding 1)."""
    ev = emb.select("vec_id", "embedding")
    pr = F.broadcast(probes) if bcast else probes
    return (
        cand.join(ev, "vec_id")
        .join(pr, "probe_id")
        .select(
            "probe_id",
            "vec_id",
            _d2e4(F.col("embedding"), F.col("probe_vec")).alias("d2_e4"),
        )
    )


#: (applicationId, sf_dir) → cached beam-walk answer (≤ N_PROBES ×
#: TOP_K rows) — the bounded-artifact memo the recall report reads so
#: the walk executes once per session (the `ivf._EXACT_TOPK` pattern).
_SEARCH: dict[tuple[str, str], DataFrame] = {}


def graph_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beam-search walk over the built graph: top-TOP_K per probe as
    (probe_id, rn, vec_id, d2_e4). Every round is a bounded equi-join
    (≤ N_PROBES × BEAM frontier rows against the node-keyed adjacency);
    the scored tables never exceed N_PROBES × BEAM × 2·GRAPH_M rows, so
    the per-probe windows are bounded by construction.

    Plan economy: every candidate is scored ONCE (d2_e4 rides along
    through the hops — distances are deterministic per (probe, vec),
    so a plain distinct collapses re-expansions), and the visited set
    is unioned lazily and deduplicated once at the end — no per-hop
    distinct or checkpoint on the accumulator (each eager materialize
    costs ~0.8 s of fixed scheduling floor; measured 13.1 s → 6.5 s at
    sf0.1 when dropped)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _SEARCH:
        return _SEARCH[key]
    _edges, adj, _memb, _k = _built(spark, sf_dir)
    res = _pin(_search_df(spark, sf_dir, adj))  # ≤ N_PROBES × TOP_K rows
    prune_memo(_SEARCH, key[0])
    _SEARCH[key] = res
    return res


def _beam_walk(
    emb: DataFrame,
    adj: DataFrame,
    probes: DataFrame,
    vis0: DataFrame,
    bcast_probes: bool = True,
) -> DataFrame:
    """The shared walk kernel: from seed candidates `vis0` (probe_id,
    vec_id), HOPS rounds of expand-over-`adj` → score → keep per-probe
    top-BEAM; returns ALL visited candidates scored (probe_id, vec_id,
    d2_e4), deduplicated once at the end. Used by the query search
    (seeds = the probe's own graph neighbors) and the delta insert
    (seeds = the new vector's Voronoi-cell members)."""
    wb = W.partitionBy("probe_id").orderBy(F.asc("d2_e4"), F.asc("vec_id"))
    scored0 = _scored(vis0, emb, probes, bcast_probes)
    frontiers = [scored0]
    cur = (
        scored0.withColumn("brk", F.row_number().over(wb))
        .filter(F.col("brk") <= BEAM)
        .select("probe_id", "vec_id", "d2_e4")
    )
    for _ in range(HOPS):
        exp = (
            cur.join(adj, adj.src == cur.vec_id)
            .filter(F.col("dst") != F.col("probe_id"))
            .select("probe_id", F.col("dst").alias("vec_id"))
            .distinct()
        )
        sexp = _scored(exp, emb, probes, bcast_probes)
        frontiers.append(sexp)
        pool = cur.unionByName(sexp).distinct()
        cur = (
            pool.withColumn("brk", F.row_number().over(wb))
            .filter(F.col("brk") <= BEAM)
            .select("probe_id", "vec_id", "d2_e4")
        )
    vis_scored = frontiers[0]
    for df in frontiers[1:]:
        vis_scored = vis_scored.unionByName(df)
    return vis_scored.distinct()


def _search_df(spark: SparkSession, sf_dir: str, adj: DataFrame) -> DataFrame:
    """The walk lineage over a given adjacency (separated so
    `plans/audit.py` can inspect it without the memo/checkpoint)."""
    emb = _emb(spark, sf_dir)
    probes = _probes(spark, sf_dir)
    vis0 = (
        probes.join(adj, adj.src == F.col("probe_id"))
        .filter(F.col("dst") != F.col("probe_id"))
        .select("probe_id", F.col("dst").alias("vec_id"))
        .distinct()
    )
    wb = W.partitionBy("probe_id").orderBy(F.asc("d2_e4"), F.asc("vec_id"))
    return (
        _beam_walk(emb, adj, probes, vis0)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= TOP_K)
        .select("probe_id", F.col("rn").cast("int").alias("rn"), "vec_id", "d2_e4")
        .orderBy("probe_id", "rn")
    )


def graph_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the graph walk vs exact kNN under the same
    metric/rounding/tie order — `ann_recall_report`'s twin for the
    graph index, with a FULL value oracle (both arms SQL-expressible).
    Scale: the exact arm is the partial-top-k scan; the approx arm
    reads the memoized graph; the hit-join runs on ≤ N_PROBES × TOP_K
    rows."""
    from spec_search_spark.operators.similarity import partial_topk

    emb = _emb(spark, sf_dir)
    probes = _probes(spark, sf_dir)
    scored = emb.join(
        F.broadcast(probes), F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        "vec_id",
        _d2e4(F.col("embedding"), F.col("probe_vec")).alias("d2_e4"),
    )
    local = partial_topk(scored, "probe_id", ["d2_e4", "vec_id"], TOP_K)
    w = W.partitionBy("probe_id").orderBy(F.asc("d2_e4"), F.asc("vec_id"))
    exact = (
        local.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("probe_id", "vec_id")
    )
    approx = graph_ann_search(spark, sf_dir).select(
        "probe_id", "vec_id", F.lit(1).alias("hit")
    )
    n_approx = approx.groupBy("probe_id").agg(F.count(F.lit(1)).alias("n_approx"))
    return (
        exact.join(F.broadcast(approx), ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).alias("n_hits"),
        )
        .join(F.broadcast(n_approx), "probe_id", "left")
        .select(
            "probe_id",
            "n_exact",
            F.coalesce(F.col("n_approx"), F.lit(0).cast("bigint")).alias("n_approx"),
            "n_hits",
            F.round(F.col("n_hits") / float(TOP_K), 4).alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


# --- DuckDB oracles (the identical chain, unrolled CTEs) ---------------------

def _build_ctes() -> str:
    """CTE chain ending in the refined graph __e{NND_ROUNDS}(src, dst,
    d2_e4, rank). MATERIALIZED where a CTE is referenced more than once
    (the dedup lesson: inlined re-evaluation is exponential in unrolled
    iterative chains)."""
    d_ab = _d2e4_sql("ea.embedding", "eb.embedding")
    ctes = [
        f"""__seeds AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
            WHERE vec_id < {K_CELLS_SQL})""",
        f"""__cellrank AS (
  SELECT e.vec_id, s.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_d2e4_sql('e.embedding', 's.cvec')} ASC,
                                     s.cid ASC) AS crk
  FROM embeddings e, __seeds s)""",
        f"""__memb AS MATERIALIZED (
  SELECT vec_id, cid FROM __cellrank WHERE crk <= {CELL_ASSIGN})""",
        """__seedpairs AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM __memb a JOIN __memb b ON a.cid = b.cid AND a.vec_id <> b.vec_id)""",
        f"""__e0 AS MATERIALIZED (
  SELECT src, dst, d2_e4,
         row_number() OVER (PARTITION BY src ORDER BY d2_e4 ASC, dst ASC) AS rank
  FROM (SELECT p.src, p.dst, {d_ab} AS d2_e4
        FROM __seedpairs p
        JOIN embeddings ea ON ea.vec_id = p.src
        JOIN embeddings eb ON eb.vec_id = p.dst) t
  QUALIFY rank <= {GRAPH_M})""",
    ]
    for r in range(NND_ROUNDS):
        ctes += [
            f"""__adj{r} AS MATERIALIZED (
  SELECT src, dst FROM __e{r}
  UNION
  SELECT dst AS src, src AS dst FROM __e{r})""",
            f"""__r{r + 1}pairs AS (
  SELECT a.dst AS src, b.dst AS dst
  FROM __adj{r} a JOIN __adj{r} b ON a.src = b.src AND a.dst <> b.dst
  UNION
  SELECT src, dst FROM __e{r})""",
            f"""__e{r + 1} AS MATERIALIZED (
  SELECT src, dst, d2_e4,
         row_number() OVER (PARTITION BY src ORDER BY d2_e4 ASC, dst ASC) AS rank
  FROM (SELECT p.src, p.dst, {d_ab} AS d2_e4
        FROM __r{r + 1}pairs p
        JOIN embeddings ea ON ea.vec_id = p.src
        JOIN embeddings eb ON eb.vec_id = p.dst) t
  QUALIFY rank <= {GRAPH_M})""",
        ]
    return ",\n".join(ctes)


KNN_GRAPH_SQL = f"""
WITH {_build_ctes()}
SELECT src, CAST(rank AS INT) AS rank, dst, d2_e4
FROM __e{NND_ROUNDS}
ORDER BY src, rank
"""


def _search_ctes() -> str:
    """Beam-walk CTEs over __e{NND_ROUNDS}; ends in __res."""
    d_pe = _d2e4_sql("e.embedding", "p.probe_vec")
    score_rank = f"""
  FROM (SELECT u.probe_id, u.vec_id,
               row_number() OVER (PARTITION BY u.probe_id
                                  ORDER BY {d_pe} ASC, u.vec_id ASC) AS brk
        FROM {{pool}} u
        JOIN embeddings e ON e.vec_id = u.vec_id
        JOIN __probes p ON p.probe_id = u.probe_id) t
  WHERE brk <= {BEAM}"""
    ctes = [
        f"""__adjq AS MATERIALIZED (
  SELECT src, dst FROM __e{NND_ROUNDS}
  UNION
  SELECT dst AS src, src AS dst FROM __e{NND_ROUNDS})""",
        f"""__probes AS (SELECT vec_id AS probe_id, embedding AS probe_vec
             FROM embeddings WHERE vec_id < {N_PROBES})""",
        """__vis0 AS MATERIALIZED (
  SELECT DISTINCT p.probe_id, a.dst AS vec_id
  FROM __probes p JOIN __adjq a ON a.src = p.probe_id
  WHERE a.dst <> p.probe_id)""",
        f"""__cur0 AS MATERIALIZED (
  SELECT probe_id, vec_id{score_rank.format(pool='__vis0')})""",
    ]
    for h in range(HOPS):
        pool = (
            f"(SELECT probe_id, vec_id FROM __cur{h}\n"
            f"              UNION\n"
            f"              SELECT probe_id, vec_id FROM __exp{h})"
        )
        ctes += [
            f"""__exp{h} AS (
  SELECT DISTINCT c.probe_id, a.dst AS vec_id
  FROM __cur{h} c JOIN __adjq a ON a.src = c.vec_id
  WHERE a.dst <> c.probe_id)""",
            f"""__vis{h + 1} AS MATERIALIZED (
  SELECT probe_id, vec_id FROM __vis{h}
  UNION
  SELECT probe_id, vec_id FROM __exp{h})""",
            f"""__cur{h + 1} AS MATERIALIZED (
  SELECT probe_id, vec_id{score_rank.format(pool=pool)})""",
        ]
    ctes.append(
        f"""__res AS (
  SELECT probe_id, CAST(rn AS INT) AS rn, vec_id, d2_e4
  FROM (SELECT v.probe_id, v.vec_id, {d_pe} AS d2_e4,
               row_number() OVER (PARTITION BY v.probe_id
                                  ORDER BY {d_pe} ASC, v.vec_id ASC) AS rn
        FROM __vis{HOPS} v
        JOIN embeddings e ON e.vec_id = v.vec_id
        JOIN __probes p ON p.probe_id = v.probe_id) t
  WHERE rn <= {TOP_K})"""
    )
    return ",\n".join(ctes)


GRAPH_SEARCH_SQL = f"""
WITH {_build_ctes()},
{_search_ctes()}
SELECT probe_id, rn, vec_id, d2_e4 FROM __res ORDER BY probe_id, rn
"""


GRAPH_RECALL_SQL = f"""
WITH {_build_ctes()},
{_search_ctes()},
__exscored AS (
  SELECT p.probe_id, e.vec_id,
         {_d2e4_sql('e.embedding', 'p.probe_vec')} AS d2_e4
  FROM embeddings e JOIN __probes p ON e.vec_id <> p.probe_id),
__exact AS (
  SELECT probe_id, vec_id
  FROM (SELECT probe_id, vec_id,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY d2_e4 ASC, vec_id ASC) AS rn
        FROM __exscored) t
  WHERE rn <= {TOP_K}),
__napp AS (SELECT probe_id, COUNT(*) AS n_approx FROM __res GROUP BY probe_id)
SELECT g.probe_id, g.n_exact,
       COALESCE(__napp.n_approx, 0) AS n_approx, g.n_hits,
       round(g.n_hits / {float(TOP_K)}, 4) AS recall_at_k
FROM (SELECT x.probe_id, COUNT(*) AS n_exact,
             CAST(SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM __exact x LEFT JOIN __res r
        ON r.probe_id = x.probe_id AND r.vec_id = x.vec_id
      GROUP BY x.probe_id) g
LEFT JOIN __napp ON __napp.probe_id = g.probe_id
ORDER BY g.probe_id
"""


# --- delta insert: hnswlib add() as set-at-a-time joins ----------------------

DELTA_MOD = 10  # synthetic nightly batch: clones of vec_id % 10 == 3
DELTA_RESIDUE = 3  # (the ivf_delta_upsert convention: disjoint negative ids)


def knn_graph_delta_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance — hnswlib's `add()` path
    re-expressed over the FROZEN graph, cost ∝ delta (the graph twin
    of `ivf.ivf_delta_upsert`): each new vector (clones of the
    DELTA_RESIDUE class under negative ids) (1) routes through the
    frozen Voronoi cells, (2) beam-walks the base graph from its cell
    members to find its GRAPH_M nearest, (3) adds its out-edges, and
    (4) appends reverse edges to the touched base nodes, which then
    re-prune back to GRAPH_M (the hnswlib shrink step).

    Output: the post-insert adjacency restricted to delta-incident
    rows — every delta node's out-list (rank 1..GRAPH_M) plus every
    base→delta edge that SURVIVES the shrink. Full DuckDB value
    oracle. Built-in invariant the oracle verifies by value: a clone's
    rank-1 neighbor is its base twin at d2_e4 = 0 (identical vector →
    identical cells → the twin is always a seed candidate)."""
    emb = _emb(spark, sf_dir)
    edges, adj, memb, k_cells = _built(spark, sf_dir)
    is_delta = F.pmod(F.col("vec_id"), F.lit(DELTA_MOD)) == DELTA_RESIDUE
    dprobes = emb.filter(is_delta).select(
        (-F.col("vec_id") - 1).alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    dcells = _cell_memb(
        emb.filter(is_delta).select(
            (-F.col("vec_id") - 1).alias("vec_id"), "embedding"
        ),
        emb,
        k_cells,  # the frozen build-time cell count (memoized)
    ).select(F.col("vec_id").alias("probe_id"), "cid")
    vis0 = (
        dcells.join(memb, "cid")
        .select("probe_id", "vec_id")
        .distinct()
    )
    wb = W.partitionBy("probe_id").orderBy(F.asc("d2_e4"), F.asc("vec_id"))
    dout = (
        _beam_walk(emb, adj, dprobes, vis0, bcast_probes=False)
        .withColumn("rank", F.row_number().over(wb))
        .filter(F.col("rank") <= GRAPH_M)
        .select(
            F.col("probe_id").alias("src"),
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("dst"),
            "d2_e4",
        )
    )
    # n_delta × GRAPH_M rows, consumed three times (output, reverse
    # edges, shrink) — pin once or the whole walk re-executes per
    # consumer (measured 24 s → ~10 s at sf0.1)
    dout = _pin(dout)
    rev = dout.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "d2_e4"
    )
    affected = rev.select("src").distinct()
    ws = W.partitionBy("src").orderBy(F.asc("d2_e4"), F.asc("dst"))
    base_new = (
        edges.join(affected, "src")
        .select("src", "dst", "d2_e4")
        .unionByName(rev)
        .withColumn("rank", F.row_number().over(ws))
        .filter((F.col("rank") <= GRAPH_M) & (F.col("dst") < 0))
        .select("src", F.col("rank").cast("int").alias("rank"), "dst", "d2_e4")
    )
    return dout.unionByName(base_new).orderBy("src", "rank")


def _insert_ctes() -> str:
    """Delta-insert CTEs over the __e{NND_ROUNDS} build chain
    (d-prefixed twins of the _search_ctes walk)."""
    d_pe = _d2e4_sql("e.embedding", "p.probe_vec")
    score_rank = f"""
  FROM (SELECT u.probe_id, u.vec_id,
               row_number() OVER (PARTITION BY u.probe_id
                                  ORDER BY {d_pe} ASC, u.vec_id ASC) AS brk
        FROM {{pool}} u
        JOIN embeddings e ON e.vec_id = u.vec_id
        JOIN __dprobes p ON p.probe_id = u.probe_id) t
  WHERE brk <= {BEAM}"""
    ctes = [
        f"""__iadj AS MATERIALIZED (
  SELECT src, dst FROM __e{NND_ROUNDS}
  UNION
  SELECT dst AS src, src AS dst FROM __e{NND_ROUNDS})""",
        f"""__dprobes AS MATERIALIZED (
  SELECT -vec_id - 1 AS probe_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id % {DELTA_MOD} = {DELTA_RESIDUE})""",
        f"""__dcell AS (
  SELECT probe_id, cid
  FROM (SELECT d.probe_id, s.cid,
               row_number() OVER (PARTITION BY d.probe_id
                                  ORDER BY {_d2e4_sql('d.probe_vec', 's.cvec')} ASC,
                                           s.cid ASC) AS crk
        FROM __dprobes d, __seeds s) t
  WHERE crk <= {CELL_ASSIGN})""",
        """__dvis0 AS MATERIALIZED (
  SELECT DISTINCT c.probe_id, m.vec_id
  FROM __dcell c JOIN __memb m ON m.cid = c.cid)""",
        f"""__dcur0 AS MATERIALIZED (
  SELECT probe_id, vec_id{score_rank.format(pool='__dvis0')})""",
    ]
    for h in range(HOPS):
        pool = (
            f"(SELECT probe_id, vec_id FROM __dcur{h}\n"
            f"              UNION\n"
            f"              SELECT probe_id, vec_id FROM __dexp{h})"
        )
        ctes += [
            f"""__dexp{h} AS (
  SELECT DISTINCT c.probe_id, a.dst AS vec_id
  FROM __dcur{h} c JOIN __iadj a ON a.src = c.vec_id
  WHERE a.dst <> c.probe_id)""",
            f"""__dvis{h + 1} AS MATERIALIZED (
  SELECT probe_id, vec_id FROM __dvis{h}
  UNION
  SELECT probe_id, vec_id FROM __dexp{h})""",
            f"""__dcur{h + 1} AS MATERIALIZED (
  SELECT probe_id, vec_id{score_rank.format(pool=pool)})""",
        ]
    ctes += [
        f"""__dout AS MATERIALIZED (
  SELECT probe_id AS src, CAST(rank AS INT) AS rank, vec_id AS dst, d2_e4
  FROM (SELECT v.probe_id, v.vec_id, {d_pe} AS d2_e4,
               row_number() OVER (PARTITION BY v.probe_id
                                  ORDER BY {d_pe} ASC, v.vec_id ASC) AS rank
        FROM __dvis{HOPS} v
        JOIN embeddings e ON e.vec_id = v.vec_id
        JOIN __dprobes p ON p.probe_id = v.probe_id) t
  WHERE rank <= {GRAPH_M})""",
        """__drev AS MATERIALIZED (
  SELECT dst AS src, src AS dst, d2_e4 FROM __dout)""",
        f"""__dbase AS (
  SELECT src, CAST(rank AS INT) AS rank, dst, d2_e4
  FROM (SELECT m.src, m.dst, m.d2_e4,
               row_number() OVER (PARTITION BY m.src
                                  ORDER BY m.d2_e4 ASC, m.dst ASC) AS rank
        FROM (SELECT e.src, e.dst, e.d2_e4
              FROM __e{NND_ROUNDS} e
              JOIN (SELECT DISTINCT src FROM __drev) a ON a.src = e.src
              UNION ALL
              SELECT src, dst, d2_e4 FROM __drev) m) t
  WHERE rank <= {GRAPH_M} AND dst < 0)""",
    ]
    return ",\n".join(ctes)


GRAPH_DELTA_SQL = f"""
WITH {_build_ctes()},
{_insert_ctes()}
SELECT src, rank, dst, d2_e4 FROM __dout
UNION ALL
SELECT src, rank, dst, d2_e4 FROM __dbase
ORDER BY src, rank
"""


QUERIES = {
    "knn_graph_build": knn_graph_build,
    "graph_ann_search": graph_ann_search,
    "graph_ann_recall_report": graph_ann_recall_report,
    "knn_graph_delta_insert": knn_graph_delta_insert,
}

ORACLES = {
    "knn_graph_build": KNN_GRAPH_SQL,
    "graph_ann_search": GRAPH_SEARCH_SQL,
    "graph_ann_recall_report": GRAPH_RECALL_SQL,
    "knn_graph_delta_insert": GRAPH_DELTA_SQL,
}
