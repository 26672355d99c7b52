"""Product Quantization ANN (Jégou et al., "Product Quantization for
Nearest Neighbor Search", PAMI 2011) — the missing member of the repo's
compression family: SQ8 (`vector_quant.py`) compresses VALUES, IVF
(`ivf.py`) prunes PARTITIONS, PQ compresses the GEOMETRY: 64-dim float
vectors become M_SUB=8 int4-range codes (8 bytes/vector, 32× smaller),
searched without decompression via an ADC lookup-table scan.

Everything is DataFrame-native; no driver-side training:

- **train**: each vector explodes into M_SUB (sub, subvector) rows; one
  Lloyd's loop (same contract as `operators/kmeans.py` — broadcast
  codebook join, row_number winner on rounded distances, posexplode
  partial+final per-dim means, 6dp codebook rounding per iteration as
  the cross-engine determinism anchor) runs over ALL subspaces at once,
  keyed by (sub, code): one shuffle per step trains all 8 codebooks.
- **encode**: final per-(vec, sub) nearest code, pivoted to an
  array<int> of length M_SUB per vector (sort_array+collect_list).
- **ADC search**: the query's 8×16 lookup table of subspace distances
  is ONE broadcast row (the bloom-filter-as-data pattern,
  runtime_filter.py); each vector's approximate distance is a
  left-to-right `aggregate` fold over its codes — bit-identical to the
  DuckDB `list_reduce`, no float-order ambiguity. Top CAND_K candidates
  by (rounded approx, vec_id) via TakeOrderedAndProject, then exact
  re-rank of only those candidates (the two-phase shape shared with
  `vector_quant.ann_int8_rerank`).

At 100 TB: training would sample (the FAISS norm) but KEEPS this plan;
the scan reads 8-byte codes instead of 256-byte vectors — memory
bandwidth, not compute, is the ANN bottleneck at scale, which is why
PQ wins. The DuckDB oracle unrolls the training loop into CTEs and
reproduces the ADC fold exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import prune_memo
from spec_search_spark.functions.vector import l2_squared, l2_squared_sql

M_SUB = 8          # subspaces
SUB_DIM = 8        # dims per subspace (embeddings are 64-dim)
K_CODES = 16       # codes per subspace codebook (int4 range)
N_PQ_ITERS = 2     # Lloyd iterations per subspace
# ADC candidates kept for exact re-rank — the recall/cost dial. The
# test corpus is near-random 64-dim noise (distance gaps ~0.1 vs
# quantization error ~0.3 — PQ's adversarial case), so the true top-10
# spread across ADC ranks up to ~100; real clustered corpora need far
# less. tests/test_pq.py pins recall ≥ 0.7 at this setting.
CAND_K = 100
TOP_K = 10
QUERY_VEC_ID = 0   # deterministic probe: this vector is the query


def _subvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub, sv): every vector split into M_SUB subvectors."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    pieces = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice("e", s * SUB_DIM + 1, SUB_DIM).alias("sv"),
            )
            for s in range(M_SUB)
        ]
    )
    return emb.select("vec_id", F.explode(pieces).alias("p")).select(
        "vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv")
    )


def _init_codebook(sv: DataFrame) -> DataFrame:
    """(sub, code, c): the K_CODES lowest vec_ids seed every subspace."""
    w = Window.partitionBy("sub").orderBy("vec_id")
    return (
        sv.withColumn("code", F.row_number().over(w) - 1)
        .filter(F.col("code") < K_CODES)
        .select("sub", "code", F.col("sv").alias("c"))
    )


def _assign_codes(sv: DataFrame, book: DataFrame) -> DataFrame:
    """(vec_id, sub, sv, code, dist2): nearest code per (vector, sub) —
    equi-join on sub (the codebook side is M_SUB*K_CODES rows,
    broadcast), winner by rounded distance + code tiebreak."""
    d = sv.join(F.broadcast(book), "sub").select(
        "vec_id",
        "sub",
        "sv",
        "code",
        F.round(l2_squared(F.col("sv"), F.col("c")), 6).alias("dist2"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy("dist2", "code")
    return (
        d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


def _update_codebook(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    means = (
        assigned.select("sub", "code", F.posexplode("sv").alias("dim", "val"))
        .groupBy("sub", "code", "dim")
        .agg(F.round(F.avg("val"), 6).alias("val"))
    )
    new = means.groupBy("sub", "code").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "val"))), lambda s: s["val"]
        ).alias("c_new")
    )
    return prev.join(new, ["sub", "code"], "left").select(
        "sub", "code", F.coalesce("c_new", "c").alias("c")
    )


_BOOK_MEMO: dict = {}


def _trained_book(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(sv, codebook) with the TRAINING LOOP memoized per (session,
    corpus) — the kmeans.py/similarity.py session-memo pattern. Only
    the model is memoized; encode stays a live one-pass plan so
    consumers keep the broadcast-join shape the plan audit pins."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BOOK_MEMO:
        return _BOOK_MEMO[key]
    sv = _subvecs(spark, sf_dir).localCheckpoint(eager=True)
    book = _init_codebook(sv).localCheckpoint(eager=True)
    for _ in range(N_PQ_ITERS):
        assigned = _assign_codes(sv, book)
        book = _update_codebook(assigned, book).localCheckpoint(eager=True)
    prune_memo(_BOOK_MEMO, key[0])
    _BOOK_MEMO[key] = (sv, book)
    return _BOOK_MEMO[key]


def _trained(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(codebook, codes): trained codebook and final per-vector codes."""
    sv, book = _trained_book(spark, sf_dir)
    codes = (
        _assign_codes(sv, book)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"].cast("long"),  # match the oracle's BIGINT codes
            ).alias("codes")
        )
    )
    return book, codes


def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector as M_SUB codebook codes.
    Output: (vec_id, codes array<int>)."""
    _, codes = _trained(spark, sf_dir)
    return codes


def pq_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase PQ search for the QUERY_VEC_ID probe: ADC scan over
    8-byte codes → CAND_K candidates → exact re-rank → TOP_K.
    Output: (vec_id, approx_dist2, dist2) — approx from the LUT fold,
    dist2 exact."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    book, codes = _trained(spark, sf_dir)

    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("q"))

    # 8×16 LUT as ONE broadcast row: lut[sub*K_CODES + code] =
    # l2(query_subvec, codebook_entry), rounded — the same one-row
    # filter-as-data layout as runtime_filter.bloom_build.
    lut_entries = book.crossJoin(F.broadcast(q)).select(
        (F.col("sub") * K_CODES + F.col("code")).alias("idx"),
        F.round(
            l2_squared(
                F.expr(f"slice(q, sub * {SUB_DIM} + 1, {SUB_DIM})"), F.col("c")
            ),
            6,
        ).alias("d"),
    )
    lut = lut_entries.agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "d"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(M_SUB * K_CODES - 1)),
            lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
        ).alias("lut")
    )

    # ADC: left-to-right fold over the codes — order-deterministic, so
    # bit-identical to the oracle's list_reduce
    approx = codes.crossJoin(F.broadcast(lut)).select(
        "vec_id",
        F.round(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(M_SUB - 1)),
                F.lit(0.0),
                lambda acc, s: acc
                + F.element_at(
                    "lut", (s * K_CODES + F.element_at("codes", s + 1) + 1).cast("int")
                ),
            ),
            6,
        ).alias("approx_dist2"),
    )
    cands = approx.orderBy("approx_dist2", "vec_id").limit(CAND_K)

    # exact re-rank of candidates only
    reranked = (
        cands.join(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "approx_dist2",
            F.round(l2_squared(F.col("e"), F.col("q")), 6).alias("dist2"),
        )
    )
    return reranked.orderBy("dist2", "vec_id").limit(TOP_K)


# ---------------------------------------------------------------------------
# DuckDB oracles: identical algorithm, training loop unrolled.
# ---------------------------------------------------------------------------

def _pq_ctes() -> str:
    sub_slice = f"e[s * {SUB_DIM} + 1 : s * {SUB_DIM} + {SUB_DIM}]"
    parts = [
        "emb AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e"
        " FROM embeddings)",
        f"sv AS (SELECT vec_id, s AS sub, {sub_slice} AS sv"
        f" FROM emb, LATERAL unnest(range(0, {M_SUB})) AS t(s))",
        f"b0 AS (SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1"
        f" AS code, sv AS c FROM sv"
        f" QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= {K_CODES})",
    ]
    prev = "b0"
    for i in range(1, N_PQ_ITERS + 1):
        parts.append(
            f"d{i} AS (SELECT sv.vec_id, sv.sub, sv.sv, {prev}.code,"
            f" round({l2_squared_sql('sv.sv', f'{prev}.c')}, 6) AS dist2"
            f" FROM sv JOIN {prev} ON sv.sub = {prev}.sub)"
        )
        parts.append(
            f"a{i} AS (SELECT vec_id, sub, sv, code FROM d{i}"
            f" QUALIFY row_number() OVER (PARTITION BY vec_id, sub"
            f" ORDER BY dist2, code) = 1)"
        )
        parts.append(
            f"m{i} AS (SELECT sub, code, i AS dim, round(avg(sv[i]), 6) AS val"
            f" FROM a{i}, LATERAL unnest(range(1, {SUB_DIM} + 1)) AS t(i)"
            f" GROUP BY sub, code, i)"
        )
        parts.append(
            f"u{i} AS (SELECT sub, code, list(val ORDER BY dim) AS c_new"
            f" FROM m{i} GROUP BY sub, code)"
        )
        parts.append(
            f"b{i} AS (SELECT p.sub, p.code, coalesce(u.c_new, p.c) AS c"
            f" FROM {prev} p LEFT JOIN u{i} u ON p.sub = u.sub AND p.code = u.code)"
        )
        prev = f"b{i}"
    parts.append(
        f"df AS (SELECT sv.vec_id, sv.sub, {prev}.code,"
        f" round({l2_squared_sql('sv.sv', f'{prev}.c')}, 6) AS dist2"
        f" FROM sv JOIN {prev} ON sv.sub = {prev}.sub)"
    )
    parts.append(
        "af AS (SELECT vec_id, sub, code FROM df"
        " QUALIFY row_number() OVER (PARTITION BY vec_id, sub"
        " ORDER BY dist2, code) = 1)"
    )
    parts.append(
        "codes AS (SELECT vec_id, list(code ORDER BY sub) AS codes"
        " FROM af GROUP BY vec_id)"
    )
    return "WITH " + ",\n".join(parts), prev


_CTES, _FINAL_BOOK = _pq_ctes()

PQ_ENCODE_SQL = f"""
{_CTES}
SELECT vec_id, codes FROM codes
"""

_Q_SLICE = f"q.e[sub * {SUB_DIM} + 1 : sub * {SUB_DIM} + {SUB_DIM}]"

PQ_ANN_SQL = f"""
{_CTES},
q AS (SELECT e FROM emb WHERE vec_id = {QUERY_VEC_ID}),
lut AS (
  SELECT b.sub * {K_CODES} + b.code AS idx,
         round({l2_squared_sql(_Q_SLICE, 'b.c')}, 6) AS d
  FROM {_FINAL_BOOK} b, q
),
lut_arr AS (
  SELECT list(d ORDER BY idx) AS lut FROM lut
),
adc AS (
  SELECT c.vec_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(0, {M_SUB}),
             s -> la.lut[s * {K_CODES} + c.codes[s + 1] + 1])),
           (acc, x) -> acc + x), 6) AS approx_dist2
  FROM codes c, lut_arr la
),
cand AS (
  SELECT vec_id, approx_dist2 FROM adc ORDER BY approx_dist2, vec_id LIMIT {CAND_K}
)
SELECT cand.vec_id, cand.approx_dist2,
       round({l2_squared_sql('emb.e', 'q.e')}, 6) AS dist2
FROM cand JOIN emb ON cand.vec_id = emb.vec_id, q
ORDER BY dist2, cand.vec_id LIMIT {TOP_K}
"""

QUERIES = {
    "pq_encode": pq_encode,
    "pq_ann_search": pq_ann_search,
}

ORACLES = {
    "pq_encode": PQ_ENCODE_SQL,
    "pq_ann_search": PQ_ANN_SQL,
}
