"""Deduplication operator pack (north-star LLM-pipeline ops,
BASELINE.json): exact dedup, n-gram Jaccard near-dup, MinHash+LSH
banding, SimHash fingerprints + Hamming near-pairs.

The reference's only dedup is Chroma's upsert-by-composite-id
(`/root/reference/indexer.py:56`); these are the scale-out
generalizations a 100 TB training-data pipeline needs.

Scale design:
- exact dedup: hash-shuffle on an 8-byte fingerprint, never on the
  full text (shuffle bytes ∝ keys, not documents).
- Jaccard: inverted-index join on shingles (shuffle ∝ postings), NOT a
  quadratic cross-join. At 100 TB one would additionally cap hot
  shingles (drop shingles with document-frequency > cap — they only
  connect near-everything); the cap is a parameter here.
- MinHash+LSH: signatures are 16 mins computed in ONE partial+final
  aggregation over the shingle postings; banding turns near-dup search
  into an equi-join on (band_idx, band_key) — the classic
  shuffle-friendly LSH layout.
- SimHash: one 32-bit key per doc from a single aggregation; Hamming
  candidates via bit_count(xor). (At scale: block by bit-prefix
  rotations instead of the all-pairs join used at test size.)

All hashing is the shared polynomial fold (functions.text.FP_BASE/MOD)
→ bit-identical in the DuckDB oracles, which are generated from the
same Python constants below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import FP_BASE, FP_MOD, RE_TOKEN_SPLIT
from spec_search_spark.session import tune

P = FP_MOD  # 2^31-1, prime
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
# deterministic hash-family constants, shared verbatim with the SQL oracles
A_COEF = [(i * 2654435761 + 1) % P for i in range(N_HASHES)]
B_COEF = [(i * 40503 + 7) % P for i in range(N_HASHES)]

JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32
HAMMING_THRESHOLD = 3
MAX_SHINGLE_DF = 10_000  # hot-shingle cap (no-op at test scale; load-bearing at 100 TB)


# --- shared shingle machinery ----------------------------------------------

def _tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, RE_TOKEN_SPLIT)
    )


def _poly_hash(s: Column) -> Column:
    """Polynomial fold over code points — same fold as the DuckDB oracle."""
    cps = F.transform(F.regexp_extract_all(s, F.lit(r"[\s\S]"), F.lit(0)), F.ascii)
    return F.aggregate(
        cps, F.lit(0).cast("bigint"), lambda acc, c: (acc * FP_BASE + c.cast("bigint")) % FP_MOD
    )


_POLY_SQL = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(regexp_extract_all({s}, '[\\s\\S]'), c -> ord(c)::BIGINT)), "
    f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
)


def _shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles."""
    toks = _tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


_SHINGLES_SQL = """
SELECT doc_id, unnest(list_distinct(
         list_transform(range(0, greatest(len(toks) - 2, 0)),
                        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
       )) AS shingle
FROM (SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
      FROM documents) t
"""


def shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle, h) postings with the hot-shingle cap applied."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"))).alias("shingle")
    ).withColumn("h", _poly_hash(F.col("shingle")))
    hot = (
        postings.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
    )
    return postings.join(F.broadcast(hot), "shingle", "left_anti")


# --- exact dedup ------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint: canonical (min) doc per
    distinct text, with duplicate count."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", _poly_hash(F.col("text")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = f"""
SELECT {_POLY_SQL.format(s='text')} AS fp,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY fp
"""


# --- n-gram Jaccard near-dup ------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with 3-gram Jaccard ≥ threshold, via
    inverted-index join (shuffle on shingle, then on the pair)."""
    s = shingle_postings(spark, sf_dir).select("doc_id", "shingle")
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = s.alias("a")
    b = s.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n_shingles").alias("n1"))
    sz2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n_shingles").alias("n2"))
    jac = (
        common.join(F.broadcast(sz1), "doc1")
        .join(F.broadcast(sz2), "doc2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return jac.select("doc1", "doc2", "n_common", "jaccard")


NGRAM_JACCARD_SQL = f"""
WITH postings AS ({_SHINGLES_SQL}),
sizes AS (SELECT doc_id, count(*) AS n FROM postings GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_common
  FROM postings a JOIN postings b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc1, doc2, n_common,
       round(n_common::DOUBLE / (s1.n + s2.n - n_common), 4) AS jaccard
FROM common
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE round(n_common::DOUBLE / (s1.n + s2.n - n_common), 4) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH banding --------------------------------------------------

def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-hash MinHash signature per doc in one aggregation pass."""
    postings = shingle_postings(spark, sf_dir)
    aggs = [
        F.min((F.lit(A_COEF[i]) * F.col("h") + F.lit(B_COEF[i])) % F.lit(P)).alias(f"s{i}")
        for i in range(N_HASHES)
    ]
    return postings.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any of 4 bands of 4 minhash rows.

    The band key is an equi-join key → plain shuffle join, no
    similarity computation until the (tiny) candidate set.
    """
    sig = minhash_signatures(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"s{bi * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for bi in range(N_BANDS)
        ]
    )
    exploded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min(({A_COEF[i]}::BIGINT * h + {B_COEF[i]}) % {P}) AS s{i}" for i in range(N_HASHES)
    )
    return f"""
WITH postings AS ({_SHINGLES_SQL}),
hashed AS (SELECT doc_id, {_POLY_SQL.format(s='shingle')} AS h FROM postings)
SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
"""


def _minhash_lsh_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, "
        + " || '|' || ".join(
            f"s{bi * ROWS_PER_BAND + r}::VARCHAR" for r in range(ROWS_PER_BAND)
        )
        + " AS band_key FROM sig"
        for bi in range(N_BANDS)
    )
    return f"""
WITH sig AS ({_minhash_sig_sql()}),
bands AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


# --- SimHash ----------------------------------------------------------------

def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc: sign of per-bit weighted token votes."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok")).withColumn(
        "h", _poly_hash(F.col("tok"))
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(0)
    return votes.select("doc_id", sim.alias("simhash"))


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                             ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), hashed AS (SELECT doc_id, {_POLY_SQL.format(s='tok')} AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM votes
"""


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs within Hamming distance ≤ 8 of 32 simhash bits.

    All-pairs at test scale (documents is fixed at 500 rows); the scale
    path is prefix-rotation blocking (docstring above).
    """
    sh = simhash_fingerprints(spark, sf_dir)
    a = sh.alias("a")
    b = sh.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"), "hamming"
        )
    )


def _simhash_pairs_sql() -> str:
    return f"""
WITH sh AS ({_simhash_sql()})
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_near_pairs": simhash_near_pairs,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "minhash_signatures": _minhash_sig_sql(),
    "minhash_lsh_candidates": _minhash_lsh_sql(),
    "simhash_fingerprints": _simhash_sql(),
    "simhash_near_pairs": _simhash_pairs_sql(),
}
