"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): position-robust local fingerprint
selection for copy detection / contamination tracing.

Where MinHash (dedup.py) estimates whole-document set similarity,
winnowing GUARANTEES detection of any shared substring of length
≥ K + W − 1 characters: every window of W consecutive character
k-gram hashes contributes its minimum (rightmost on ties), so two
documents sharing a long-enough passage must share a selected
fingerprint. That per-window guarantee is what plagiarism /
train-test-contamination pipelines need — a single copied paragraph
is caught no matter how much unrelated text surrounds it.

Not in the reference (its dedup story is Chroma upsert-by-id,
`/root/reference/indexer.py:60-66`); first-class for the 100 TB
training-data north star.

Spark shape, designed for scale:
- k-gram hashing AND window-minimum selection are ONE Arrow batch
  pass of the normalized text through a vectorized rolling-hash
  kernel (the shared polynomial fold, functions.text.FP_BASE/MOD;
  numpy sliding-window min) returning each document's distinct
  selected fingerprints — row-local work, no corpus-sized explode,
  no per-document window shuffle; identical values to the DuckDB
  oracle's list_reduce fold + window-min CTE;
- the rightmost-min tie-break packs (hash, position) into ONE int64
  (h · 2²⁰ + (2²⁰−1−pos), docs < 1 Mchar) exactly as the oracle does;
- the MOSS noise guard drops fingerprints appearing in more than
  MAX_DF documents (boilerplate k-grams) BEFORE the pair join, so
  candidate pairs are bounded by rare-fingerprint postings — the same
  candidate-bound-join discipline as the LSH band join (dedup.py);
- the pair count + containment is one groupBy on (doc_a, doc_b) over
  those bounded postings; final cut is TakeOrdered at TOP_PAIRS.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import fingerprint_sql
from spec_search_spark.session import tune

K = 8  # character k-gram length
W = 4  # winnowing window (guarantee threshold = K + W - 1 = 11 chars)
POS_CAP = 1 << 20  # packing base; documents are < 1M chars
MAX_DF = 40  # MOSS noise guard: ignore fingerprints in > MAX_DF docs
TOP_PAIRS = 20
A_SOURCE = "src0"  # the "benchmark" side of the containment report

def _norm(text):
    return F.regexp_replace(F.lower(text), r"\s+", " ")


def _selected_unpinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRE-pin fingerprint builder — the subtree that actually does
    the winnowing work. Kept as a named seam so plans/audit.py can run
    the kernel-shape checks (ArrowEval pass required; Window /
    BatchEvalPython / per-position Generate forbidden) on THIS plan:
    the pinned form below reads back as `Scan ExistingRDD`, which would
    let a kernel-shape regression pass the registered-plan audit
    silently (ADVICE r11)."""
    from spec_search_spark.session import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ),
        "doc_id",
    ).select("doc_id", "source", _norm(F.col("text")).alias("t"))
    return winnow(docs)


def _selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, h): the winnowed fingerprint set per document
    (distinct selected hashes). Spread before the kernel (the local
    single-row-group scan would run every document's rolling hash on
    ONE core; no-op at scale) and PINNED — the stats query reads it
    twice and the containment query four times (df-count, rare join,
    both pair sides), each of which would lazily re-run the kernel
    over the whole corpus."""
    return _selected_unpinned(spark, sf_dir).localCheckpoint(eager=True)


def make_winnow_fps_udf():
    """Arrow-batched per-document fingerprint SET (distinct selected
    hashes as array<long>) over PRE-NORMALIZED text — the row-local
    winnowing kernel of :func:`make_winnow_count_udf`, returning the
    selected values instead of their count. Selection semantics are
    identical to the paper/oracle: full windows only, packed
    rightmost-min keys (h·POS_CAP + (POS_CAP−1−pos)), distinct h."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    from spec_search_spark.functions.text import FP_BASE, FP_MOD, poly_hash_batch

    pow_k = [pow(FP_BASE, K - 1 - j, FP_MOD) for j in range(K)]

    def _fps_from_hashes(hs: "np.ndarray", n: int) -> "np.ndarray":
        keys = hs * POS_CAP + (POS_CAP - 1 - np.arange(n, dtype=np.int64))
        mins = sliding_window_view(keys, W).min(axis=1)
        return np.unique(mins // POS_CAP)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def winnow_fps(texts: pd.Series) -> pd.Series:
        empty = np.empty(0, dtype=np.int64)
        vals = [t if isinstance(t, str) else "" for t in texts.tolist()]
        enc = [t.encode("utf-8") for t in vals]
        if any(len(b) != len(t) for b, t in zip(enc, vals)):
            # non-ASCII batch: per-doc fold over code points
            # (identical values to the vectorized byte path)
            out = []
            for t in vals:
                n = len(t) - K + 1
                if n < W:
                    out.append(empty)
                    continue
                hs = poly_hash_batch([t[i : i + K] for i in range(n)])
                out.append(_fps_from_hashes(hs, n))
            return pd.Series(out, index=texts.index)
        # vectorized rolling hash: all docs concatenate into ONE code
        # array; K shifted-add passes produce every k-gram hash.
        # Cross-boundary grams are discarded by the per-doc slicing.
        buf = b"\x00".join(enc)
        codes = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        m = max(len(codes) - K + 1, 0)
        acc = np.zeros(m, dtype=np.int64)
        for j in range(K):
            acc = (acc + codes[j : j + m] * pow_k[j]) % FP_MOD
        out, off = [], 0
        for t in vals:
            ln = len(t)
            n = ln - K + 1
            if n < W:
                out.append(empty)
                off += ln + 1
                continue
            out.append(_fps_from_hashes(acc[off : off + n], n))
            off += ln + 1
        return pd.Series(out, index=texts.index)

    return winnow_fps


_WINNOW_FPS = make_winnow_fps_udf()


def winnow(docs: DataFrame) -> DataFrame:
    """Winnowing core over (doc_id, source, t): ONE Arrow batch pass of
    the normalized text through the vectorized rolling-hash kernel,
    returning each document's distinct selected fingerprints.

    Plan shape (guide §4.2): the previous form posexploded every
    k-gram POSITION (one row per character of the corpus — ~19M rows
    at sf0.1) through the per-gram hash UDF, then ran a per-document
    window-min over the exploded rows (a corpus-sized shuffle). The
    kernel moves the text across the Python boundary ONCE (compact
    per-doc arrays come back), the window-min becomes a numpy sliding
    view, and the only remaining exchange is whatever the consumer
    aggregates — identical selected values (kernel shared with the
    streaming twin; pinned by test_winnow_matches_paper_reference)."""
    return docs.select(
        "doc_id",
        "source",
        F.explode(_WINNOW_FPS(F.col("t"))).alias("h"),
    )


def winnowing_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fingerprint inventory: how densely winnowing samples
    each source's text (expected density 2/(W+1) of k-gram positions).

    Output: (source, n_docs, total_fps, distinct_hashes, avg_fps)."""
    tune(spark)
    fps = _selected(spark, sf_dir)
    per_doc = fps.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_fp")
    )
    return (
        per_doc.join(
            fps.groupBy("source").agg(
                F.countDistinct("h").alias("distinct_hashes")
            ),
            "source",
        )
        .groupBy("source", "distinct_hashes")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_fp").alias("total_fps"),
            F.round(F.avg("n_fp"), 4).alias("avg_fps"),
        )
        .select(
            "source", "n_docs", "total_fps", "distinct_hashes", "avg_fps"
        )
        .orderBy("source")
    )


def winnowing_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS match report: for documents of A_SOURCE vs the rest of the
    corpus, the TOP_PAIRS pairs by shared (rare) fingerprints, with
    containment = shared / |A-side fingerprints that survived the
    noise guard|.

    Output: (doc_a, doc_b, shared, containment)."""
    tune(spark)
    fps = _selected(spark, sf_dir)
    df_count = fps.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(
        df_count.filter(F.col("df") <= MAX_DF).select("h"), "h"
    )
    a = rare.filter(F.col("source") == A_SOURCE).select(
        F.col("doc_id").alias("doc_a"), "h"
    )
    b = rare.filter(F.col("source") != A_SOURCE).select(
        F.col("doc_id").alias("doc_b"), "h"
    )
    sizes_a = a.groupBy("doc_a").agg(F.count(F.lit(1)).alias("size_a"))
    pairs = (
        a.join(b, "h")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(sizes_a, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(F.col("shared") / F.col("size_a"), 4).alias("containment"),
        )
        .orderBy(F.desc("shared"), "doc_a", "doc_b")
        .limit(TOP_PAIRS)
    )


def make_winnow_count_udf():
    """Arrow-batched per-document fingerprint COUNT (row-local
    winnowing) for the streaming twin: identical selection semantics
    to :func:`winnow` (full windows, packed rightmost-min keys), one
    numpy sliding-window pass per doc. The expression-tree form would
    re-inline the keys array into every window slice — quadratic per
    row under CollapseProject — so streaming uses this instead."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    from spec_search_spark.functions.text import poly_hash_batch

    from spec_search_spark.functions.text import FP_BASE, FP_MOD

    pow_k = [pow(FP_BASE, K - 1 - j, FP_MOD) for j in range(K)]

    @F.pandas_udf("long")
    def winnow_count(texts: pd.Series) -> pd.Series:
        # True vectorized rolling hash: all docs concatenate into ONE
        # code array and the k-gram hashes are K shifted-add passes
        # over it (Σ c_j·31^(K-1-j) mod p ≡ the shared fold) — no
        # per-position matrix, no per-doc hash calls. Cross-boundary
        # grams are computed then discarded by the per-doc slicing.
        norm = [re.sub(r"\s+", " ", (s or "").lower()) for s in texts]
        enc = [t.encode("utf-8") for t in norm]
        if any(len(b) != len(t) for b, t in zip(enc, norm)):
            # non-ASCII: fall back to the per-doc fold (identical values)
            out = []
            for t in norm:
                n = len(t) - K + 1
                if n < W:
                    out.append(0)
                    continue
                hs = poly_hash_batch([t[i : i + K] for i in range(n)])
                keys = hs * POS_CAP + (
                    POS_CAP - 1 - np.arange(n, dtype=np.int64)
                )
                mins = sliding_window_view(keys, W).min(axis=1)
                out.append(len(np.unique(mins // POS_CAP)))
            return pd.Series(out, index=texts.index)
        buf = b"\x00".join(enc)
        codes = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        m = max(len(codes) - K + 1, 0)
        acc = np.zeros(m, dtype=np.int64)
        for j in range(K):
            acc = (acc + codes[j : j + m] * pow_k[j]) % FP_MOD
        out, off = [], 0
        for t in norm:
            ln = len(t)
            n = ln - K + 1
            if n < W:
                out.append(0)
                off += ln + 1
                continue
            hs = acc[off : off + n]
            off += ln + 1
            keys = hs * POS_CAP + (POS_CAP - 1 - np.arange(n, dtype=np.int64))
            mins = sliding_window_view(keys, W).min(axis=1)
            out.append(len(np.unique(mins // POS_CAP)))
        return pd.Series(out, index=texts.index)

    return winnow_count


# ---------------------------------------------------------------- oracles

_SEL_SQL = f"""
norm AS (
  SELECT doc_id, source, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
),
kg AS (
  SELECT doc_id, source, i AS pos, substr(t, i + 1, {K}) AS g
  FROM norm, unnest(range(0, greatest(length(t) - {K} + 1, 0))) AS u(i)
),
keyed AS (
  SELECT doc_id, source, pos,
         ({fingerprint_sql('g')}) * {POS_CAP}
           + ({POS_CAP - 1} - pos) AS key
  FROM kg
),
winmin AS (
  SELECT doc_id, source, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)
           AS mkey
  FROM keyed
),
fps AS (
  SELECT DISTINCT doc_id, source, mkey // {POS_CAP} AS h
  FROM winmin WHERE pos >= {W - 1}
)
"""

STATS_SQL = f"""
WITH {_SEL_SQL},
per_doc AS (
  SELECT source, doc_id, count(*) AS n_fp FROM fps GROUP BY source, doc_id
),
per_src AS (
  SELECT source, CAST(count(DISTINCT h) AS BIGINT) AS distinct_hashes
  FROM fps GROUP BY source
)
SELECT per_doc.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_fp) AS BIGINT) AS total_fps,
       distinct_hashes,
       round(CAST(avg(n_fp) AS DOUBLE), 4) AS avg_fps
FROM per_doc JOIN per_src ON per_doc.source = per_src.source
GROUP BY per_doc.source, distinct_hashes
ORDER BY per_doc.source
"""

PAIRS_SQL = f"""
WITH {_SEL_SQL},
rare AS (
  SELECT doc_id, source, h FROM fps
  WHERE h IN (SELECT h FROM fps GROUP BY h HAVING count(*) <= {MAX_DF})
),
a AS (SELECT doc_id AS doc_a, h FROM rare WHERE source = '{A_SOURCE}'),
b AS (SELECT doc_id AS doc_b, h FROM rare WHERE source <> '{A_SOURCE}'),
sizes_a AS (SELECT doc_a, count(*) AS size_a FROM a GROUP BY doc_a),
pairs AS (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS shared
  FROM a JOIN b USING (h) GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, shared,
       round(CAST(shared AS DOUBLE) / size_a, 4) AS containment
FROM pairs JOIN sizes_a USING (doc_a)
ORDER BY shared DESC, doc_a, doc_b
LIMIT {TOP_PAIRS}
"""


QUERIES = {
    "winnowing_fingerprint_stats": winnowing_fingerprint_stats,
    "winnowing_containment_pairs": winnowing_containment_pairs,
}
ORACLES = {
    "winnowing_fingerprint_stats": STATS_SQL,
    "winnowing_containment_pairs": PAIRS_SQL,
}
