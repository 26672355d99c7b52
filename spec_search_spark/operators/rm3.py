"""RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
models; Abdul-Jaleel et al. 2004 RM3 interpolation) — the classic
query-expansion loop on top of BM25: retrieve feedback docs, estimate
a relevance model over their terms, interpolate with the original
query, and re-score the corpus with the expanded weighted query.
Closes the lexical retrieval family: bm25 (ranking) → phrase
(position verification) → percolator (reverse search) → RM3
(feedback expansion).

Not in the reference (retrieval there is Chroma vector search only,
`/root/reference/app.py:50-52`); Anserini/Terrier ship exactly this
pipeline for lexical baselines.

Scale shape:
- the feedback pass IS bm25_search (broadcast-stats, query-token-
  bound postings, TakeOrdered cut) — FB_DOCS rows;
- the relevance model is estimated over the FEEDBACK docs' postings
  only (join against the broadcast FB_DOCS ids) — bounded work;
- the expanded term set (query ∪ top-FB_TERMS) is data-dependent, so
  the re-score joins corpus postings to the ≤|Q|+FB_TERMS-row
  BROADCAST term-weight table instead of a static pushed IN list —
  everything downstream is ∝ expanded-term postings;
- final cut is TakeOrdered at TOP_K.

Cross-engine determinism (the bm25.py contract): every probability /
contribution is rounded to 9dp at the leaf, folds run left-to-right
in a declared key order (sort_array + aggregate ⟷ list ORDER BY +
list_reduce), final scores round to 6dp with doc_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.operators.bm25 import (
    B,
    BM25_SQL,
    K1,
    _QTOKS,
    _tokens,
    bm25_search,
)
from spec_search_spark.session import local_df, tune

FB_DOCS = 10  # feedback depth (= bm25 TOP_K)
FB_TERMS = 8  # expansion terms added to the query
ALPHA = 0.5  # interpolation: w' = α·P_orig + (1−α)·P_rm
TOP_K = 10


def _ordered_fold(col_struct, value_field: str, ndigits: int):
    """round(Σ values in struct-sort order, ndigits) — the shared
    deterministic-fold idiom."""
    return F.round(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(col_struct)),
                lambda s: s[value_field],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        ndigits,
    )


def _expanded_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, weight): the RM3-interpolated expanded query."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    fb = bm25_search(spark, sf_dir)  # (doc_id, score) — FB_DOCS rows

    # P(d|R) ∝ score: normalize over the feedback set (fold by doc_id)
    ssum = fb.agg(
        _ordered_fold(F.struct("doc_id", "score"), "score", 9).alias("s")
    )
    wd = fb.crossJoin(F.broadcast(ssum)).select(
        "doc_id", F.round(F.col("score") / F.col("s"), 9).alias("w_d")
    )

    fb_toks = toks.join(F.broadcast(wd), "doc_id")
    dl = fb_toks.groupBy("doc_id", "w_d").agg(F.count(F.lit(1)).alias("dl"))
    tf = fb_toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    contrib = tf.join(F.broadcast(dl), "doc_id").select(
        "tok",
        "doc_id",
        F.round(F.col("w_d") * F.col("tf") / F.col("dl"), 9).alias("c"),
    )
    # rm is referenced twice below (expansion cut + original-token
    # lookup) and its lineage contains the whole feedback pass — pin
    # the ≤|fb-doc tokens| rows so bm25_search runs ONCE
    rm = (
        contrib.groupBy("tok")
        .agg(_ordered_fold(F.struct("doc_id", "c"), "c", 9).alias("p_rm"))
        .localCheckpoint(eager=True)
    )

    expansion = (
        rm.filter(~F.col("tok").isin(_QTOKS))
        .orderBy(F.desc("p_rm"), "tok")
        .limit(FB_TERMS)
    )
    orig = local_df(
        spark, [(t, 1.0 / len(_QTOKS)) for t in _QTOKS], "tok string, p_orig double"
    )
    full = orig.join(rm, "tok", "left").select(
        "tok", "p_orig", F.coalesce("p_rm", F.lit(0.0)).alias("p_rm")
    ).unionByName(
        expansion.select("tok", F.lit(0.0).alias("p_orig"), "p_rm")
    )
    return full.select(
        F.col("tok").alias("term"),
        F.round(
            F.lit(ALPHA) * F.col("p_orig") + F.lit(1 - ALPHA) * F.col("p_rm"), 9
        ).alias("weight"),
    )


def rm3_expansion_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expanded weighted query itself.
    Output: (term, weight) ordered by weight desc."""
    tune(spark)
    return _expanded_terms(spark, sf_dir).orderBy(F.desc("weight"), "term")


def rm3_expanded_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-pass retrieval with the expanded query: BM25 term scores
    weighted by the RM3 term weights.
    Output: (doc_id, score) top-TOP_K."""
    tune(spark)
    # the ≤|Q|+FB_TERMS weight table feeds two join branches (postings
    # filter + df counts); pin it so expansion estimation runs ONCE
    wq = _expanded_terms(spark, sf_dir).localCheckpoint(eager=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))

    qpost = toks.join(F.broadcast(wq), toks["tok"] == wq["term"]).select(
        "doc_id", "tok", "weight"
    )
    tf = qpost.groupBy("doc_id", "tok", "weight").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        qpost.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    terms = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("weight")
                * F.round(
                    F.log(
                        (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                        + 1.0
                    )
                    * (F.col("tf") * (K1 + 1))
                    / (
                        F.col("tf")
                        + K1
                        * (
                            1.0
                            - B
                            + B * F.col("dl") * F.col("n_docs") / F.col("sum_dl")
                        )
                    ),
                    9,
                ),
                9,
            ).alias("contrib"),
        )
    )
    scored = terms.groupBy("doc_id").agg(
        _ordered_fold(F.struct("tok", "contrib"), "contrib", 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_K)


# ---------------------------------------------------------------- oracles

_QTOKS_SQL = ", ".join(f"'{t}'" for t in _QTOKS)
_ORIG_ROWS = " UNION ALL ".join(
    f"SELECT '{t}' AS tok, {1.0 / len(_QTOKS)!r}::DOUBLE AS p_orig"
    for t in _QTOKS
)

_EXPANDED_SQL = f"""
toks AS (
  SELECT doc_id, unnest(
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
),
fb AS MATERIALIZED ({BM25_SQL.strip()}),
ssum AS (
  SELECT round(list_reduce(list_prepend(0.0::DOUBLE,
           list(score ORDER BY doc_id)), (acc, x) -> acc + x), 9) AS s
  FROM fb
),
wd AS (SELECT doc_id, round(score / s, 9) AS w_d FROM fb, ssum),
fb_toks AS (SELECT t.doc_id, t.tok, w.w_d FROM toks t JOIN wd w USING (doc_id)),
fdl AS (SELECT doc_id, w_d, count(*) AS dl FROM fb_toks GROUP BY doc_id, w_d),
ftf AS (SELECT doc_id, tok, count(*) AS tf FROM fb_toks GROUP BY doc_id, tok),
contrib AS (
  SELECT ftf.tok, ftf.doc_id,
         round(fdl.w_d * ftf.tf / fdl.dl, 9) AS c
  FROM ftf JOIN fdl USING (doc_id)
),
rm AS MATERIALIZED (
  SELECT tok, round(list_reduce(list_prepend(0.0::DOUBLE,
           list(c ORDER BY doc_id)), (acc, x) -> acc + x), 9) AS p_rm
  FROM contrib GROUP BY tok
),
expansion AS (
  SELECT tok, 0.0::DOUBLE AS p_orig, p_rm FROM rm
  WHERE tok NOT IN ({_QTOKS_SQL})
  ORDER BY p_rm DESC, tok LIMIT {FB_TERMS}
),
orig AS ({_ORIG_ROWS}),
full_q AS (
  SELECT o.tok, o.p_orig, coalesce(rm.p_rm, 0.0) AS p_rm
  FROM orig o LEFT JOIN rm ON o.tok = rm.tok
  UNION ALL
  SELECT tok, p_orig, p_rm FROM expansion
),
wq AS MATERIALIZED (
  SELECT tok AS term,
         round({ALPHA} * p_orig + {1 - ALPHA} * p_rm, 9) AS weight
  FROM full_q
)
"""

RM3_TERMS_SQL = f"""
WITH {_EXPANDED_SQL}
SELECT term, weight FROM wq ORDER BY weight DESC, term
"""

RM3_SEARCH_SQL = f"""
WITH {_EXPANDED_SQL},
dl2 AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl2),
qpost AS (
  SELECT t.doc_id, t.tok, w.weight FROM toks t JOIN wq w ON t.tok = w.term
),
tf2 AS (SELECT doc_id, tok, weight, count(*) AS tf
        FROM qpost GROUP BY doc_id, tok, weight),
dfreq AS (SELECT tok, count(*) AS df
          FROM (SELECT DISTINCT doc_id, tok FROM qpost) GROUP BY tok),
terms2 AS (
  SELECT tf2.doc_id, tf2.tok,
         round(tf2.weight * round(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf2.tf * ({K1} + 1))
           / (tf2.tf + {K1} * (1.0 - {B}
                + {B} * dl2.dl * stats.n_docs / stats.sum_dl)),
           9), 9) AS contrib
  FROM tf2 JOIN dfreq ON tf2.tok = dfreq.tok
           JOIN dl2 ON tf2.doc_id = dl2.doc_id, stats
),
scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(contrib ORDER BY tok)), (acc, x) -> acc + x), 6) AS score
  FROM terms2 GROUP BY doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
"""


QUERIES = {
    "rm3_expansion_terms": rm3_expansion_terms,
    "rm3_expanded_search": rm3_expanded_search,
}
ORACLES = {
    "rm3_expansion_terms": RM3_TERMS_SQL,
    "rm3_expanded_search": RM3_SEARCH_SQL,
}
