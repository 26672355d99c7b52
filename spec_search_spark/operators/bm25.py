"""BM25 full-text ranking (Robertson & Zaragoza 2009) — the classic
lexical retrieval scorer, completing the search family: `similarity`
holds the dense arms, `hybrid_search_rrf` fuses an idf-overlap arm;
this is the real thing with tf saturation (k1) and document-length
normalization (b), the scorer Lucene/Elasticsearch run.

The reference's retrieval is Chroma's vector search only
(`/root/reference/app.py:50-52`); a production corpus search needs the
lexical path too.

Scale shape:
- postings are filtered to the QUERY's tokens immediately after the
  tokenizing explode — everything downstream of the scan (shuffles,
  joins, windows) is ∝ query-token postings, not corpus size. (The
  filter cannot reach the parquet scan here because `tok` is born in
  the explode; at 100 TB the corpus side is a MATERIALIZED postings
  table with `tok` as a physical column — then the same IN list does
  push down and the scan itself is ∝ query df.);
- document length and corpus stats (N, Σdl) are one tiny aggregate
  broadcast as a single row (the one-row-stats pattern);
- per-token df for the query tokens is a ≤|query|-row broadcast;
- the final cut is TakeOrderedAndProject at depth TOP_K.

Cross-engine determinism: each per-(doc, token) score term is rounded
to 9dp (absorbing any libm ln() ulp skew), terms fold left-to-right in
token order (sort_array + aggregate ⟷ list ORDER BY + list_reduce —
never a float-order-ambiguous SUM), and the final score rounds to 6dp
with doc_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import RE_TOKEN_SPLIT
from spec_search_spark.session import local_df, tune

K1 = 1.2
B = 0.75
TOP_K = 10
BM25_QUERY = "fast merge join order scan"
_QTOKS = sorted(set(BM25_QUERY.split()))


def _tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, RE_TOKEN_SPLIT)
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents for BM25_QUERY.
    Output: (doc_id, score)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    qpost = toks.filter(F.col("tok").isin(_QTOKS))
    tf = qpost.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
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
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
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
            ).alias("term"),
        )
    )
    scored = (
        terms.groupBy("doc_id")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("tok", "term"))),
                        lambda s: s["term"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_K)


_QTOKS_SQL = ", ".join(f"'{t}'" for t in _QTOKS)

BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
qpost AS (SELECT doc_id, tok FROM toks WHERE tok IN ({_QTOKS_SQL})),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM qpost GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df
          FROM (SELECT DISTINCT doc_id, tok FROM qpost) GROUP BY tok),
terms AS (
  SELECT tf.doc_id, tf.tok,
         round(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * ({K1} + 1))
           / (tf.tf + {K1} * (1.0 - {B}
                + {B} * dl.dl * stats.n_docs / stats.sum_dl)),
           9) AS term
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok
          JOIN dl ON tf.doc_id = dl.doc_id, stats
),
scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(term ORDER BY tok)), (acc, x) -> acc + x), 6) AS score
  FROM terms GROUP BY doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
"""

PHRASE = "merge join"  # the exact phrase to match, position-verified
_PTOKS = PHRASE.split()


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase matching over a positional inverted index: docs
    containing the query tokens at CONSECUTIVE positions, with match
    counts — the verification step separating "merge join" from
    "join ... merge" that bag-of-words scoring (bm25_search) cannot
    see. Lucene's phrase query, shuffle-first:

    - the positional postings are filtered to the phrase's tokens
      right after the explode (work ∝ phrase-token postings);
    - adjacency is an equi-join per consecutive token pair on
      (doc_id, pos + offset) — at 100 TB each hop shuffles only the
      candidate positions that survived the previous hop, narrowing
      monotonically.

    Output: (doc_id, n_matches)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    )
    cur = (
        toks.filter(F.col("tok") == _PTOKS[0])
        .select("doc_id", F.col("pos").cast("long").alias("pos"))
    )
    for i, t in enumerate(_PTOKS[1:], start=1):
        nxt = toks.filter(F.col("tok") == t).select(
            "doc_id", (F.col("pos").cast("long") - i).alias("pos")
        )
        cur = cur.join(nxt, ["doc_id", "pos"])
    return cur.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matches"))


def _phrase_sql() -> str:
    joins = []
    for i, t in enumerate(_PTOKS):
        joins.append(
            f"t{i} AS (SELECT doc_id, pos - {i} AS pos FROM toks"
            f" WHERE tok = '{t}')"
        )
    join_chain = "t0" + "".join(
        f" JOIN t{i} USING (doc_id, pos)" for i in range(1, len(_PTOKS))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos, tk[i] AS tok
  FROM (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
        FROM documents) t,
       LATERAL unnest(range(1, len(tk) + 1)) AS u(i)
),
{", ".join(joins)}
SELECT doc_id, count(*) AS n_matches
FROM {join_chain}
GROUP BY doc_id
"""


# --- percolator: reverse search (stored queries match incoming docs) ---------

PERC_VOCAB_TOP = 5  # stored queries = all pairs of the top-5 corpus tokens


def percolate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation — the REVERSE of search (Elasticsearch percolator /
    Luwak): the index stores QUERIES, and each incoming document is
    matched against every stored query it satisfies — the alerting /
    saved-search primitive. Stored queries here are the 10 two-term
    conjunctions over the top-{N} corpus tokens (derived in-plan, so
    the oracle reproduces them); a doc matches when it contains BOTH
    terms.

    Scale shape: stored queries are term-postings (query_id, term) and
    BROADCAST — alert sets are thousands of queries vs a corpus-sized
    doc stream; matching is one distinct doc-term explode joined to
    the query postings, then a (doc, query) count == n_terms gate —
    never a per-(doc × query) evaluation loop.

    Output: (t1, t2, n_docs) per stored query."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    postings = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("term")
    )
    top = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(PERC_VOCAB_TOP)
        .select("term")
    )
    a, b = top.alias("a"), top.alias("b")
    queries = (
        a.crossJoin(b)
        .filter(F.col("a.term") < F.col("b.term"))
        .select(F.col("a.term").alias("t1"), F.col("b.term").alias("t2"))
    )
    qpost = queries.selectExpr("t1", "t2", "t1 AS term").unionByName(
        queries.selectExpr("t1", "t2", "t2 AS term")
    )
    matched = (
        postings.join(F.broadcast(qpost), "term")
        .groupBy("doc_id", "t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == 2)
    )
    return (
        queries.join(
            matched.groupBy("t1", "t2").agg(
                F.count(F.lit(1)).alias("n_docs")
            ),
            ["t1", "t2"],
            "left",
        )
        .select(
            "t1",
            "t2",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        )
    )


PERCOLATE_SQL = f"""
WITH postings AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS term
  FROM documents
),
top AS (
  SELECT term FROM (
    SELECT term, count(*) AS df FROM postings GROUP BY term
  ) ORDER BY df DESC, term LIMIT {PERC_VOCAB_TOP}
),
queries AS (
  SELECT a.term AS t1, b.term AS t2 FROM top a CROSS JOIN top b
  WHERE a.term < b.term
),
qpost AS (
  SELECT t1, t2, t1 AS term FROM queries
  UNION ALL SELECT t1, t2, t2 AS term FROM queries
),
matched AS (
  SELECT p.doc_id, q.t1, q.t2
  FROM postings p JOIN qpost q USING (term)
  GROUP BY 1, 2, 3 HAVING count(*) = 2
)
SELECT q.t1, q.t2,
       coalesce(m.n_docs, 0)::BIGINT AS n_docs
FROM queries q
LEFT JOIN (SELECT t1, t2, count(*) AS n_docs FROM matched GROUP BY 1, 2) m
  USING (t1, t2)
"""


# --- sparse-vector retrieval (the SPLADE/learned-sparse shape) --------------

Q_TERMS = 8          # sparse-query dimensionality (top-weighted terms)
SPARSE_QUERY_DOC = 0  # the query document
SPARSE_TOP_K = 10


def sparse_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector top-k retrieval over an inverted index — the
    scale shape of learned-sparse models (SPLADE, uniCOIL: Formal et
    al. 2021): documents and queries are sparse term→weight vectors,
    scored by dot product over matching terms through TERM-KEYED
    postings, never a dense scan.

    The weights here are log-tf × smooth-idf — the deterministic
    stand-in at the exact seam where a learned model drops in (the
    same seam contract as functions/vector.embed_text: swap the
    weighting, keep the retrieval plan). The query vector is the
    SPARSE_QUERY_DOC's top {Q_TERMS} terms by (weight, term) — a
    SPLADE query-side expansion stand-in.

    Scale shape: the corpus side is the postings table keyed by term
    (at 100 TB: materialized, bucketed by term, impact-ordered so
    WAND/MaxScore pruning can skip low-upper-bound blocks — this
    operator is the exhaustive-DAAT baseline those prune toward); the
    query is a ≤{Q_TERMS}-row broadcast; score accumulation is ONE
    partial+final aggregation per candidate doc; the cut is
    TakeOrdered at k.

    Determinism: per-term weights round to 9dp (ln() ulp), per-(doc,
    term) products round to 9dp, the score folds left-to-right in term
    order and rounds to 6dp; ties break by doc_id.

    Output: (doc_id, n_terms, score) — top {SPARSE_TOP_K}."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    post = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                (F.lit(1.0) + F.log("tf"))
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                9,
            ).alias("w"),
        )
    )
    query = (
        post.filter(F.col("doc_id") == SPARSE_QUERY_DOC)
        .orderBy(F.desc("w"), "tok")
        .limit(Q_TERMS)
        .select("tok", F.col("w").alias("qw"))
    )
    terms = (
        post.filter(F.col("doc_id") != SPARSE_QUERY_DOC)
        .join(F.broadcast(query), "tok")
        .select("doc_id", "tok", F.round(F.col("qw") * F.col("w"), 9).alias("p"))
    )
    scored = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("tok", "p"))),
                    lambda s: s["p"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(SPARSE_TOP_K)


SPARSE_RETRIEVAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
nd AS (SELECT count(*) AS n_docs FROM documents),
post AS (
  SELECT tf.doc_id, tf.tok,
         round((1.0 + ln(tf.tf)) * ln((nd.n_docs + 1.0) / (dfreq.df + 1.0)),
               9) AS w
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok, nd
),
query AS (
  SELECT tok, w AS qw FROM post WHERE doc_id = {SPARSE_QUERY_DOC}
  ORDER BY w DESC, tok LIMIT {Q_TERMS}
),
terms AS (
  SELECT p.doc_id, p.tok, round(q.qw * p.w, 9) AS p
  FROM post p JOIN query q ON p.tok = q.tok
  WHERE p.doc_id <> {SPARSE_QUERY_DOC}
),
scored AS (
  SELECT doc_id, count(*) AS n_terms,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(p ORDER BY tok)), (acc, x) -> acc + x), 6) AS score
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_terms, score FROM scored
ORDER BY score DESC, doc_id LIMIT {SPARSE_TOP_K}
"""


# --- query likelihood with Dirichlet smoothing -------------------------------

MU = 1000.0  # Dirichlet prior mass (the Zhai & Lafferty default)


def ql_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood language-model retrieval with Dirichlet
    smoothing (Zhai & Lafferty, SIGIR 2001) — the OTHER canonical
    lexical scorer beside BM25 (Anserini/Indri's `-qld` baseline):
    score(d) = Σ_{t∈q} ln((tf(t,d) + μ·P(t|C)) / (dl(d) + μ)), with
    the collection model P(t|C) = cf(t)/|C|. Docs missing a query
    term still pay the smoothed penalty, so the sum runs over ALL
    (candidate doc, query term) pairs — candidates are docs matching
    ≥1 term. NOTE: restricting scoring to matching docs is the
    standard Anserini/Indri convention, not a proven lower bound —
    under Dirichlet smoothing a very short non-matching doc's penalty
    ln(μ·P(t|C)/(dl+μ)) can exceed a long candidate's score, so the
    candidates-only top-K may differ from the all-docs QL ranking.
    Both this engine and the oracle apply the same restriction.

    Scale shape (bm25's): postings filtered to query tokens right
    after the explode; collection stats are a ≤|Q|-row broadcast and
    a one-row broadcast; the candidate×term grid is candidate-bound
    (≤ |candidates|·|Q|); TakeOrdered cut.

    Cross-engine: per-term log rounds to 9dp, folds in token order,
    final 6dp with doc_id tiebreak.

    Output: (doc_id, score) top-TOP_K."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("tok"))

    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    coll = toks.agg(F.count(F.lit(1)).alias("c_len"))
    qpost = toks.filter(F.col("tok").isin(_QTOKS))
    cf = qpost.groupBy("tok").agg(F.count(F.lit(1)).alias("cf"))
    tf = qpost.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))

    cands = qpost.select("doc_id").distinct()
    qterms = local_df(spark, [(t,) for t in _QTOKS], "tok string")
    grid = (
        cands.crossJoin(F.broadcast(qterms))
        .join(tf, ["doc_id", "tok"], "left")
        .join(F.broadcast(cf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(coll))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0)) + MU * F.col("cf") / F.col("c_len"))
                    / (F.col("dl") + MU)
                ),
                9,
            ).alias("term"),
        )
    )
    scored = grid.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("tok", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("score")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_K)


_QTERM_ROWS = " UNION ALL ".join(f"SELECT '{t}' AS tok" for t in _QTOKS)

QL_DIRICHLET_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(
           CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
coll AS (SELECT count(*) AS c_len FROM toks),
qpost AS (SELECT doc_id, tok FROM toks WHERE tok IN ({_QTOKS_SQL})),
cf AS (SELECT tok, count(*) AS cf FROM qpost GROUP BY tok),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM qpost GROUP BY doc_id, tok),
cands AS (SELECT DISTINCT doc_id FROM qpost),
qterms AS ({_QTERM_ROWS}),
grid AS (
  SELECT c.doc_id, q.tok,
         round(ln((coalesce(tf.tf, 0) + {MU} * cf.cf / coll.c_len)
                  / (dl.dl + {MU})), 9) AS term
  FROM cands c CROSS JOIN qterms q
  LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.tok = q.tok
  JOIN cf ON cf.tok = q.tok
  JOIN dl ON dl.doc_id = c.doc_id, coll
),
scored AS (
  SELECT doc_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
                 list(term ORDER BY tok)), (acc, x) -> acc + x), 6) AS score
  FROM grid GROUP BY doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
"""


QUERIES = {
    "bm25_search": bm25_search,
    "phrase_search": phrase_search,
    "percolate_alerts": percolate_alerts,
    "sparse_retrieval_topk": sparse_retrieval_topk,
    "ql_dirichlet_search": ql_dirichlet_search,
}
ORACLES = {
    "bm25_search": BM25_SQL,
    "phrase_search": _phrase_sql(),
    "percolate_alerts": PERCOLATE_SQL,
    "sparse_retrieval_topk": SPARSE_RETRIEVAL_SQL,
    "ql_dirichlet_search": QL_DIRICHLET_SQL,
}
