"""PII scan + redaction pack over `documents` — the privacy gate a
training-data pipeline runs before anything leaves the corpus
(north-star text ops; complements quality/repetition filters in
`pipeline_ops.py`).

The synthetic corpus contains no PII, so both engines first INJECT
deterministic PII-shaped tokens derived from ``doc_id`` (emails,
phones, IPv4s, URLs) into a subset of docs — the operator under test
is the scan/redact machinery, and the injection makes its output
non-trivial and bit-reproducible in DuckDB.

Scale design: every expression is a built-in regexp op — JVM-side,
whole-stage codegen, zero Python. The only shuffle is the final
partial+final aggregate on `source` (cardinality 4), so the plan is
scan → narrow map → tiny exchange regardless of corpus size. Regexes
are written in the common Java/RE2 subset (no backreferences, no
lookaround) so Spark and DuckDB match byte-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

# Java-regex / RE2 common-subset patterns (no escaping differences:
# DuckDB standard strings keep backslashes literal; Spark gets these
# via the DataFrame API, not SQL literals).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
URL_RE = r"https?://[A-Za-z0-9./_-]+"

# Redaction must run URL-first (URLs contain dots/digits that the other
# patterns could nibble at), then email, then IP, then phone — the same
# fixed order in both engines.
_REDACTION_ORDER = [
    ("urls", URL_RE, "<URL>"),
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4s", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic PII injected into docs where
    doc_id % 3 != 0 (the rest stay clean, so zero-count groups are
    exercised too)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    frag = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" see https://site"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".example.org/p"),
        F.col("doc_id").cast("string"),
    )
    aug = F.when(F.col("doc_id") % 3 != 0, F.concat(F.col("text"), frag)).otherwise(
        F.col("text")
    )
    return docs.select("doc_id", "source", aug.alias("aug"))


_AUG_SQL = """
SELECT doc_id, source,
       CASE WHEN doc_id % 3 <> 0
            THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com or 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                 || ' at 10.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                 || ' see https://site' || CAST(doc_id % 50 AS VARCHAR)
                 || '.example.org/p' || CAST(doc_id AS VARCHAR)
            ELSE text END AS aug
FROM documents WHERE text IS NOT NULL
"""


def _matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII inventory: how many docs carry each PII class and
    total match counts — the report a compliance pass reads before
    deciding whether a source is shippable."""
    aug = _augmented(spark, sf_dir)
    counts = aug.select(
        "source",
        _matches(F.col("aug"), EMAIL_RE).alias("e"),
        _matches(F.col("aug"), PHONE_RE).alias("p"),
        _matches(F.col("aug"), IPV4_RE).alias("i"),
        _matches(F.col("aug"), URL_RE).alias("u"),
    )
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(((F.col("e") + F.col("p") + F.col("i") + F.col("u")) > 0).cast("bigint")).alias(
                "docs_with_pii"
            ),
            F.sum(F.col("e").cast("bigint")).alias("emails"),
            F.sum(F.col("p").cast("bigint")).alias("phones"),
            F.sum(F.col("i").cast("bigint")).alias("ipv4s"),
            F.sum(F.col("u").cast("bigint")).alias("urls"),
        )
        .orderBy("source")
    )


PII_SCAN_SQL = f"""
WITH aug AS ({_AUG_SQL}),
c AS (SELECT source,
             length(regexp_extract_all(aug, '{EMAIL_RE}')) AS e,
             length(regexp_extract_all(aug, '{PHONE_RE}')) AS p,
             length(regexp_extract_all(aug, '{IPV4_RE}')) AS i,
             length(regexp_extract_all(aug, '{URL_RE}')) AS u
      FROM aug)
SELECT source, COUNT(*) AS docs,
       CAST(SUM(CASE WHEN e + p + i + u > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(e) AS BIGINT) AS emails, CAST(SUM(p) AS BIGINT) AS phones,
       CAST(SUM(i) AS BIGINT) AS ipv4s, CAST(SUM(u) AS BIGINT) AS urls
FROM c GROUP BY source ORDER BY source
"""


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source redaction report: chars before/after replacing every
    PII match with a typed token, plus a residual re-scan of the
    redacted text (self-verifying — residual_pii must be 0, and the
    oracle recomputes it rather than trusting the claim)."""
    aug = _augmented(spark, sf_dir)
    red = F.col("aug")
    for _, pattern, token in _REDACTION_ORDER:
        red = F.regexp_replace(red, pattern, token)
    docs = aug.select("source", F.length("aug").alias("raw_len"), red.alias("red"))
    residual = sum(_matches(F.col("red"), p) for _, p, _ in _REDACTION_ORDER)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("raw_len").cast("bigint")).alias("raw_chars"),
            F.sum(F.length("red").cast("bigint")).alias("redacted_chars"),
            F.sum(residual.cast("bigint")).alias("residual_pii"),
        )
        .orderBy("source")
    )


_RED_EXPR = "aug"
for _, _p, _t in _REDACTION_ORDER:
    _RED_EXPR = f"regexp_replace({_RED_EXPR}, '{_p}', '{_t}', 'g')"

PII_REDACT_SQL = f"""
WITH aug AS ({_AUG_SQL}),
r AS (SELECT source, length(aug) AS raw_len, {_RED_EXPR} AS red FROM aug)
SELECT source, COUNT(*) AS docs,
       CAST(SUM(raw_len) AS BIGINT) AS raw_chars,
       CAST(SUM(length(red)) AS BIGINT) AS redacted_chars,
       CAST(SUM(length(regexp_extract_all(red, '{EMAIL_RE}'))
           + length(regexp_extract_all(red, '{PHONE_RE}'))
           + length(regexp_extract_all(red, '{IPV4_RE}'))
           + length(regexp_extract_all(red, '{URL_RE}'))) AS BIGINT) AS residual_pii
FROM r GROUP BY source ORDER BY source
"""


K_ANON_K = 5  # the privacy threshold the report audits against


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market
    segment): group sizes on the QI combination, the dataset's
    k-anonymity level (the smallest group), and how many rows sit in
    groups below K_ANON_K — the re-identification risk screen run
    before a table leaves the privacy boundary (the pii_scan's
    structured-data sibling).

    Plan: one partial+final count on the QI pair, one tiny re-agg —
    group cardinality is |QI space| regardless of row count."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("k_anonymity"),
        F.sum(F.when(F.col("n") < K_ANON_K, F.col("n")).otherwise(F.lit(0))).alias(
            "n_rows_below_k"
        ),
        F.count(F.when(F.col("n") < K_ANON_K, 1)).alias("n_groups_below_k"),
    )


K_ANONYMITY_SQL = f"""
WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
           FROM customer GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       min(n) AS k_anonymity,
       CAST(sum(CASE WHEN n < {K_ANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_below_k,
       CAST(count(CASE WHEN n < {K_ANON_K} THEN 1 END) AS BIGINT)
         AS n_groups_below_k
FROM g
"""


L_DIV_L = 3  # required distinct sensitive values per QI group
#: sensitive attribute: account-balance band (integer-cents thresholds)
_BAL_BAND = (
    "CASE WHEN c_acctbal < 0 THEN 'neg'"
    " WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END"
)


def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attack k-anonymity misses: a group of
    k rows that all share ONE sensitive value still leaks it
    (homogeneity attack). Over the same quasi-identifiers as
    `k_anonymity_report` (nation, market segment) with the
    account-balance band as the sensitive attribute: distinct
    sensitive values per QI group, the dataset's l level (the
    smallest), and the groups/rows below the threshold.

    Plan: one partial+final count on (QI, sensitive), one re-agg per
    QI group, one tiny report row — |QI space| work at any n."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", "c_mktsegment", f"{_BAL_BAND} AS band"
    )
    per_cell = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_group = per_cell.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("l"), F.sum("n").alias("n_rows")
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").alias("l_diversity"),
        F.count(F.when(F.col("l") < L_DIV_L, 1)).alias("n_groups_below_l"),
        F.sum(
            F.when(F.col("l") < L_DIV_L, F.col("n_rows")).otherwise(F.lit(0))
        ).cast("bigint").alias("n_rows_below_l"),
    )


L_DIVERSITY_SQL = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, {_BAL_BAND} AS band, count(*) AS n
  FROM customer GROUP BY 1, 2, 3
), g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS l, sum(n) AS n_rows
  FROM cells GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       min(l) AS l_diversity,
       CAST(count(CASE WHEN l < {L_DIV_L} THEN 1 END) AS BIGINT)
         AS n_groups_below_l,
       CAST(sum(CASE WHEN l < {L_DIV_L} THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_below_l
FROM g
"""


T_CLOSE_T = 0.2  # max allowed EMD between group and global distribution
#: ordered sensitive attribute for EMD: the _BAL_BAND bands as ranks
_BAL_IDX = (
    "CASE WHEN c_acctbal < 0 THEN 1"
    " WHEN c_acctbal < 5000 THEN 2 ELSE 3 END"
)


def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the attack l-diversity misses: a QI group
    can have l distinct sensitive values yet a SKEWED distribution
    (99% 'neg') that still leaks. Over the same quasi-identifiers as
    `k_anonymity_report` with the ordered balance band as the
    sensitive attribute: each group's Earth Mover's Distance to the
    GLOBAL band distribution (ordered-attribute EMD = mean of
    |cumulative differences|), the dataset's t level (the largest
    EMD), and the groups/rows beyond T_CLOSE_T.

    Exact shape: with integer cumulative counts P_j (group) and Q_j
    (global), |P_j/n_g − Q_j/n| = |P_j·n − Q_j·n_g| / (n_g·n), so the
    whole EMD is one fixed-arity double from DECIMAL(38,0) integer
    products (overflow-safe to n ~ 1e10 rows per the _LR_MOMS width
    rule), snapped to 6dp before the threshold comparison. Plan: one
    partial+final count on (QI, band), a one-row global broadcast, a
    tiny report agg — |QI space| work at any n."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", "c_mktsegment", f"{_BAL_IDX} AS idx"
    )
    cells = cust.groupBy("c_nationkey", "c_mktsegment", "idx").agg(
        F.count(F.lit(1)).alias("n")
    )
    return t_closeness_from_cells(cells)


def t_closeness_from_cells(cells: DataFrame) -> DataFrame:
    """The t-closeness fold over a (QI..., idx, n) count-cell table —
    shared by the batch audit and the streaming twin (the cell table
    IS the bounded stream state: |QI space| × 3 rows)."""
    per_group = cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").alias("n_g"),
        F.sum(F.when(F.col("idx") == 1, F.col("n")).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("idx") <= 2, F.col("n")).otherwise(0)).alias("p2"),
    )
    glob = cells.groupBy().agg(
        F.sum("n").alias("n"),
        F.sum(F.when(F.col("idx") == 1, F.col("n")).otherwise(0)).alias("g1"),
        F.sum(F.when(F.col("idx") <= 2, F.col("n")).otherwise(0)).alias("q2"),
    )
    emd = per_group.crossJoin(F.broadcast(glob)).selectExpr(
        "n_g",
        "cast(round((abs(cast(a1 as decimal(38,0)) * n"
        " - cast(g1 as decimal(38,0)) * n_g)"
        " + abs(cast(p2 as decimal(38,0)) * n"
        " - cast(q2 as decimal(38,0)) * n_g))"
        " / (cast(n_g as double) * n * 2) * 1e6) as bigint) / 1e6 AS t_6",
    )
    return emd.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.max("t_6").alias("t_closeness_6"),
        F.count(F.when(F.col("t_6") > T_CLOSE_T, 1))
        .cast("bigint")
        .alias("n_groups_above_t"),
        F.sum(F.when(F.col("t_6") > T_CLOSE_T, F.col("n_g")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_above_t"),
    )


T_CLOSENESS_SQL = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment, {_BAL_IDX} AS idx FROM customer
), g AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n_g,
         count(CASE WHEN idx = 1 THEN 1 END) AS a1,
         count(CASE WHEN idx <= 2 THEN 1 END) AS p2
  FROM c GROUP BY 1, 2
), tot AS (
  SELECT count(*) AS n,
         count(CASE WHEN idx = 1 THEN 1 END) AS g1,
         count(CASE WHEN idx <= 2 THEN 1 END) AS q2
  FROM c
), emd AS (
  SELECT n_g,
         CAST(round((abs(CAST(a1 AS DECIMAL(38,0)) * n
                - CAST(g1 AS DECIMAL(38,0)) * n_g)
              + abs(CAST(p2 AS DECIMAL(38,0)) * n
                - CAST(q2 AS DECIMAL(38,0)) * n_g))
              / (CAST(n_g AS DOUBLE) * n * 2) * 1e6) AS BIGINT) / 1e6 AS t_6
  FROM g CROSS JOIN tot
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       max(t_6) AS t_closeness_6,
       CAST(count(CASE WHEN t_6 > {T_CLOSE_T} THEN 1 END) AS BIGINT)
         AS n_groups_above_t,
       CAST(sum(CASE WHEN t_6 > {T_CLOSE_T} THEN n_g ELSE 0 END) AS BIGINT)
         AS n_rows_above_t
FROM emd
"""


QUERIES = {
    "pii_scan": pii_scan,
    "pii_redact": pii_redact,
    "k_anonymity_report": k_anonymity_report,
    "l_diversity_report": l_diversity_report,
    "t_closeness_report": t_closeness_report,
}

ORACLES = {
    "pii_scan": PII_SCAN_SQL,
    "pii_redact": PII_REDACT_SQL,
    "k_anonymity_report": K_ANONYMITY_SQL,
    "l_diversity_report": L_DIVERSITY_SQL,
    "t_closeness_report": T_CLOSENESS_SQL,
}
