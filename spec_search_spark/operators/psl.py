"""Public-Suffix-List domain extraction AS DATA (r9 verdict task 3):
the registrable-domain (eTLD+1) rule engine behind `url_ops`, with the
PSL as a broadcast rule TABLE instead of the previous pinned
{'co.uk'} suffix set — swapping in the full ~15k-row publicsuffix.org
list changes the table contents, never the plan.

Algorithm (publicsuffix.org/list/ semantics, in relational form):

1. Explode each host into its candidate suffix keys: the last k labels
   for k = 1..max-rule-label-count (computed driver-side from the
   static rule set), plus the wildcard forms `*.` + last k labels (a
   `*.foo` rule matches any host with exactly one extra label before
   `foo`). ≤ 2·max_labels candidates per host — a narrow map-side
   explode.
2. Equi-join the candidates against the BROADCAST rule table (key =
   rule labels, exception rules keyed without their `!`).
3. Prevailing rule per host = max(struct(is_exception, rule_labels)):
   an exception rule wins outright, else most labels; no match ⇒ the
   implicit `*` default (public suffix = 1 label). The max runs as a
   partial aggregate, so the exploded rows collapse map-side before
   the one host-keyed shuffle.
4. public suffix = prevailing labels (exception: minus its leftmost
   label); registrable domain = public suffix + one more label, NULL
   when the host IS a public suffix.

Scale design: extraction is a pure function of the HOST, so consumers
(`url_ops.domain_distribution_report`) extract over the DISTINCT-host
table (bounded by the web's host population, orders of magnitude
smaller than the URL corpus) and join the host→domain map back — the
memoized-artifact shape FineWeb's URL pass uses. The rule table is
always the broadcast side; it is never shuffled.

Rule tables (r10 verdict task 4): the default ~23-row fixture is
representative of every PSL rule shape (plain single/multi-label
rules, the canonical wildcard+exception pairs `*.kobe.jp` /
`!city.kobe.jp` and `*.ck` / `!www.ck`, a 3-label exact rule
`k12.ma.us`); `data/public_suffix_list.dat` is a vendored ~1k-rule
REAL-CONTENT snapshot of publicsuffix.org (MPL-2.0; reconstructed —
the sandbox has no network) in the upstream file format, loaded by
`parse_psl_file`/`full_psl_rules` and swappable for the full ~15k-row
download unchanged. The claim "a bigger list changes the table
contents, never the plan" is pinned by tests/test_psl_full.py:
identical operator sequence, green oracles, broadcast ≪ 10 MB.

Reference parity: not in the reference (its pipeline starts at sheet
cells); north-star training-data operator family. The oracle derives
the EXPECTED suffix/domain per synthetic host independently (CASE on
the host-shape selector), so a defect anywhere in the rule engine —
wrong prevailing rule, off-by-one label slice, broken wildcard —
hash-mismatches instead of being replayed.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import local_df, tune

#: Representative PSL fixture — `!` marks exception rules, `*` wildcard
#: labels, exactly as the real list writes them.
PSL_RULES = (
    "com", "org", "net", "io", "gov", "edu", "mil", "de", "fr",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp", "*.kobe.jp", "!city.kobe.jp",
    "us", "k12.ma.us",
    "*.ck", "!www.ck",
)

#: Vendored real-content snapshot (r10 verdict task 4) in the native
#: publicsuffix.org file format — swap it for the full upstream
#: download and NOTHING but the rule-table contents changes
#: (tests/test_psl_full.py pins the plan-shape identity).
PSL_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


def parse_psl_file(path: str = PSL_SNAPSHOT_PATH) -> tuple[str, ...]:
    """Parse a publicsuffix.org-format file (`//` comments and blank
    lines skipped, rules kept verbatim incl. `*.`/`!` markers) — the
    loader a full upstream snapshot drops straight into."""
    rules = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            rules.append(line)
    return tuple(rules)


@lru_cache(maxsize=4)
def full_psl_rules() -> tuple[str, ...]:
    return parse_psl_file()


def psl_rules_df(
    spark: SparkSession, rules: Sequence[str] = PSL_RULES
) -> DataFrame:
    """(rule, is_exc, n_rule): the broadcast lookup. Exception rules
    are keyed WITHOUT the `!` (it marks semantics, not labels). ~1k
    vendored rules serialize to well under 100 KB — the broadcast
    stays trivially bounded even at the upstream list's ~15k rows
    (measured: the full fixture table is < 1 MB serialized)."""
    rows = []
    for r in rules:
        exc = r.startswith("!")
        key = r[1:] if exc else r
        rows.append((key, 1 if exc else 0, len(key.split("."))))
    return local_df(spark, rows, "rule string, is_exc int, n_rule int")


def _max_rule_labels(rules: Sequence[str]) -> int:
    """Explode width = the rule set's max label count (a candidate
    longer than every rule can never match). Computed driver-side from
    the static rule sequence — the plan SHAPE (operator sequence) is
    identical for any rule set; only the candidate-array literal and
    the broadcast contents change."""
    return max(len((r[1:] if r.startswith("!") else r).split(".")) for r in rules)


def with_psl_domain(
    df: DataFrame,
    spark: SparkSession,
    host_col: str = "host",
    rules: Sequence[str] = PSL_RULES,
) -> DataFrame:
    """df(+host_col) → df + (ps_labels, public_suffix, domain).

    `df`'s rows must be unique (the explode is re-grouped on ALL input
    columns); every added column derives from host_col alone.

    Hostnames are case-insensitive and PSL rules are written lowercase,
    so the match key is ALWAYS F.lower(host_col) — a raw-cased caller
    (synthetic hosts are uppercased ~1/7 of the time before
    canonicalization) must not silently fall through every rule to the
    implicit 1-label default (ADVICE r10). The derived public_suffix /
    domain columns are therefore lowercase too."""
    keys = df.columns
    host = F.lower(F.col(host_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    cands = []
    for k in range(1, _max_rule_labels(rules) + 1):
        sfx = F.array_join(F.slice(labels, -k, k), ".")
        cands.append(F.when(n >= k, sfx))
        # the wildcard form: '*' + the last k labels needs one MORE
        # label to its left to match
        cands.append(F.when(n >= k + 1, F.concat(F.lit("*."), sfx)))
    exploded = df.select(
        *keys,
        F.size(labels).alias("__n_labels"),
        F.explode(
            F.filter(F.array(*cands), lambda x: x.isNotNull())
        ).alias("__cand"),
    )
    joined = exploded.join(
        F.broadcast(psl_rules_df(spark, rules)),
        exploded["__cand"] == F.col("rule"),
        "left",
    )
    best = joined.groupBy(*keys, "__n_labels").agg(
        F.max(
            F.when(
                F.col("rule").isNotNull(), F.struct("is_exc", "n_rule")
            )
        ).alias("__best")
    )
    ps_labels = (
        F.when(F.col("__best").isNull(), F.lit(1))  # implicit '*' default
        .when(F.col("__best.is_exc") == 1, F.col("__best.n_rule") - 1)
        .otherwise(F.col("__best.n_rule"))
    )
    out = best.withColumn("ps_labels", ps_labels)
    lab = F.split(F.lower(F.col(host_col)), r"\.")
    out = out.withColumn(
        "public_suffix",
        F.array_join(
            F.slice(lab, -F.col("ps_labels"), F.col("ps_labels")), "."
        ),
    ).withColumn(
        "domain",
        F.when(
            F.col("__n_labels") > F.col("ps_labels"),
            F.array_join(
                F.slice(lab, -(F.col("ps_labels") + 1), F.col("ps_labels") + 1),
                ".",
            ),
        ),
    )
    return out.drop("__n_labels", "__best")


# ------------------------------------------------------- test corpus

N_HOST_TYPES = 9


def _synth_host(d) -> F.Column:
    """One deterministic host per doc_id, cycling through every rule
    shape the fixture exercises (the url_ops/pii synth discipline):

    type 0  sub.dom{k}.com      plain 1-label rule
    type 1  dom{k}.co.uk        multi-label exact rule
    type 2  blog.dom{k}.org.uk  multi-label rule with extra sublabel
    type 3  x{k}.zz{k%3}        unknown TLD → implicit '*' default
    type 4  a{k}.b{k%7}.kobe.jp wildcard *.kobe.jp
    type 5  s{k}.city.kobe.jp   exception !city.kobe.jp
    type 6  w{k}.foo{k%5}.ck    wildcard *.ck
    type 7  a{k}.www.ck         exception !www.ck
    type 8  co.uk               host IS a public suffix → NULL domain
    """
    k = F.expr(f"doc_id div {N_HOST_TYPES}")  # exact integer division
    ks = k.cast("string")
    t = d % N_HOST_TYPES
    return (
        F.when(t == 0, F.concat(F.lit("sub.dom"), ks, F.lit(".com")))
        .when(t == 1, F.concat(F.lit("dom"), ks, F.lit(".co.uk")))
        .when(t == 2, F.concat(F.lit("blog.dom"), ks, F.lit(".org.uk")))
        .when(t == 3, F.concat(F.lit("x"), ks, F.lit(".zz"), (k % 3).cast("string")))
        .when(t == 4, F.concat(F.lit("a"), ks, F.lit(".b"), (k % 7).cast("string"), F.lit(".kobe.jp")))
        .when(t == 5, F.concat(F.lit("s"), ks, F.lit(".city.kobe.jp")))
        .when(t == 6, F.concat(F.lit("w"), ks, F.lit(".foo"), (k % 5).cast("string"), F.lit(".ck")))
        .when(t == 7, F.concat(F.lit("a"), ks, F.lit(".www.ck")))
        .otherwise(F.lit("co.uk"))
    )


def psl_domain_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run every rule shape through the rule engine and roll up per
    host type: (htype, n_hosts, n_suffixes, n_domains, n_null_domain,
    sample_domain). The oracle recomputes the EXPECTED suffix/domain
    per host independently of the engine (CASE on htype), so the
    aggregate matches only if every per-host extraction is right."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    hosts = docs.select(
        "doc_id",
        (d % N_HOST_TYPES).cast("int").alias("htype"),
        _synth_host(d).alias("host"),
    )
    # SPARK_GRAFT_PSL_FULL=1 swaps in the vendored ~1k-rule real-list
    # snapshot — the oracle derives EXPECTED values independently of
    # the rule table, so it must stay green under either table
    # (tests/test_psl_full.py runs this path; the default stays the
    # fixture for bench comparability across rounds)
    rules = (
        full_psl_rules()
        if os.environ.get("SPARK_GRAFT_PSL_FULL") == "1"
        else PSL_RULES
    )
    ext = with_psl_domain(hosts, spark, rules=rules)
    return (
        ext.groupBy("htype")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
            F.countDistinct("public_suffix").cast("bigint").alias("n_suffixes"),
            F.countDistinct("domain").cast("bigint").alias("n_domains"),
            F.sum(F.col("domain").isNull().cast("int")).cast("bigint").alias(
                "n_null_domain"
            ),
            F.min("domain").alias("sample_domain"),
        )
        .orderBy("htype")
    )


#: DuckDB oracle: derives expected (public_suffix, domain) per host by
#: CASE on the shape selector — an independent re-derivation of the
#: PSL semantics, NOT a replay of the candidate join.
PSL_EXTRACT_SQL = f"""
WITH hosts AS (
  SELECT doc_id,
         CAST(doc_id % {N_HOST_TYPES} AS INT) AS htype,
         CAST(doc_id // {N_HOST_TYPES} AS BIGINT) AS k
  FROM documents
),
expected AS (
  SELECT htype,
    CASE htype
      WHEN 0 THEN 'com'
      WHEN 1 THEN 'co.uk'
      WHEN 2 THEN 'org.uk'
      WHEN 3 THEN 'zz' || CAST(k % 3 AS VARCHAR)
      WHEN 4 THEN 'b' || CAST(k % 7 AS VARCHAR) || '.kobe.jp'
      WHEN 5 THEN 'kobe.jp'
      WHEN 6 THEN 'foo' || CAST(k % 5 AS VARCHAR) || '.ck'
      WHEN 7 THEN 'ck'
      ELSE 'co.uk' END AS public_suffix,
    CASE htype
      WHEN 0 THEN 'dom' || CAST(k AS VARCHAR) || '.com'
      WHEN 1 THEN 'dom' || CAST(k AS VARCHAR) || '.co.uk'
      WHEN 2 THEN 'dom' || CAST(k AS VARCHAR) || '.org.uk'
      WHEN 3 THEN 'x' || CAST(k AS VARCHAR) || '.zz' || CAST(k % 3 AS VARCHAR)
      WHEN 4 THEN 'a' || CAST(k AS VARCHAR) || '.b' || CAST(k % 7 AS VARCHAR)
                  || '.kobe.jp'
      WHEN 5 THEN 'city.kobe.jp'
      WHEN 6 THEN 'w' || CAST(k AS VARCHAR) || '.foo' || CAST(k % 5 AS VARCHAR)
                  || '.ck'
      WHEN 7 THEN 'www.ck'
      ELSE NULL END AS domain
  FROM hosts
)
SELECT htype,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(count(DISTINCT public_suffix) AS BIGINT) AS n_suffixes,
       CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
       CAST(sum(CASE WHEN domain IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_domain,
       min(domain) AS sample_domain
FROM expected
GROUP BY htype
ORDER BY htype
"""


QUERIES = {
    "psl_domain_extract": psl_domain_extract,
}

ORACLES = {
    "psl_domain_extract": PSL_EXTRACT_SQL,
}
