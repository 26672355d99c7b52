"""URL canonicalization + domain-level dedup/statistics — the cheap
pre-MinHash dedup pass web-scale pipelines (C4, FineWeb, RefinedWeb)
run first: collapse URL variants that differ only by scheme/host case,
default port, `www.`, trailing slash, tracking parameters, or
fragment, then measure the corpus's registrable-domain concentration
(a single hot domain dominating the crawl is the classic mixture bug).

The synthetic corpus contains no URLs (pii.py's regex is
extraction-only), so — the pii.py discipline — both engines first
SYNTHESIZE two deterministically-messy URLs per document from
``doc_id`` arithmetic: every messiness axis (scheme case, host case,
default port, www prefix, trailing slash, utm tracking params,
fragment) is driven by a different modulus, so raw-vs-canonical
collapse is non-trivial, bit-reproducible, and every canonicalization
rule is exercised at every scale factor.

Scale design: the URL builder and the canonicalizer are pure
per-row string/regexp expressions — JVM-side, whole-stage codegen,
zero Python, zero joins. The only shuffles are the final partial+final
aggregates (per-source counts; per-domain counts cut by TakeOrdered).
Regexes stay in the Java/RE2 common subset.

Registrable-domain note: extraction consults the Public Suffix List
as a broadcast rule TABLE via `psl.with_psl_domain` (candidate-suffix
explode + best-match join, wildcard/exception semantics — r9 verdict
task 3); swapping in the full ~15k-row publicsuffix.org list changes
the table contents, never the plan. The report extracts over the
DISTINCT-host table and joins the host→domain map back — hosts are
orders of magnitude fewer than URLs. The DuckDB oracle keeps its
independent regexp derivation (correct for the synthetic hosts'
suffix population), so the rule engine is verified against a
different formulation, not replayed.

Reference parity: not in the reference (its pipeline starts at sheet
cells, `/root/reference/indexer.py:29-66`); north-star training-data
operator family (VERDICT r8 item 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

N_DOM = 23  # registrable-domain modulus
HOT_MOD = 5  # every 5th URL lands on domain 0 — the hot-crawl skew
N_PATH = 97
N_ID = 11
TOP_DOMAINS = 10

# ---------------------------------------------------------------- synth

_K_OFFSET = 7919  # second-URL offset (prime, so the two URL streams
# of one doc hit different residues on every modulus)


def _synth_url(c: Column, m: Column) -> Column:
    """One deterministically-messy URL from a CONTENT seed (decides the
    canonical identity: registrable domain, subdomain, scheme, path,
    real query param) and a MESS seed (decides only what
    canonicalization strips: scheme/host case, www prefix, default
    port, trailing slash, tracking params, fragment). Splitting the
    seeds is what makes the dedup report non-vacuous: two URLs with
    the same content seed but different mess seeds are raw-distinct
    and canonical-equal."""
    dom_i = F.when(c % HOT_MOD == 0, F.lit(0)).otherwise(c % N_DOM)
    tld = (
        F.when(c % 3 == 0, F.lit("com"))
        .when(c % 3 == 1, F.lit("org"))
        .otherwise(F.lit("co.uk"))
    )
    sub = (
        F.when(c % 4 == 2, F.lit("blog."))
        .when(c % 4 == 3, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    https = c % 2 == 0
    host = F.concat(
        F.when(m % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        sub,
        F.lit("dom"),
        dom_i.cast("string"),
        F.lit("."),
        tld,
    )
    host = F.when(m % 7 == 0, F.upper(host)).otherwise(host)
    scheme = F.when(
        https, F.when(m % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    ).otherwise(
        F.when(m % 3 == 0, F.lit("Http")).otherwise(F.lit("http"))
    )
    port = (
        F.when(https & (m % 8 == 0), F.lit(":443"))
        .when(~https & (m % 8 == 4), F.lit(":80"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/p/"),
        (c % N_PATH).cast("string"),
        F.when(m % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    realp = F.when(
        c % 5 == 0, F.concat(F.lit("id="), (c % N_ID).cast("string"))
    ).otherwise(F.lit(""))
    track = F.when(
        m % 4 < 2,
        F.concat(F.lit("utm_source=s"), (m % 3).cast("string"), F.lit("&utm_medium=m")),
    ).otherwise(F.lit(""))
    query = F.when(
        (realp != "") & (track != ""), F.concat(realp, F.lit("&"), track)
    ).otherwise(F.concat(realp, track))
    frag = F.when(
        m % 6 == 0, F.concat(F.lit("#sec"), (m % 7).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        frag,
    )


def urls_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, source, url) from any (doc_id, source, ...) frame —
    two synthetic messy URLs per document; shared verbatim by the
    batch queries and the streaming twin. EVEN doc_ids share the
    content seed between their two URLs (same canonical resource,
    different mess — the share-link-with-tracking-junk case dedup
    exists for); odd doc_ids get two distinct resources."""
    d = F.col("doc_id")
    c2 = F.when(d % 2 == 0, d).otherwise(d + _K_OFFSET)
    return docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(_synth_url(d, d), _synth_url(c2, d + 17))
        ).alias("url"),
    )


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return urls_from_docs(
        load_table(spark, sf_dir, "documents").select("doc_id", "source")
    )


def _synth_url_sql(c: str, m: str) -> str:
    """DuckDB mirror of _synth_url — identical arithmetic and concat
    order (seeds are non-negative, so plain % matches pmod)."""
    dom_i = f"CASE WHEN ({c}) % {HOT_MOD} = 0 THEN 0 ELSE ({c}) % {N_DOM} END"
    tld = (
        f"CASE WHEN ({c}) % 3 = 0 THEN 'com' "
        f"WHEN ({c}) % 3 = 1 THEN 'org' ELSE 'co.uk' END"
    )
    sub = (
        f"CASE WHEN ({c}) % 4 = 2 THEN 'blog.' "
        f"WHEN ({c}) % 4 = 3 THEN 'cdn.' ELSE '' END"
    )
    www = f"CASE WHEN ({m}) % 4 = 0 THEN 'www.' ELSE '' END"
    host = (
        f"({www}) || ({sub}) || 'dom' || CAST({dom_i} AS VARCHAR) "
        f"|| '.' || ({tld})"
    )
    host = f"CASE WHEN ({m}) % 7 = 0 THEN upper({host}) ELSE {host} END"
    scheme = (
        f"CASE WHEN ({c}) % 2 = 0 THEN "
        f"(CASE WHEN ({m}) % 3 = 0 THEN 'HTTPS' ELSE 'https' END) "
        f"ELSE (CASE WHEN ({m}) % 3 = 0 THEN 'Http' ELSE 'http' END) END"
    )
    port = (
        f"CASE WHEN ({c}) % 2 = 0 AND ({m}) % 8 = 0 THEN ':443' "
        f"WHEN ({c}) % 2 <> 0 AND ({m}) % 8 = 4 THEN ':80' ELSE '' END"
    )
    path = (
        f"'/p/' || CAST(({c}) % {N_PATH} AS VARCHAR) || "
        f"CASE WHEN ({m}) % 2 = 0 THEN '/' ELSE '' END"
    )
    realp = (
        f"CASE WHEN ({c}) % 5 = 0 "
        f"THEN 'id=' || CAST(({c}) % {N_ID} AS VARCHAR) ELSE '' END"
    )
    track = (
        f"CASE WHEN ({m}) % 4 < 2 "
        f"THEN 'utm_source=s' || CAST(({m}) % 3 AS VARCHAR) || '&utm_medium=m' "
        f"ELSE '' END"
    )
    query = (
        f"CASE WHEN ({realp}) <> '' AND ({track}) <> '' "
        f"THEN ({realp}) || '&' || ({track}) "
        f"ELSE ({realp}) || ({track}) END"
    )
    frag = (
        f"CASE WHEN ({m}) % 6 = 0 "
        f"THEN '#sec' || CAST(({m}) % 7 AS VARCHAR) ELSE '' END"
    )
    return (
        f"({scheme}) || '://' || ({host}) || ({port}) || ({path}) || "
        f"CASE WHEN ({query}) <> '' THEN '?' || ({query}) ELSE '' END || "
        f"({frag})"
    )


_URLS_SQL = f"""
SELECT doc_id, source, url FROM (
  SELECT doc_id, source,
         unnest([{_synth_url_sql('doc_id', 'doc_id')},
                 {_synth_url_sql(f'CASE WHEN doc_id % 2 = 0 THEN doc_id ELSE doc_id + {_K_OFFSET} END', 'doc_id + 17')}]) AS url
  FROM documents
) u
"""

# ---------------------------------------------------------- canonicalize

#: query parameters stripped by canonicalization (the FineWeb/C4 set:
#: analytics/click identifiers that never change the resource)
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column) -> Column:
    """The canonicalization chain, pure codegen: lowercase scheme and
    host, strip the scheme's default port, strip a leading `www.`,
    strip trailing slashes from the path, drop tracking query params
    (order of survivors preserved), drop the fragment."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(F.regexp_replace(host, r":80$", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), r"/+$", ""
    )
    query = F.regexp_extract(url, _QUERY_RE, 1)

    def _keep(p: Column) -> Column:
        # exact prefix test, NOT LIKE: in a LIKE pattern '_' is a
        # single-char wildcard, so LIKE 'utm_%' would also strip a
        # real parameter like 'utmost=1' (mirrored in _canon_sql)
        out = F.lit(True)
        for pfx in TRACKING_PREFIXES:
            out = out & ~p.startswith(pfx)
        return out

    q2 = F.when(query == "", F.lit("")).otherwise(
        F.array_join(F.filter(F.split(query, "&"), _keep), "&")
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )


def _canon_sql(url: str) -> str:
    # starts_with, not LIKE 'utm_%' — see _keep in canonical_url
    keep = " AND ".join(
        f"NOT starts_with(p, '{pfx}')" for pfx in TRACKING_PREFIXES
    )
    scheme = f"lower(regexp_extract({url}, '{_SCHEME_RE}', 1))"
    host = f"lower(regexp_extract({url}, '{_HOST_RE}', 1))"
    host = (
        f"CASE WHEN ({scheme}) = 'https' "
        f"THEN regexp_replace({host}, ':443$', '') "
        f"ELSE regexp_replace({host}, ':80$', '') END"
    )
    host = f"regexp_replace({host}, '^www\\.', '')"
    path = f"regexp_replace(regexp_extract({url}, '{_PATH_RE}', 1), '/+$', '')"
    query = f"regexp_extract({url}, '\\?([^#]*)', 1)"
    q2 = (
        f"CASE WHEN ({query}) = '' THEN '' ELSE array_to_string("
        f"list_filter(string_split({query}, '&'), p -> {keep}), '&') END"
    )
    return (
        f"({scheme}) || '://' || ({host}) || ({path}) || "
        f"CASE WHEN ({q2}) <> '' THEN '?' || ({q2}) ELSE '' END"
    )


#: multi-part public suffixes present in the SYNTHETIC hosts — used
#: only by the DuckDB oracle's independent regexp derivation (the
#: Spark side consults the psl.py rule table; on hosts whose suffixes
#: come from this population both derivations agree by construction)
_ORACLE_MULTIPART_SUFFIXES = ("co.uk",)


def _domain_sql(host: str) -> str:
    out = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    for sfx in _ORACLE_MULTIPART_SUFFIXES:
        pat = "([^.]+\\." + sfx.replace(".", "\\.") + ")$"
        out = (
            f"CASE WHEN ({host}) LIKE '%.{sfx}' "
            f"THEN regexp_extract({host}, '{pat}', 1) ELSE {out} END"
        )
    return out

# ------------------------------------------------------------- queries


def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source URL dedup yield of canonicalization: raw-distinct vs
    canonical-distinct URL counts and the collapse ratio — the
    before/after report of the cheap URL-level dedup pass.

    Plan: synth + canonicalize are one codegen projection over the
    scan; two distinct-aggregates on (source, url) / (source, canon)
    collapse map-side; the ratio snaps per FIXTURES rule 2.

    Output: (source, n_urls, n_raw_distinct, n_canon_distinct,
    collapse_ratio)."""
    urls = _urls(spark, sf_dir)
    canon = urls.withColumn("canon", canonical_url(F.col("url")))
    snap = F.expr(
        "cast(round((n_raw_distinct - n_canon_distinct)"
        " / cast(n_raw_distinct as double) * 1e6) as bigint) / 1e6"
    )
    return (
        canon.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("url").cast("bigint").alias("n_raw_distinct"),
            F.countDistinct("canon").cast("bigint").alias("n_canon_distinct"),
        )
        .select(
            "source",
            "n_urls",
            "n_raw_distinct",
            "n_canon_distinct",
            snap.alias("collapse_ratio"),
        )
        .orderBy("source")
    )


URL_CANON_SQL = f"""
WITH urls AS ({_URLS_SQL}),
canon AS (
  SELECT doc_id, source, url, {_canon_sql('url')} AS canon FROM urls
),
per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
         CAST(count(DISTINCT canon) AS BIGINT) AS n_canon_distinct
  FROM canon GROUP BY source
)
SELECT source, n_urls, n_raw_distinct, n_canon_distinct,
       CAST(round((n_raw_distinct - n_canon_distinct)
            / CAST(n_raw_distinct AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS collapse_ratio
FROM per
ORDER BY source
"""


def domain_distribution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain concentration: top-TOP_DOMAINS domains by
    distinct-document count with URL counts and share of all URLs —
    the crawl-skew report read before setting per-domain caps
    (per_source_cap's domain-level sibling).

    Plan: canonical-host codegen projection; eTLD+1 via the PSL rule
    engine over the DISTINCT-host table (`psl.with_psl_domain`:
    candidate explode + broadcast rule join — the rule table is never
    shuffled); the host→domain map joins back onto the URL rows (AQE
    broadcasts it at fixture scale); one partial+final (domain)
    aggregate; the one-row total broadcasts back; TakeOrdered cut.

    Output: (domain, n_docs, n_urls, url_share) top-TOP_DOMAINS."""
    from spec_search_spark.operators.psl import with_psl_domain

    urls = _urls(spark, sf_dir)
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", _HOST_RE, 1)), r":\d+$", ""
    )
    wh = urls.select("doc_id", host.alias("host"))
    host_map = with_psl_domain(wh.select("host").distinct(), spark).select(
        "host", "domain"
    )
    doms = wh.join(host_map, "host").select("doc_id", "domain")
    per = doms.groupBy("domain").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
    )
    tot = per.agg(F.sum("n_urls").alias("t"))
    snap = F.expr("cast(round(n_urls / cast(t as double) * 1e6) as bigint) / 1e6")
    return (
        per.crossJoin(F.broadcast(tot))
        .select("domain", "n_docs", "n_urls", snap.alias("url_share"))
        .orderBy(F.desc("n_docs"), F.desc("n_urls"), "domain")
        .limit(TOP_DOMAINS)
    )


_HOST_ONLY_SQL = (
    f"regexp_replace(lower(regexp_extract(url, '{_HOST_RE}', 1)), ':[0-9]+$', '')"
)

DOMAIN_DIST_SQL = f"""
WITH urls AS ({_URLS_SQL}),
doms AS (
  SELECT doc_id, {_domain_sql(_HOST_ONLY_SQL)} AS domain FROM urls
),
per AS (
  SELECT domain,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_urls
  FROM doms GROUP BY domain
),
tot AS (SELECT CAST(sum(n_urls) AS BIGINT) AS t FROM per)
SELECT domain, n_docs, n_urls,
       CAST(round(n_urls / CAST(t AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS url_share
FROM per CROSS JOIN tot
ORDER BY n_docs DESC, n_urls DESC, domain
LIMIT {TOP_DOMAINS}
"""




def url_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the URL-level dedup: one survivor row per canonical URL
    (earliest doc_id, then raw-url tiebreak — deterministic and
    recomputable from the keys alone), reported per source as
    kept/dropped counts — the step that actually materializes the
    FineWeb URL pass before MinHash ever runs.

    Scale: the survivor window partitions by the canonical URL —
    millions of small groups, never a hot single partition (group size
    = variant count of one resource, bounded in practice by the mess
    axes); one shuffle on canon, one partial+final per-source agg.

    Output: (source, n_urls, n_kept, n_dropped, keep_ratio)."""
    from pyspark.sql.window import Window as _W

    urls = _urls(spark, sf_dir)
    canon = urls.withColumn("canon", canonical_url(F.col("url")))
    w = _W.partitionBy("canon").orderBy("doc_id", "url")
    flagged = canon.withColumn(
        "kept", F.row_number().over(w) == 1
    )
    snap = F.expr(
        "cast(round(n_kept / cast(n_urls as double) * 1e6) as bigint) / 1e6"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
            F.sum((~F.col("kept")).cast("int")).cast("bigint").alias("n_dropped"),
        )
        .select("source", "n_urls", "n_kept", "n_dropped", snap.alias("keep_ratio"))
        .orderBy("source")
    )


_SURV_CANON = _canon_sql("url")
URL_SURVIVORS_SQL = f"""
WITH urls AS ({_URLS_SQL}),
canon AS (
  SELECT doc_id, source, url, {_SURV_CANON} AS canon FROM urls
),
flagged AS (
  SELECT source,
         (row_number() OVER (PARTITION BY canon ORDER BY doc_id, url) = 1)
           AS kept
  FROM canon
),
per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
  FROM flagged GROUP BY source
)
SELECT source, n_urls, n_kept, n_dropped,
       CAST(round(n_kept / CAST(n_urls AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS keep_ratio
FROM per
ORDER BY source
"""


QUERIES = {
    "url_canonicalize_dedup": url_canonicalize_dedup,
    "url_dedup_survivors": url_dedup_survivors,
    "domain_distribution_report": domain_distribution_report,
}

ORACLES = {
    "url_canonicalize_dedup": URL_CANON_SQL,
    "url_dedup_survivors": URL_SURVIVORS_SQL,
    "domain_distribution_report": DOMAIN_DIST_SQL,
}
