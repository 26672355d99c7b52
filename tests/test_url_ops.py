"""URL canonicalization unit cases: hand-written messy→canonical
pairs pin each rule independently of the synthetic generator (which
the DuckDB oracle already cross-checks end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F


CASES = [
    # scheme+host lowercase, default https port, www, trailing slash,
    # tracking param, fragment — all at once
    (
        "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=3#frag",
        "https://example.com/a/b?id=3",
    ),
    # http default port + root path collapses to empty
    ("http://sub.Example.org:80/", "http://sub.example.org"),
    # already canonical stays byte-identical
    ("https://example.co.uk/p", "https://example.co.uk/p"),
    # tracking-only query drops the '?' entirely
    ("http://a.com/x?utm_medium=m", "http://a.com/x"),
    # kept params preserve their order; gclid/fbclid/ref stripped
    (
        "http://a.com/x?b=2&gclid=g&a=1&ref=r",
        "http://a.com/x?b=2&a=1",
    ),
    # non-default port survives
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # 'utmost' is NOT a tracking param — prefix test must not treat
    # '_' as a LIKE wildcard (r9 review finding)
    ("http://a.com/x?utmost=1&utm_source=s", "http://a.com/x?utmost=1"),
    # www stripped even ahead of a deeper subdomain
    ("https://www.blog.dom3.co.uk/p/", "https://blog.dom3.co.uk/p"),
]

DOMAIN_CASES = [
    # (host, expected public suffix, expected registrable domain)
    ("blog.dom3.co.uk", "co.uk", "dom3.co.uk"),
    ("www.x.example.com", "com", "example.com"),
    ("example.org", "org", "example.org"),
    ("cdn.dom0.com", "com", "dom0.com"),
    # PSL wildcard / exception semantics (publicsuffix.org test vectors)
    ("a.b.kobe.jp", "b.kobe.jp", "a.b.kobe.jp"),
    ("b.kobe.jp", "b.kobe.jp", None),  # host IS a (wildcard) suffix
    ("x.city.kobe.jp", "kobe.jp", "city.kobe.jp"),  # exception wins
    ("city.kobe.jp", "kobe.jp", "city.kobe.jp"),
    ("kobe.jp", "jp", "kobe.jp"),  # '*' matches exactly one label
    ("foo.bar.ck", "bar.ck", "foo.bar.ck"),
    ("www.ck", "ck", "www.ck"),  # exception !www.ck
    ("deep.www.ck", "ck", "www.ck"),
    ("host.k12.ma.us", "k12.ma.us", "host.k12.ma.us"),  # 3-label exact
    ("weird.unlisted", "unlisted", "weird.unlisted"),  # implicit '*'
    ("unlisted", "unlisted", None),  # bare unknown label
    ("co.uk", "co.uk", None),  # host IS a listed suffix
]


def test_canonical_url_cases(spark):
    from spec_search_spark.operators.url_ops import canonical_url

    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonical_url_sql_mirror_matches(spark):
    """The DuckDB-side canonicalizer produces the same strings on the
    hand-written cases (the oracle only exercises generator output)."""
    import duckdb

    from spec_search_spark.operators.url_ops import _canon_sql

    con = duckdb.connect()
    for raw, want in CASES:
        got = con.execute(
            f"SELECT {_canon_sql('url')} FROM (SELECT ? AS url)", [raw]
        ).fetchone()[0]
        assert got == want, (raw, got, want)


def test_registrable_domain_cases(spark):
    """The PSL rule engine against hand-derived publicsuffix.org
    semantics: exact/multi-label rules, wildcard `*.`, exception `!`,
    the implicit `*` default, and hosts that ARE public suffixes."""
    from spec_search_spark.operators.psl import with_psl_domain

    df = spark.createDataFrame([(h,) for h, _, _ in DOMAIN_CASES], ["host"])
    rows = {
        r["host"]: (r["public_suffix"], r["domain"])
        for r in with_psl_domain(df, spark).collect()
    }
    for host, want_ps, want_dom in DOMAIN_CASES:
        assert rows[host] == (want_ps, want_dom), (host, rows[host])


def test_canonical_url_idempotent_on_synth_space(spark, sf_dir):
    """canonical(canonical(u)) == canonical(u) over the full synthetic
    URL space — canonicalization must be a projection (running the
    pass twice in a pipeline is a no-op, not a further rewrite)."""
    from spec_search_spark.operators.url_ops import _urls, canonical_url

    urls = _urls(spark, sf_dir)
    twice = urls.select(
        canonical_url(F.col("url")).alias("c1")
    ).select(
        "c1", canonical_url(F.col("c1")).alias("c2")
    )
    diff = twice.filter(F.col("c1") != F.col("c2")).count()
    assert diff == 0


def test_url_survivors_partition_counts(spark, sf_dir):
    """kept + dropped == urls per source, and kept == global distinct
    canonical count (each canonical elects exactly one survivor)."""
    from spec_search_spark.operators.url_ops import (
        _urls,
        canonical_url,
        url_dedup_survivors,
    )

    rows = url_dedup_survivors(spark, sf_dir).collect()
    assert all(r["n_kept"] + r["n_dropped"] == r["n_urls"] for r in rows)
    n_canon = (
        _urls(spark, sf_dir)
        .select(canonical_url(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert sum(r["n_kept"] for r in rows) == n_canon
