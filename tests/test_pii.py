"""Semantic invariants for the PII pack (value parity vs DuckDB is
covered by tools/selfcheck.py; these pin the properties the oracle
comparison alone wouldn't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.operators import pii


def test_pii_scan_counts_injection_exactly(spark, sf_dir):
    out = {r.source: r for r in pii.pii_scan(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    per_source = {
        r.source: (r.docs, r.injected)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("doc_id") % 3 != 0).cast("bigint")).alias("injected"),
        )
        .collect()
    }
    assert set(out) == set(per_source)
    for src, (n_docs, injected) in per_source.items():
        r = out[src]
        # the corpus itself is PII-free: every hit comes from the
        # injection, exactly one of each class per injected doc
        assert r.docs == n_docs
        assert r.docs_with_pii == injected
        assert r.emails == injected
        assert r.phones == injected
        assert r.ipv4s == injected
        assert r.urls == injected


def test_pii_redact_removes_everything(spark, sf_dir):
    for r in pii.pii_redact(spark, sf_dir).collect():
        assert r.residual_pii == 0
        # redaction only ever shrinks-or-equals: tokens are shorter
        # than the shortest injected match they replace
        assert r.redacted_chars <= r.raw_chars


def test_redaction_order_is_url_first():
    # a URL containing an IP must collapse to a single <URL> token,
    # not an <IP> inside a mangled URL — pin the fixed order
    assert [t for t, _, _ in pii._REDACTION_ORDER][0] == "urls"


def test_l_diversity_below_k_anonymity_dimension(spark, sf_dir):
    from spec_search_spark.operators.pii import (
        l_diversity_report,
        k_anonymity_report,
    )

    ld = l_diversity_report(spark, sf_dir).first()
    ka = k_anonymity_report(spark, sf_dir).first()
    # same QI grouping -> same group count; l can never exceed k
    assert ld.n_groups == ka.n_groups
    assert 1 <= ld.l_diversity <= ka.k_anonymity
    assert ld.n_groups_below_l >= 0
