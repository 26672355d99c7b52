"""Physical-plan regression tests: the scale-design invariants
(pushdown, broadcast, partial agg, TakeOrdered) must survive future
edits — a correct-but-shuffle-happy plan is a failure here."""

from __future__ import annotations


def test_plan_audit_all_pass(spark, sf_dir):
    from spec_search_spark.plans.audit import audit

    results = audit(spark, sf_dir)
    failures = [(n, c) for n, c, ok in results if not ok]
    assert not failures, failures
