"""Physical-plan regression tests: the scale-design invariants
(pushdown, broadcast, partial agg, TakeOrdered) must survive future
edits — a correct-but-shuffle-happy plan is a failure here."""

from __future__ import annotations


def test_plan_audit_all_pass(spark, sf_dir):
    from spec_search_spark.plans.audit import audit

    results = audit(spark, sf_dir)
    failures = [(n, c) for n, c, ok in results if not ok]
    assert not failures, failures


def test_two_phase_topk_single_shuffle(spark, sf_dir):
    """The probe-search queries must run the partial top-k
    (MapInPandas) BELOW their single shuffle exchange: the full scored
    table never exchanges onto the handful of probe_id reducer tasks —
    only the ≤ k×partitions×probes survivor set does."""
    import re

    from spec_search_spark.operators.ivf import ivf_ann_search
    from spec_search_spark.operators.similarity import ann_lsh_bucketed, knn_multi_probe
    from spec_search_spark.plans.audit import plan_of

    for fn in (knn_multi_probe, ann_lsh_bucketed, ivf_ann_search):
        plan = plan_of(fn(spark, sf_dir))
        tree = plan.split("\n\n", 1)[0]
        # exactly one shuffle exchange ("- Exchange (n)"; BroadcastExchange
        # is a different token and InMemoryTableScan subtrees don't count)
        shuffles = re.findall(r"- Exchange \(\d+\)", tree)
        assert len(shuffles) == 1, (fn.__name__, tree)
        # and the partial top-k sits BELOW it (later in top-down text)
        assert tree.index("- Exchange (") < tree.index("MapInPandas ("), (
            fn.__name__,
            tree,
        )
