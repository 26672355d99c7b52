"""Round-7 additions: streaming twins for the round-6 monitors
(embedding drift, ROC-AUC model gate) equal their batch ops exactly,
and the adaptive rank walk picks identical values on both plan shapes
(value parity vs the DuckDB oracles is covered by tools/selfcheck.py)."""

from __future__ import annotations

import os


def test_stream_embedding_drift_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.drift import embedding_drift_monitor
    from spec_search_spark.streaming.incremental import (
        stream_embedding_drift_query,
    )

    batch = embedding_drift_monitor(spark, sf_dir).collect()
    stream = stream_embedding_drift_query(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_stream_roc_auc_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.ml import roc_auc_doc_model
    from spec_search_spark.streaming.incremental import stream_roc_auc_query

    batch = roc_auc_doc_model(spark, sf_dir).collect()
    stream = stream_roc_auc_query(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


def test_adaptive_rank_walk_same_values_both_shapes(spark, sf_dir):
    """The small-table local window and the bucketed two-phase walk
    must be value-identical — the threshold only changes the plan."""
    from spec_search_spark.operators.rank_stats import (
        mad_outlier_orders,
        mannwhitney_priority_revenue,
    )

    def both(fn):
        prev = os.environ.get("SPARK_GRAFT_RANK_SMALL_MAX")
        try:
            os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = "0"
            big = fn(spark, sf_dir).collect()
            os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = str(10**12)
            small = fn(spark, sf_dir).collect()
        finally:
            if prev is None:
                os.environ.pop("SPARK_GRAFT_RANK_SMALL_MAX", None)
            else:
                os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = prev
        return big, small

    for fn in (mannwhitney_priority_revenue, mad_outlier_orders):
        big, small = both(fn)
        assert [tuple(r) for r in big] == [tuple(r) for r in small]


def test_stratified_sample_same_values_both_shapes(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import (
        stratified_quality_sample,
    )

    prev = os.environ.get("SPARK_GRAFT_RANK_SMALL_MAX")
    try:
        os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = "0"
        big = sorted(
            tuple(r) for r in stratified_quality_sample(spark, sf_dir).collect()
        )
        os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = str(10**12)
        small = sorted(
            tuple(r) for r in stratified_quality_sample(spark, sf_dir).collect()
        )
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_RANK_SMALL_MAX", None)
        else:
            os.environ["SPARK_GRAFT_RANK_SMALL_MAX"] = prev
    assert big == small
