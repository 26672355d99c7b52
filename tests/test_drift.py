"""Drift-test invariants (value parity vs DuckDB is selfcheck's job)."""

from __future__ import annotations


def test_ks_matches_scipy_free_reference(spark, sf_dir):
    """Exact D via a direct two-pointer merge over the collected
    samples — independent of the shared integer-cumulative oracle."""
    from spec_search_spark.operators.drift import (
        KS_A,
        KS_B,
        ks_test_priority_revenue,
    )
    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    row = ks_test_priority_revenue(spark, sf_dir).first()
    o = load_table(spark, sf_dir, "orders")
    a = sorted(
        r[0]
        for r in o.filter(F.col("o_orderpriority") == KS_A)
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    b = sorted(
        r[0]
        for r in o.filter(F.col("o_orderpriority") == KS_B)
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    values = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for v in values:
        f1 = bisect.bisect_right(a, v) / len(a)
        f2 = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(f1 - f2))
    assert abs(row["ks_d"] - d) < 1e-6
    assert 0.0 <= row["ks_d"] <= 1.0


def test_psi_is_symmetric_zero_on_identical_halves(spark, sf_dir):
    """PSI properties: finite, non-negative, and the band matches the
    conventional thresholds."""
    from spec_search_spark.operators.drift import psi_value_drift

    row = psi_value_drift(spark, sf_dir).first()
    assert row["n1"] > 0 and row["n2"] > 0
    assert row["psi"] >= 0.0 or abs(row["psi"]) < 1e-6
    expected_band = (
        "stable" if row["psi"] < 0.1 else ("moderate" if row["psi"] < 0.2 else "shifted")
    )
    assert row["band"] == expected_band


def test_stream_psi_equals_batch_psi(spark, sf_dir):
    # the streaming twin must reproduce the batch drift score exactly:
    # same bins, same nano-unit fold, only the count-table construction
    # differs (streaming state vs one batch aggregation)
    from spec_search_spark.operators.drift import psi_value_drift
    from spec_search_spark.streaming.incremental import stream_psi_drift_query

    b = psi_value_drift(spark, sf_dir).collect()[0]
    s = stream_psi_drift_query(spark, sf_dir).collect()[0]
    assert (b["n1"], b["n2"], b["psi"], b["band"]) == (
        s["n1"],
        s["n2"],
        s["psi"],
        s["band"],
    )
