"""Invariant tests for the collocation/SQL-surface/stream-attribution
batch (value parity vs DuckDB is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_collocation_pmi_counts_and_symmetric_bound(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import (
        PMI_MIN_COUNT,
        collocation_pmi,
    )

    rows = collocation_pmi(spark, sf_dir).collect()
    assert rows
    assert all(r["n_ab"] >= PMI_MIN_COUNT for r in rows)
    # PMI is bounded above by -ln(p(a,b)) <= ln(N_bi / n_ab): a pair
    # can't be more associated than perfectly predictive
    import math

    n_bi = sum(r["n_ab"] for r in rows)  # lower bound on true N_bi
    for r in rows:
        assert r["pmi"] <= math.log(n_bi / r["n_ab"]) + 1e-6


def test_lateral_topk_matches_window_form(spark, sf_dir):
    from spec_search_spark.operators.scalar_sql import sql_lateral_topk

    df = sql_lateral_topk(spark, sf_dir)
    per_nation = df.groupBy("n_name").count().collect()
    assert per_nation
    assert all(r["count"] <= 2 for r in per_nation)
    # each nation's rows are its true top customers by balance
    from spec_search_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    from pyspark.sql.window import Window as W

    truth = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("n_nationkey").orderBy(
                    F.desc("c_acctbal"), "c_name"
                )
            ),
        )
        .filter(F.col("rk") <= 2)
        .select("n_name", "c_name")
    )
    assert df.select("n_name", "c_name").exceptAll(truth).count() == 0


def test_listagg_is_ordered_by_rank(spark, sf_dir):
    from spec_search_spark.operators.scalar_sql import (
        LISTAGG_TOP_N,
        listagg_top_customers,
    )

    for r in listagg_top_customers(spark, sf_dir).collect():
        names = r["top_customers"].split(",")
        assert 1 <= len(names) <= LISTAGG_TOP_N
        assert len(set(names)) == len(names)


def test_stream_attribution_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.behavior import attribution_last_touch
    from spec_search_spark.streaming.stateful import stream_attribution_query

    batch = {
        r["channel"]: (r["n_purchases"], r["total_value"])
        for r in attribution_last_touch(spark, sf_dir).collect()
    }
    stream = {
        r["channel"]: (r["n_purchases"], r["total_value"])
        for r in stream_attribution_query(spark, sf_dir).collect()
    }
    assert batch == stream
