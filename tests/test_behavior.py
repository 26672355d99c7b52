"""Invariant tests for the behavioral-analytics pack (value parity vs
DuckDB is covered by tools/selfcheck.py — these pin the structural
claims each operator's docstring makes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table


def test_streak_histogram_accounts_for_every_active_day(spark, sf_dir):
    from spec_search_spark.operators.behavior import activity_streaks

    rows = activity_streaks(spark, sf_dir).collect()
    assert rows
    assert all(r["streak_len"] >= 1 and r["n_streaks"] >= 1 for r in rows)
    # sum(len × count) == total distinct (user, day) pairs: every
    # active day belongs to exactly one island
    total_days = sum(r["streak_len"] * r["n_streaks"] for r in rows)
    ev = load_table(spark, sf_dir, "events")
    expected = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .count()
    )
    assert total_days == expected


def test_transition_matrix_rows_normalize(spark, sf_dir):
    from spec_search_spark.operators.behavior import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    n_by_prev: dict[str, int] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
        n_by_prev[r["prev_type"]] = n_by_prev.get(r["prev_type"], 0) + r["n"]
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)
    # transition count == events minus one per multi-event user
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(n_by_prev.values()) == n_events - n_users


def test_attribution_covers_all_purchases(spark, sf_dir):
    from spec_search_spark.operators.behavior import attribution_last_touch

    rows = attribution_last_touch(spark, sf_dir).collect()
    assert rows
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purchases
    # a purchase is never its own channel: credit goes to a
    # non-purchase touch or to 'direct'
    assert "purchase" not in {r["channel"] for r in rows}


def test_cumulative_distinct_is_monotone_and_caps_at_true_distinct(spark, sf_dir):
    from spec_search_spark.operators.behavior import cumulative_distinct_parts

    df = cumulative_distinct_parts(spark, sf_dir)
    # final value per customer == true distinct part count
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    truth = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_partkey").alias("n_distinct"))
    )
    final = df.groupBy("o_custkey").agg(
        F.max("cum_distinct_parts").alias("cum_max")
    )
    diff = final.join(truth, "o_custkey").filter(
        F.col("cum_max") != F.col("n_distinct")
    )
    assert diff.count() == 0


def test_ab_welch_shape_and_arm_partition(spark, sf_dir):
    from spec_search_spark.operators.behavior import ab_test_welch

    rows = ab_test_welch(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    n_orders = load_table(spark, sf_dir, "orders").count()
    # hash split partitions orders exactly (every order's customer is
    # in exactly one arm)
    assert r["n_a"] + r["n_b"] == n_orders
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["df"] > 0
    # under a pure hash split there is no treatment effect: t should
    # be small (|t| < 5 is ~always true for a null effect)
    assert abs(r["t_stat"]) < 5
