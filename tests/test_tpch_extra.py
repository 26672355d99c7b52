"""Semantic invariants for the TPC-H completion pack (value-level
parity vs DuckDB is tools/selfcheck.py's job; these pin the properties
a hash-compare can't express — e.g. that the outer join really keeps
zero-count customers, that the argmax is the argmax)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_q2_min_price_is_group_min(spark, sf_dir):
    from spec_search_spark.operators.tpch_extra import q2_min_price_supplier

    rows = q2_min_price_supplier(spark, sf_dir).collect()
    assert rows
    # one min price per part, even when several suppliers tie at it
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["min_price"])
    assert all(len(v) == 1 for v in by_part.values())


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.tpch_extra import q13_custdist

    dist = {r["c_count"]: r["custdist"] for r in q13_custdist(spark, sf_dir).collect()}
    n_cust = load_table(spark, sf_dir, "customer").count()
    # the distribution partitions ALL customers, including count-0 ones
    assert sum(dist.values()) == n_cust


def test_q15_supplier_really_is_argmax(spark, sf_dir):
    from spec_search_spark.operators.tpch_extra import q15_top_supplier

    rows = q15_top_supplier(spark, sf_dir).collect()
    assert rows
    assert len({r["total_rev"] for r in rows}) == 1


def test_q21_returner_on_multi_supplier_order(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.tpch_extra import q21_sole_returner

    out = q21_sole_returner(spark, sf_dir)
    total_blamed = out.agg(F.sum("numwait")).first()[0] or 0
    # every blamed order is an 'F' order with ≥2 suppliers and exactly 1
    # returner, so blamed orders can never exceed all 'F' orders
    n_f = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").count()
    assert 0 < total_blamed <= n_f


def test_q22_customers_have_no_urgent_orders(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.tpch_extra import q22_idle_customers

    out = q22_idle_customers(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    # numcust per segment can never exceed the segment's population
    seg_sizes = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    for r in out.collect():
        assert 0 < r["numcust"] <= seg_sizes[r["c_mktsegment"]]
