"""Bloom semi-join reduction: the pruning claims are pinned here (the
value parity of the final join is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.operators.runtime_filter import (
    M_BITS,
    N_WORDS,
    bloom_build,
    bloom_might_contain,
)


def _parts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1996)
    )
    keys = orders.select("o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return keys, lineitem


def test_filter_is_one_compact_row(spark, sf_dir):
    keys, _ = _parts(spark, sf_dir)
    rows = bloom_build(keys, "o_orderkey").collect()
    assert len(rows) == 1
    words = rows[0]["words"]
    assert len(words) == N_WORDS == M_BITS // 64
    assert any(w != 0 for w in words)


def test_no_false_negatives_and_real_pruning(spark, sf_dir):
    keys, lineitem = _parts(spark, sf_dir)
    bloom = bloom_build(keys, "o_orderkey")
    probed = lineitem.crossJoin(F.broadcast(bloom)).withColumn(
        "hit", bloom_might_contain("l_orderkey")
    )
    # no false negatives: every lineitem of a build-side order passes
    truth = lineitem.join(
        keys, lineitem.l_orderkey == keys.o_orderkey, "left_semi"
    )
    n_true = truth.count()
    missed = (
        probed.filter(~F.col("hit"))
        .join(keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .count()
    )
    assert missed == 0
    # real pruning: the filter sheds the overwhelming share of the fact
    # table (selectivity ~3% here), and false positives stay tiny
    n_total = lineitem.count()
    n_pass = probed.filter("hit").count()
    assert n_pass < 0.1 * n_total
    fp = n_pass - n_true
    assert fp <= max(5, 0.01 * n_total)
