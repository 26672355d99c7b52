"""Skew-handling join: explicit key salting (SURVEY.md §2.3 scale
notes; the manual fallback when AQE's skew-join splitting isn't
available or the skew is in an aggregation key).

Semantics are identical to the plain join — the oracle is the plain
SQL join — only the physical distribution differs:

- the fact side appends a random-free, DETERMINISTIC salt
  (key mod-hash of the row's unique id) in [0, S);
- the dimension side is exploded S× with every salt value;
- the join key becomes (key, salt), splitting each hot key's rows
  across S reducers instead of one.

Cost model: S× duplication of the small side vs. eliminating the
straggler reducer — worth it when the hottest key exceeds ~1/S of a
reducer's budget. At 100 TB with a power-law key (views per user,
lineitems per mega-order) this is the difference between a 5-minute
and a 5-hour stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

N_SALTS = 8


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem on orderkey with an 8-way salt, aggregated to
    revenue per order status. Deterministic salt = l_linenumber % S
    (any per-row value works — it only spreads rows, never routes
    matches, because the dimension side carries every salt)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    salted_fact = li.withColumn("salt", (F.col("l_linenumber") % N_SALTS).cast("int"))
    salted_dim = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)]))
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact.l_orderkey == salted_dim.o_orderkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


SALTED_JOIN_SQL = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


HOT_KEY_MIN = 6  # fact rows per key to classify a key as hot


def adaptive_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential (hot/cold split) join — the surgical alternative to
    blanket salting: measure the fact side's key histogram first, then
    route ONLY the hot keys through a broadcast join (their dimension
    slice is small by construction — few keys are hot) while the cold
    majority takes the ordinary shuffle join. Union, aggregate.

    vs salted_join_revenue: salting multiplies the whole dimension S×
    no matter how mild the skew; the differential join pays one extra
    key-histogram aggregation (tiny — key cardinality, partial-agg'd)
    and duplicates nothing. At 100 TB with power-law keys this routes
    the handful of mega-keys around the straggler reducer and leaves
    the other 99.9% of traffic untouched. Semantics identical to the
    plain join — the oracle IS the plain join.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    hist = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    hot_keys = hist.filter(F.col("c") >= HOT_KEY_MIN).select("l_orderkey")

    li_hot = li.join(F.broadcast(hot_keys), "l_orderkey")
    li_cold = li.join(F.broadcast(hot_keys), "l_orderkey", "left_anti")
    ord_hot = orders.join(
        F.broadcast(hot_keys.select(F.col("l_orderkey").alias("o_orderkey"))),
        "o_orderkey",
    )

    hot_joined = li_hot.join(F.broadcast(ord_hot), li_hot.l_orderkey == ord_hot.o_orderkey)
    cold_joined = li_cold.join(orders, li_cold.l_orderkey == orders.o_orderkey)
    both = hot_joined.select(
        "o_orderpriority", "l_quantity", "l_extendedprice", "l_discount"
    ).unionByName(
        cold_joined.select("o_orderpriority", "l_quantity", "l_extendedprice", "l_discount")
    )
    return both.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


ADAPTIVE_SKEW_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


SKEW_TOP = 10


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the measurement pass that decides
    WHICH of this module's strategies to deploy: per-key frequencies of
    the lineitem join key, the 10 hottest keys with their share of the
    table, and each key's ratio to a uniform share. At 100 TB this is
    one partial+final count (shuffle ∝ distinct keys) + a TakeOrdered
    over key counts — the cheap pre-flight before choosing blanket
    salting, differential routing, or trusting AQE.

    Output: (l_orderkey, cnt, share, x_uniform)."""
    from pyspark.sql import functions as F

    from spec_search_spark.catalog import load_table
    from spec_search_spark.session import tune

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "l_orderkey",
            "cnt",
            F.round(F.col("cnt") / F.col("n_rows"), 8).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("n_rows"), 4).alias(
                "x_uniform"
            ),
        )
        .orderBy(F.desc("cnt"), "l_orderkey")
        .limit(SKEW_TOP)
    )


SKEW_PROFILE_SQL = f"""
WITH counts AS (
  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
),
totals AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM counts)
SELECT l_orderkey, cnt,
       round(cnt / n_rows, 8) AS share,
       round(cnt * n_keys / n_rows, 4) AS x_uniform
FROM counts, totals
ORDER BY cnt DESC, l_orderkey LIMIT {SKEW_TOP}
"""


QUERIES = {
    "salted_join_revenue": salted_join_revenue,
    "adaptive_skew_join": adaptive_skew_join,
    "skew_profile": skew_profile,
}
ORACLES = {
    "salted_join_revenue": SALTED_JOIN_SQL,
    "adaptive_skew_join": ADAPTIVE_SKEW_SQL,
    "skew_profile": SKEW_PROFILE_SQL,
}
