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


QUERIES = {"salted_join_revenue": salted_join_revenue}
ORACLES = {"salted_join_revenue": SALTED_JOIN_SQL}
