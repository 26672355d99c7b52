"""Market-basket affinity: within-order item co-occurrence — the
association-mining primitive (the pair-counting core of Apriori /
FP-growth's first pass), expressed as a co-located self-join.

Scale design: the pair join keys on l_orderkey, so Catalyst shuffles
both sides on the SAME key and the pair explosion happens co-located
within each basket — pair count is Σ_orders k²/2 with k = basket size
(TPC-H baskets are ≤ 7 items; real carts are similar). At 100 TB the
guard is a hot-basket cap (drop baskets with k > threshold — a
thousand-item basket contributes no retail signal and 500k pairs),
mirrored from the hot-shingle cap in dedup.py. The distinct-first
collapse (order, part) pairs BEFORE the join so quantity
multiplicities never multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

TOP_PAIRS = 20
MAX_BASKET = 50  # hot-basket cap (inert on TPC-H's ≤7-item orders)


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs by number of shared orders.
    Output: (p1, p2, n_orders) with p1 < p2, ordered by
    (n_orders desc, p1, p2)."""
    tune(spark)
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sized = items.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    items = items.join(
        sized.filter(F.col("k") <= MAX_BASKET).select("l_orderkey"), "l_orderkey"
    )
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return pairs.orderBy(F.desc("n_orders"), "p1", "p2").limit(TOP_PAIRS)


COPURCHASE_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
kept AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING count(*) <= {MAX_BASKET}
),
it AS (SELECT i.* FROM items i JOIN kept USING (l_orderkey)),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p1, p2, n_orders FROM pairs
ORDER BY n_orders DESC, p1, p2 LIMIT {TOP_PAIRS}
"""

QUERIES = {"copurchase_pairs": copurchase_pairs}
ORACLES = {"copurchase_pairs": COPURCHASE_SQL}
