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
from pyspark.sql.window import Window

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
    # pin: both sides of the pair self-join read the size-filtered
    # table; lazily each re-runs the distinct + size-filter shuffles.
    items = items.join(
        sized.filter(F.col("k") <= MAX_BASKET).select("l_orderkey"), "l_orderkey"
    ).localCheckpoint(eager=True)
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

RULE_MIN_SUPPORT = 3  # pair must appear in >= this many baskets
TOP_RULES = 20


def association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules p1 → p2 from the co-occurrence pass:
    support, confidence = n(p1,p2)/n(p1), and lift =
    N·n(p1,p2)/(n(p1)·n(p2)) — the Apriori level-2 output a
    recommender actually consumes (`copurchase_pairs` is its counting
    core; this adds the per-item margins and the rule quality
    measures, both exact integer ratios snapped on the 1e-6 grid).

    Plan: the pair table (min-support pruned — Apriori's antimonotone
    cut) joins the item-margin table TWICE on the item key; margins
    are item-cardinality-sized so at 100 TB both joins stay key-local
    shuffles; one TakeOrdered emits the top rules by (lift, rule id).

    Output: (p1, p2, n_both, confidence, lift) for both directions of
    each surviving pair, top-{K} by lift with a unique tiebreak."""
    tune(spark)
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sized = items.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    # pin the size-filtered basket table: the margin pass, the basket
    # count and BOTH sides of the pair self-join read it, and lazily
    # each consumer re-runs the distinct + size-filter shuffles. Two
    # int columns, item-occurrence-sized.
    items = items.join(
        sized.filter(F.col("k") <= MAX_BASKET).select("l_orderkey"),
        "l_orderkey",
    ).localCheckpoint(eager=True)
    no = items.agg(F.countDistinct("l_orderkey").alias("n"))
    margin = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= RULE_MIN_SUPPORT)
    )
    directed = pairs.unionByName(
        pairs.select(
            F.col("p2").alias("p1"), F.col("p1").alias("p2"), "n_both"
        )
    )
    out = (
        directed.join(
            margin.select(F.col("l_partkey").alias("p1"), F.col("n_item").alias("n1")),
            "p1",
        )
        .join(
            margin.select(F.col("l_partkey").alias("p2"), F.col("n_item").alias("n2")),
            "p2",
        )
        .crossJoin(F.broadcast(no))
        .selectExpr(
            "p1",
            "p2",
            "n_both",
            "cast(round(n_both / cast(n1 as double) * 1e6) as bigint) / 1e6"
            " AS confidence",
            "cast(round(n * n_both / (cast(n1 as double) * n2)"
            " * 1e6) as bigint) / 1e6 AS lift",
        )
    )
    return out.orderBy(F.desc("lift"), "p1", "p2").limit(TOP_RULES)


def _rules_sql() -> str:
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
kept AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING count(*) <= {MAX_BASKET}
),
it AS (SELECT i.* FROM items i JOIN kept USING (l_orderkey)),
no AS (SELECT count(DISTINCT l_orderkey) AS n FROM it),
margin AS (SELECT l_partkey, count(*) AS n_item FROM it GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {RULE_MIN_SUPPORT}
),
directed AS (
  SELECT p1, p2, n_both FROM pairs
  UNION ALL SELECT p2, p1, n_both FROM pairs
)
SELECT d.p1, d.p2, d.n_both,
       CAST(round(d.n_both / CAST(m1.n_item AS DOUBLE) * 1e6) AS BIGINT)
         / 1e6 AS confidence,
       CAST(round(no.n * d.n_both / (CAST(m1.n_item AS DOUBLE) * m2.n_item)
            * 1e6) AS BIGINT) / 1e6 AS lift
FROM directed d
JOIN margin m1 ON m1.l_partkey = d.p1
JOIN margin m2 ON m2.l_partkey = d.p2
CROSS JOIN no
ORDER BY lift DESC, d.p1, d.p2 LIMIT {TOP_RULES}
"""


ASSOCIATION_RULES_SQL = _rules_sql()

# --- recommendation eval: leave-one-out hit rate ------------------------------

REC_TEST_MOD = 5   # baskets with l_orderkey % 5 == 0 are held out
REC_TOP_K = 5      # recommendations scored per basket
REC_MIN_SUPPORT = 2  # train-side pair support floor


def rules_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out evaluation of the co-purchase recommender: train
    directed rules on 80% of baskets, and for each held-out basket
    hide its max-partkey item, recommend top-{K} candidates by rule
    confidence from the remaining items, and score a hit when the
    hidden item is recommended — the offline hit-rate@K every
    recommender ships before an A/B slot (the basket-side member of
    the repo's eval-loop family: minhash_eval / ann_recall /
    quality_auc / holt_backtest).

    Determinism: confidences are snapped rationals, candidate ranking
    orders by (confidence desc, candidate id) — a total order; the
    holdout choice (max partkey) is content-derived. Plan: rule
    training is the `association_rules` shape on the train split;
    scoring is two item-keyed joins plus a per-basket bounded window;
    the report is one partial+final row.

    Output: (n_test_baskets, n_scored, n_hits, hit_rate)."""
    tune(spark)
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sized = items.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    # pin as in association_rules: train/test splits, margins, the pair
    # self-join and the seed/candidate joins all read this table.
    items = items.join(
        sized.filter(F.col("k") <= MAX_BASKET).select("l_orderkey"),
        "l_orderkey",
    ).localCheckpoint(eager=True)
    is_test = F.expr(f"l_orderkey % {REC_TEST_MOD} = 0")
    train, test = items.filter(~is_test), items.filter(is_test)
    margin = train.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n1"))
    a, b = train.alias("a"), train.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= REC_MIN_SUPPORT)
    )
    rules = pairs.join(
        margin.select(F.col("l_partkey").alias("p1"), "n1"), "p1"
    ).selectExpr(
        "p1",
        "p2",
        "cast(round(n_both / cast(n1 as double) * 1e6) as bigint) AS conf6",
    )
    # held-out target per test basket (k >= 2 so a seed remains)
    per_basket = test.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("k"), F.max("l_partkey").alias("target")
    )
    scorable = per_basket.filter(F.col("k") >= 2)
    seeds = test.join(F.broadcast(scorable), "l_orderkey").filter(
        F.col("l_partkey") != F.col("target")
    )
    cand = (
        seeds.join(rules, seeds.l_partkey == rules.p1)
        .select("l_orderkey", "target", F.col("p2").alias("cand"), "conf6")
        .join(
            test.selectExpr("l_orderkey", "l_partkey AS cand").withColumn(
                "in_seed", F.lit(1)
            ),
            ["l_orderkey", "cand"],
            "left",
        )
        .filter(F.col("in_seed").isNull() | (F.col("cand") == F.col("target")))
        .groupBy("l_orderkey", "target", "cand")
        .agg(F.max("conf6").alias("score6"))
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("score6"), F.asc("cand")
    )
    topk = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= REC_TOP_K
    )
    hits = topk.filter(F.col("cand") == F.col("target")).select("l_orderkey")
    return (
        scorable.agg(F.count(F.lit(1)).alias("n_scored"))
        .crossJoin(
            F.broadcast(
                per_basket.agg(F.count(F.lit(1)).alias("n_test_baskets"))
            )
        )
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .selectExpr(
            "n_test_baskets",
            "n_scored",
            "n_hits",
            "cast(round(n_hits / cast(n_scored as double) * 1e6) as bigint)"
            " / 1e6 AS hit_rate",
        )
    )


RULES_HITRATE_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
kept AS (
  SELECT l_orderkey FROM items GROUP BY l_orderkey
  HAVING count(*) <= {MAX_BASKET}
),
it AS (SELECT i.* FROM items i JOIN kept USING (l_orderkey)),
train AS (SELECT * FROM it WHERE l_orderkey % {REC_TEST_MOD} <> 0),
test AS (SELECT * FROM it WHERE l_orderkey % {REC_TEST_MOD} = 0),
margin AS (SELECT l_partkey, count(*) AS n1 FROM train GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
  FROM train a JOIN train b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {REC_MIN_SUPPORT}
),
rules AS (
  SELECT p.p1, p.p2,
         CAST(round(p.n_both / CAST(m.n1 AS DOUBLE) * 1e6) AS BIGINT)
           AS conf6
  FROM pairs p JOIN margin m ON m.l_partkey = p.p1
),
per_basket AS (
  SELECT l_orderkey, count(*) AS k, max(l_partkey) AS target
  FROM test GROUP BY l_orderkey
),
scorable AS (SELECT * FROM per_basket WHERE k >= 2),
seeds AS (
  SELECT t.l_orderkey, t.l_partkey, s.target
  FROM test t JOIN scorable s USING (l_orderkey)
  WHERE t.l_partkey <> s.target
),
cand AS (
  SELECT s.l_orderkey, s.target, r.p2 AS cand, max(r.conf6) AS score6
  FROM seeds s JOIN rules r ON r.p1 = s.l_partkey
  LEFT JOIN test x ON x.l_orderkey = s.l_orderkey AND x.l_partkey = r.p2
  WHERE x.l_partkey IS NULL OR r.p2 = s.target
  GROUP BY 1, 2, 3
),
topk AS (
  SELECT l_orderkey, target, cand,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY score6 DESC, cand) AS rn
  FROM cand
),
hits AS (
  SELECT count(*) AS n_hits FROM topk
  WHERE rn <= {REC_TOP_K} AND cand = target
)
SELECT (SELECT count(*) FROM per_basket) AS n_test_baskets,
       (SELECT count(*) FROM scorable) AS n_scored,
       h.n_hits,
       CAST(round(h.n_hits / CAST((SELECT count(*) FROM scorable) AS DOUBLE)
            * 1e6) AS BIGINT) / 1e6 AS hit_rate
FROM hits h
"""


QUERIES = {
    "copurchase_pairs": copurchase_pairs,
    "association_rules": association_rules,
    "rules_hitrate_eval": rules_hitrate_eval,
}
ORACLES = {
    "copurchase_pairs": COPURCHASE_SQL,
    "association_rules": ASSOCIATION_RULES_SQL,
    "rules_hitrate_eval": RULES_HITRATE_SQL,
}
