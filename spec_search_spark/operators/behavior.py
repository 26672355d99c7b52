"""Behavioral-analytics pack over `events` / `orders` / `lineitem`:
activity streaks (gaps-and-islands), Markov event transitions,
last-touch attribution, cumulative-distinct windows, and a Welch
two-sample A/B report — the product/marketing-analytics surface a
warehouse query engine is expected to answer (SURVEY.md §2.5 family;
absent in the reference, required by the target engine — the
reference's only behavioral read is the retrieve+render loop at
app.py:50-61, these are its engine-side generalizations).

Scale notes: every operator here is windows + partial/final
aggregation — no self-joins, no Python in the hot path, shuffles
keyed on user_id / custkey only. The gaps-and-islands trick
(day_number - row_number) and the first-occurrence trick
(row_number == 1 instead of DISTINCT-over-window) are chosen
precisely because they keep a 100 TB event log to ONE shuffle per
partitioning instead of a distinct-per-frame re-scan.

Determinism: window order keys always end in a unique column
(event_id / orderkey / linenumber); derived statistics are computed
from ROUNDED components so both engines do identical arithmetic on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spec_search_spark.catalog import load_table
from spec_search_spark.operators.dedup import _POLY_SQL, _poly_hash
from spec_search_spark.session import tune


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# --- gaps & islands: consecutive-day activity streaks -----------------------


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of consecutive active DAYS per user (the classic
    gaps-and-islands problem), reported as a streak-length histogram.

    Plan: distinct (user, day) collapses map-side first (events →
    user-day cardinality before any window), then ONE window pass per
    user ordered by day — `day_number - row_number` is constant within
    a run, so island detection is a subtraction, not a self-join. Two
    further partial+final aggs produce the histogram. At 100 TB the
    only event-cardinality stage is the map-side distinct.

    Output: (streak_len, n_streaks)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    days = ev.distinct().withColumn(
        "dn", F.datediff(F.col("d"), F.lit("1970-01-01")).cast("long")
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("dn"))
    islands = days.select(
        "user_id", "dn", (F.col("dn") - rn).alias("grp")
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("streak_len").agg(
        F.count(F.lit(1)).alias("n_streaks")
    )


ACTIVITY_STREAKS_SQL = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
nums AS (SELECT user_id,
                date_diff('day', DATE '1970-01-01', d) AS dn
         FROM days),
islands AS (SELECT user_id,
                   dn - row_number() OVER (PARTITION BY user_id ORDER BY dn)
                     AS grp
            FROM nums),
streaks AS (SELECT user_id, grp, count(*) AS streak_len
            FROM islands GROUP BY user_id, grp)
SELECT streak_len, count(*) AS n_streaks
FROM streaks GROUP BY streak_len
"""


# --- Markov transition matrix over event types ------------------------------


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between consecutive events of
    each user: P(next event type | current event type). The sequence
    model behind next-action prediction and session-flow dashboards.

    Plan: one window shuffle on user_id (lag over a total per-user
    order ts,event_id), then partial+final count on the (prev, curr)
    pair — the transition matrix is |types|² rows regardless of corpus
    size. Probabilities are exact rationals divided as doubles →
    bit-equal across engines.

    Output: (prev_type, curr_type, n, p) — p normalized per prev_type."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "curr_type",
        "n",
        F.expr(
            "cast(round(n / sum(n) OVER (PARTITION BY prev_type) * 1e6) as bigint) / 1e6"
        ).alias("p"),
    )


EVENT_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
pairs AS (SELECT prev_type, event_type AS curr_type, count(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type)
SELECT prev_type, curr_type, n,
       CAST(round(n / sum(n) OVER (PARTITION BY prev_type) * 1e6) AS BIGINT) / 1e6 AS p
FROM pairs
"""


# --- last-touch attribution -------------------------------------------------


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every purchase is credited to the LAST
    non-purchase event type the user emitted before it ('direct' if
    none). Built as last(ignore-nulls) over a per-user window — one
    shuffle on user_id, no point-in-time self-join (the naive
    formulation is purchases × events; the window form is linear).

    Output: (channel, n_purchases, total_value)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    attributed = (
        ev.withColumn("channel", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce("channel", F.lit("direct")).alias("channel"), "value")
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


ATTRIBUTION_SQL = """
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events)
SELECT coalesce(channel, 'direct') AS channel,
       count(*) AS n_purchases,
       round(sum(value), 2) AS total_value
FROM touched WHERE event_type = 'purchase'
GROUP BY coalesce(channel, 'direct')
"""


# --- position-based (U-shaped) multi-touch attribution ----------------------

PB_EDGE_PPM = 400_000  # first & last touch: 40% each
PB_MID_PPM = 200_000  # the middle 20%, split over k-2 touches


def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution —
    the standard upgrade from `attribution_last_touch`: every purchase
    credits ALL touches since the user's previous purchase, 40% to the
    first, 40% to the last, 20% split over the middle (100% to a lone
    touch, 50/50 for two, 'direct' when the purchase had no preceding
    touch). Credits are integer ppm so channel totals are exact sums,
    and the middle split distributes its integer remainder
    deterministically — floor(PB_MID_PPM/(k-2)) to every middle, +1 to
    the first (PB_MID_PPM mod (k-2)) middles by position — so every
    conversion's credits sum to EXACTLY 1,000,000 ppm (ADVICE r6: a
    rounded division over- or under-credited by up to k-3 ppm).

    Plan shape: one pass marks each event with its conversion segment
    (running purchase count, the last-touch window trick — never a
    purchases×events point-in-time join); per-(user, segment) windows
    rank touches (bounded by one user's inter-purchase activity);
    touch→purchase is an equi-join on (user_id, segment). Credited
    value accumulates as ppm×cents integer products in DECIMAL(38,0).

    Output: (channel, n_credits, credit_ppm, credited_dollars)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w_seg = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    base = ev.withColumn(
        "seg",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_seg),
            F.lit(0),
        ),
    )
    touches = base.filter(F.col("event_type") != "purchase").select(
        "user_id", "seg", "ts", "event_id", F.col("event_type").alias("channel")
    )
    w_pos = W.partitionBy("user_id", "seg").orderBy("ts", "event_id")
    w_cnt = W.partitionBy("user_id", "seg")
    tpos = touches.withColumn("pos", F.row_number().over(w_pos)).withColumn(
        "k", F.count(F.lit(1)).over(w_cnt)
    )
    purch = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("seg").alias("pseg"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    credit = (
        F.when(F.col("k") == 1, F.lit(1_000_000))
        .when(F.col("k") == 2, F.lit(500_000))
        .when(F.col("pos") == 1, F.lit(PB_EDGE_PPM))
        .when(F.col("pos") == F.col("k"), F.lit(PB_EDGE_PPM))
        .otherwise(
            F.expr(
                f"cast({PB_MID_PPM} div (k - 2)"
                f" + (CASE WHEN pos - 1 <= {PB_MID_PPM} % (k - 2)"
                " THEN 1 ELSE 0 END) as bigint)"
            )
        )
    )
    credited = tpos.join(
        purch,
        (tpos["user_id"] == purch["user_id"]) & (tpos["seg"] == purch["pseg"]),
    ).select("channel", credit.alias("credit"), "cents")
    per_channel = credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("credit").cast("bigint").alias("credit_ppm"),
        F.sum(F.expr("cast(credit as decimal(38,0)) * cents")).alias("cv"),
    )
    tkeys = touches.select("user_id", "seg").distinct()
    direct = (
        purch.join(
            tkeys,
            (purch["user_id"] == tkeys["user_id"])
            & (purch["pseg"] == tkeys["seg"]),
            "left_anti",
        )
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sc"))
        .selectExpr(
            "'direct' AS channel",
            "cast(n as bigint) AS n_credits",
            "cast(n * 1000000 as bigint) AS credit_ppm",
            "cast(cast(sc as decimal(38,0)) * 1000000 as decimal(38,0)) AS cv",
        )
    )
    return (
        per_channel.unionByName(direct)
        .selectExpr(
            "channel",
            "n_credits",
            "credit_ppm",
            "cast(round(cast(cv as double) / 1e8 * 1e4) as bigint) / 1e4"
            " AS credited_dollars",
        )
        .orderBy("channel")
    )


ATTRIBUTION_PB_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
  FROM events
),
tpos AS (
  SELECT user_id, seg, event_type AS channel,
         row_number() OVER (PARTITION BY user_id, seg
                            ORDER BY ts, event_id) AS pos,
         count(*) OVER (PARTITION BY user_id, seg) AS k
  FROM base WHERE event_type <> 'purchase'
),
purch AS (
  SELECT user_id, seg AS pseg, cents FROM base WHERE event_type = 'purchase'
),
credited AS (
  SELECT t.channel,
         CASE WHEN t.k = 1 THEN 1000000
              WHEN t.k = 2 THEN 500000
              WHEN t.pos = 1 THEN {PB_EDGE_PPM}
              WHEN t.pos = t.k THEN {PB_EDGE_PPM}
              ELSE CAST({PB_MID_PPM} // (t.k - 2)
                     + (CASE WHEN t.pos - 1 <= {PB_MID_PPM} % (t.k - 2)
                        THEN 1 ELSE 0 END) AS BIGINT)
         END AS credit,
         p.cents
  FROM tpos t JOIN purch p ON p.user_id = t.user_id AND p.pseg = t.seg
),
per_channel AS (
  SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
         CAST(sum(credit) AS BIGINT) AS credit_ppm,
         sum(CAST(credit AS DECIMAL(38,0)) * cents) AS cv
  FROM credited GROUP BY channel
),
direct AS (
  SELECT 'direct' AS channel, CAST(count(*) AS BIGINT) AS n_credits,
         CAST(count(*) * 1000000 AS BIGINT) AS credit_ppm,
         CAST(sum(cents) AS DECIMAL(38,0)) * 1000000 AS cv
  FROM purch p
  WHERE NOT EXISTS (SELECT 1 FROM tpos t
                    WHERE t.user_id = p.user_id AND t.seg = p.pseg)
)
SELECT channel, n_credits, credit_ppm,
       CAST(round(CAST(cv AS DOUBLE) / 1e8 * 1e4) AS BIGINT) / 1e4
         AS credited_dollars
FROM (SELECT * FROM per_channel UNION ALL SELECT * FROM direct)
ORDER BY channel
"""


# --- cumulative distinct over a window --------------------------------------


def cumulative_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of DISTINCT parts each customer has ever ordered,
    as of each order — the 'cumulative distinct' window that SQL
    engines cannot express as count(DISTINCT) OVER without a per-frame
    re-scan. First-occurrence trick: row_number()==1 per
    (customer, part) marks the first purchase of that part; a plain
    running SUM of new-part counts per order is then the distinct
    count. Two window passes (one per partitioning), both linear.

    Output: (o_custkey, o_orderkey, cum_distinct_parts)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    rows = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("o_custkey", "o_orderkey", "o_orderdate", "l_partkey", "l_linenumber")
    first = F.row_number().over(
        W.partitionBy("o_custkey", "l_partkey").orderBy(
            "o_orderdate", "o_orderkey", "l_linenumber"
        )
    )
    per_order = (
        rows.withColumn("is_new", F.when(first == 1, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum("is_new").alias("new_parts"))
    )
    cum = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return per_order.select(
        "o_custkey",
        "o_orderkey",
        F.sum("new_parts").over(cum).alias("cum_distinct_parts"),
    )


CUM_DISTINCT_SQL = """
WITH rows_ AS (
  SELECT o_custkey, o_orderkey, o_orderdate, l_partkey, l_linenumber
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
marked AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN row_number() OVER (
                PARTITION BY o_custkey, l_partkey
                ORDER BY o_orderdate, o_orderkey, l_linenumber) = 1
              THEN 1 ELSE 0 END AS is_new
  FROM rows_),
per_order AS (
  SELECT o_custkey, o_orderkey, o_orderdate, sum(is_new) AS new_parts
  FROM marked GROUP BY o_custkey, o_orderkey, o_orderdate)
SELECT o_custkey, o_orderkey,
       CAST(sum(new_parts) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS cum_distinct_parts
FROM per_order
"""


# --- Welch two-sample A/B report --------------------------------------------

AB_ARMS = 2  # hash-mod arm assignment: 0 = control, 1 = treatment


def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B analysis of order value under a deterministic
    hash split of customers (same salted-hash membership rule as
    hash_split_report — reproducible with no RNG state): per-arm n /
    mean / variance plus Welch's t statistic and the
    Welch–Satterthwaite degrees of freedom.

    Plan: the arm is a per-row hash (Arrow-batched, pre-exchange);
    everything aggregates in ONE conditional partial+final pass (no
    join between arms, no second scan). The t/df arithmetic runs on
    ROUNDED per-arm moments so both engines compute identical
    doubles.

    Output: one row (n_a, n_b, mean_a, mean_b, t_stat, df)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    arm = F.pmod(
        _poly_hash(F.concat(F.lit("ab:"), F.col("c_custkey").cast("string"))),
        F.lit(AB_ARMS),
    )
    assigned = orders.join(
        customer.select("c_custkey", arm.alias("arm")),
        orders.o_custkey == F.col("c_custkey"),
    )
    in_a = F.col("arm") == 0
    in_b = F.col("arm") == 1
    moments = assigned.agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.round(F.avg(F.when(in_a, F.col("o_totalprice"))), 4).alias("mean_a"),
        F.round(F.avg(F.when(in_b, F.col("o_totalprice"))), 4).alias("mean_b"),
        F.round(F.var_samp(F.when(in_a, F.col("o_totalprice"))), 2).alias("var_a"),
        F.round(F.var_samp(F.when(in_b, F.col("o_totalprice"))), 2).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    se2 = se_a + se_b
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    df = (se2 * se2) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return moments.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        F.round(t, 6).alias("t_stat"),
        F.round(df, 2).alias("df"),
    )


_AB_H = _POLY_SQL.format(s="'ab:' || CAST(c_custkey AS VARCHAR)")
AB_TEST_SQL = f"""
WITH assigned AS (
  SELECT o_totalprice,
         (({_AB_H} % {AB_ARMS}) + {AB_ARMS}) % {AB_ARMS} AS arm
  FROM orders JOIN customer ON o_custkey = c_custkey),
m AS (
  SELECT count(*) FILTER (arm = 0) AS n_a,
         count(*) FILTER (arm = 1) AS n_b,
         round(avg(o_totalprice) FILTER (arm = 0), 4) AS mean_a,
         round(avg(o_totalprice) FILTER (arm = 1), 4) AS mean_b,
         round(var_samp(o_totalprice) FILTER (arm = 0), 2) AS var_a,
         round(var_samp(o_totalprice) FILTER (arm = 1), 2) AS var_b
  FROM assigned)
SELECT n_a, n_b, mean_a, mean_b,
       round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
       round(pow(var_a / n_a + var_b / n_b, 2)
             / (pow(var_a / n_a, 2) / (n_a - 1)
                + pow(var_b / n_b, 2) / (n_b - 1)), 2) AS df
FROM m
"""


# --- exponentially weighted moving average ---------------------------------

EWMA_ALPHA = 0.125  # 1/8: exactly representable in binary, so the fold
# arithmetic is bit-identical across engines (no decimal-fraction noise)


def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values —
    the recursive time-series smoother (pandas .ewm, TimescaleDB
    continuous aggs) that windows cannot express without a per-frame
    power series. Built as an ordered JVM fold: collect the user's
    (ts, event_id, value) structs, array_sort (total order — event_id
    breaks ts ties), seed with the first value, then a codegen
    `aggregate` lambda folds α·x + (1−α)·acc left-to-right. DuckDB
    mirrors with list(ORDER BY)+list_reduce — identical fold order,
    identical doubles.

    Scale: state per user is its own event list (the same bound any
    sequence model needs); the fold itself is JVM-side, no Python.
    At 100 TB you'd segment-fold per day and carry the EWMA across
    segments with the decay identity ewma(a∥b) = fold(b, seed=ewma(a))
    — same kernel, checkpointed seeds.

    Output: (user_id, n_events, ewma_value)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), arr.alias("arr")
    )
    vals = F.transform(F.col("arr"), lambda s: s["value"])
    first = F.element_at(vals, 1)
    rest = F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        first,
        lambda acc, x: F.lit(EWMA_ALPHA) * x + F.lit(1 - EWMA_ALPHA) * acc,
    )
    return agg.select("user_id", "n_events", F.round(ewma, 6).alias("ewma_value"))


EWMA_SQL = f"""
SELECT user_id, count(*) AS n_events,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc),
             6) AS ewma_value
FROM events GROUP BY user_id
"""


# --- Kaplan–Meier survival: time-to-churn with right censoring --------------

KM_CENSOR_DAYS = 7  # last event inside the final week => user still active
KM_LN_SCALE = 1_000_000_000  # log factors as integer nano-nats


def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of user "lifetime" (days between
    first and last event), with RIGHT CENSORING: users whose last event
    falls within KM_CENSOR_DAYS of the observation window's end are
    censored (still active — their true lifetime is only known to be
    ≥ the observed one). This is the churn/retention curve product
    analytics runs, with the estimator that makes censoring correct —
    an empirical CDF would silently treat active users as churned.

    Per distinct lifetime t: n_risk = users with lifetime ≥ t,
    d = churn events at t, c = censored at t,
    S(t) = Π_{t_j ≤ t, n_j > d_j} (1 − d_j/n_j), and 0 forever after
    any t_j with d_j = n_j. The product is a cumulative sum of
    integer-rounded nano-nat logs over the DISTINCT-lifetime table
    (bounded by the observation window, ~tens of rows) — the corpus
    collapses to per-user rows by one agg, then to per-lifetime rows
    by another; no window ever touches event-sized data.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    bounds = ev.groupBy().agg(F.max("day").alias("wend"))
    users = per_user.crossJoin(F.broadcast(bounds)).select(
        F.datediff("last_day", "first_day").alias("t"),
        (
            F.datediff("wend", "last_day") < F.lit(KM_CENSOR_DAYS)
        ).alias("censored"),
    )
    per_t = users.groupBy("t").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c"),
    )
    w_ord = W.orderBy("t")
    w_cum = w_ord.rowsBetween(W.unboundedPreceding, -1)
    at_risk = per_t.withColumn(
        "n_risk",
        F.coalesce(F.sum(F.col("d") + F.col("c")).over(W.orderBy(F.desc("t")).rowsBetween(W.unboundedPreceding, 0)), F.lit(0)),
    )
    lf = at_risk.withColumn(
        "lf",
        F.when(
            (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
            F.expr(
                f"cast(round(ln((n_risk - d) / cast(n_risk as double)) * {KM_LN_SCALE}) as bigint)"
            ),
        ).otherwise(F.lit(0)),
    ).withColumn("dead", (F.col("d") >= F.col("n_risk")) & (F.col("d") > 0))
    out = lf.select(
        "t",
        "n_risk",
        "d",
        "c",
        (F.coalesce(F.sum("lf").over(w_cum), F.lit(0)) + F.col("lf")).alias("cum_lf"),
        F.coalesce(
            F.max(F.col("dead").cast("int")).over(
                w_ord.rowsBetween(W.unboundedPreceding, 0)
            ),
            F.lit(0),
        ).alias("dead_seen"),
    )
    return out.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.when(F.col("dead_seen") == 1, F.lit(0.0))
        .otherwise(
            F.expr(
                # FIXTURES rule 2/5: snap the transcendental output onto the
                # 1e-6 grid via integer round (half-away-from-zero in both
                # engines), never round(x, n) on a double.
                f"cast(round(exp(cum_lf / {KM_LN_SCALE}.0) * 1e6) as bigint) / 1e6"
            )
        )
        .alias("survival"),
    ).orderBy("t_days")


KM_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), per_user AS (
  SELECT user_id, min(day) AS first_day, max(day) AS last_day FROM ev GROUP BY user_id
), bounds AS (SELECT max(day) AS wend FROM ev),
users AS (
  SELECT date_diff('day', first_day, last_day) AS t,
         date_diff('day', last_day, wend) < {KM_CENSOR_DAYS} AS censored
  FROM per_user CROSS JOIN bounds
), per_t AS (
  -- CAST: DuckDB sum(BIGINT) returns HUGEINT; the driver's value-hash is
  -- type-width-sensitive, so pin every integer aggregate to BIGINT.
  SELECT t,
         CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM users GROUP BY t
), at_risk AS (
  SELECT t, d, c,
         CAST(sum(d + c) OVER (ORDER BY t DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM per_t
), lf AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d > 0 AND n_risk > d
              THEN CAST(round(ln((n_risk - d) / CAST(n_risk AS DOUBLE)) * {KM_LN_SCALE}) AS BIGINT)
              ELSE 0 END AS lf,
         CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END AS dead
  FROM at_risk
), acc AS (
  SELECT t, n_risk, d, c,
         sum(lf) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_lf,
         max(dead) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead_seen
  FROM lf
)
SELECT t AS t_days, n_risk, d AS n_churned, c AS n_censored,
       CASE WHEN dead_seen = 1 THEN 0.0
            ELSE CAST(round(exp(cum_lf / {KM_LN_SCALE}.0) * 1e6) AS BIGINT) / 1e6
       END AS survival
FROM acc ORDER BY t_days
"""


# --- seasonal baseline + residual anomalies ---------------------------------

SEASONAL_SIGMA = 3.0  # |value − bucket mean| > 3σ flags an anomaly


def seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dow, hod, n, mu, sigma): the ≤168-row seasonality baseline from
    exact integer-cents DECIMAL(38,0) moments — shared by the batch
    report and the streaming twin (which broadcasts it as the fixed
    training-time artifact)."""
    ev = _t(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    mom = ev.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cast(cents as decimal(38,0)))").alias("s1"),
        F.expr("sum(cast(cents as decimal(38,0)) * cast(cents as decimal(38,0)))").alias(
            "s2"
        ),
    )
    return mom.selectExpr(
        "dow",
        "hod",
        "n",
        "cast(s1 as double) / n / 100 AS mu",
        "CASE WHEN n < 2 THEN 0.0 ELSE"
        " sqrt(greatest(0.0, (cast(s2 as double)"
        " - cast(s1 as double) * cast(s1 as double) / n) / (n - 1))) / 100"
        " END AS sigma",
    )


def seasonal_anomaly_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: events bucketed by
    (day-of-week, hour-of-day), per-bucket mean/σ of value as the
    SEASONALITY baseline, and the count of events falling outside
    mean ± 3σ of their own bucket — the time-structure monitor that
    catches "normal for 3am Sunday, anomalous for 2pm Tuesday", which
    a global outlier gate (embedding_outlier_report's value-space
    cousin) structurally cannot.

    Exactness: moments accumulate as integer cents (Σx, Σx² in
    DECIMAL(38,0) — order-independent); mean and the unbiased σ are
    one shared-text double expression on those exact sums; the 3σ flag
    compares identical doubles, so both engines flag identical rows.

    Plan: ONE partial+final pass builds the ≤168-row bucket-moment
    table, broadcast back over the scan for the flag pass — the
    standard two-scan baseline+residual monitoring shape; at 100 TB
    the baseline table is pinned/persisted and only the flag pass
    recurs."""
    ev = _t(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    stats = seasonal_baseline(spark, sf_dir)
    flagged = (
        ev.join(F.broadcast(stats), ["dow", "hod"])
        .selectExpr(
            "dow",
            "hod",
            "n",
            "mu",
            "sigma",
            f"CASE WHEN abs(cents / 100.0 - mu) > {SEASONAL_SIGMA} * sigma"
            " THEN 1 ELSE 0 END AS is_anom",
        )
        .groupBy("dow", "hod")
        .agg(
            F.expr("max(n)").alias("n"),
            # snap, don't round: mu = cents_sum/(100·n) terminates exactly on
            # a 4dp boundary for n = 2^a·5^b, where round(x, 4) diverges
            # between engines (FIXTURES rule 2)
            F.expr("cast(round(max(mu) * 1e4) as bigint) / 1e4").alias("mean_value"),
            F.expr("cast(round(max(sigma) * 1e4) as bigint) / 1e4").alias(
                "sigma_value"
            ),
            F.expr("cast(sum(is_anom) as bigint)").alias("n_anomalies"),
        )
    )
    return flagged


SEASONAL_SQL = f"""
WITH ev AS (
  SELECT dayofweek(ts) AS dow, hour(ts) AS hod,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), mom AS (
  SELECT dow, hod, count(*) AS n,
         sum(CAST(cents AS DECIMAL(38,0))) AS s1,
         sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))) AS s2
  FROM ev GROUP BY dow, hod
), stats AS (
  SELECT dow, hod, n,
         CAST(s1 AS DOUBLE) / n / 100 AS mu,
         CASE WHEN n < 2 THEN 0.0 ELSE
           sqrt(greatest(0.0, (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                / (n - 1))) / 100 END AS sigma
  FROM mom
)
SELECT e.dow, e.hod, max(s.n) AS n,
       CAST(round(max(s.mu) * 1e4) AS BIGINT) / 1e4 AS mean_value,
       CAST(round(max(s.sigma) * 1e4) AS BIGINT) / 1e4 AS sigma_value,
       CAST(sum(CASE WHEN abs(e.cents / 100.0 - s.mu) > {SEASONAL_SIGMA} * s.sigma
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM ev e JOIN stats s USING (dow, hod)
GROUP BY e.dow, e.hod
"""


def burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the Fano factor (variance/mean) of hourly event
    counts over the full gap-filled hour grid — the burstiness monitor
    (Fano ≈ 1 = Poisson-like arrivals, >> 1 = bursty/clumped, << 1 =
    regular) that tells a capacity planner whether load is smooth or
    spiky per traffic class.

    Exact shape: counts collapse to the BOUNDED (type, hour) table;
    missing hours are zero-filled from the one-row bounds sequence
    crossed with the ≤|types|-row type list (both broadcast). Moments
    are exact integers (n, Σc, Σc²); mean and Fano are fixed-arity
    doubles from identical SQL text, snapped at 6dp."""
    ev = _t(spark, sf_dir, "events").select("ts", "event_type")
    per_th = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    return burstiness_from_counts(per_th)


def burstiness_from_counts(per_th: DataFrame) -> DataFrame:
    """The Fano fold over a (event_type, h, c) hourly count table —
    shared by the batch operator and the streaming twin (whose
    streaming state IS this bounded table). Bounds, grid, and the type
    list all derive from the count table itself."""
    bounds = per_th.groupBy().agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    types = per_th.select("event_type").distinct()
    # the probe side re-joins the same lineage the grid/type subtrees
    # derive from — re-alias its join keys so the attribute ids differ
    probe = per_th.select(
        F.col("event_type").alias("et2"), F.col("h").alias("h2"), "c"
    )
    filled = (
        grid.crossJoin(F.broadcast(types))
        .join(
            probe,
            (F.col("event_type") == F.col("et2"))
            & (F.col("h") == F.col("h2")),
            "left",
        )
        .select(
            "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
    )
    acc = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("c").alias("s"),
        F.sum(F.expr("cast(c as decimal(38,0)) * c")).alias("sxx"),
    )
    fano = (
        "(cast(n_hours as double) * cast(sxx as double) - cast(s as double) * s)"
        " / (cast(n_hours as double) * s)"
    )
    return acc.select(
        "event_type",
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.col("s").cast("bigint").alias("n_events"),
        F.expr(
            "cast(round(s / cast(n_hours as double) * 1e6) as bigint) / 1e6"
        ).alias("mean_per_hour_6"),
        F.expr(f"cast(round(({fano}) * 1e6) as bigint) / 1e6").alias("fano_6"),
    )


BURSTINESS_SQL = """
WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type FROM events),
per_th AS (
  SELECT event_type, h, count(*) AS c FROM ev GROUP BY 1, 2
), bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
grid AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (SELECT DISTINCT event_type FROM ev),
filled AS (
  SELECT t.event_type, coalesce(p.c, 0) AS c
  FROM grid g CROSS JOIN types t
  LEFT JOIN per_th p ON p.h = g.h AND p.event_type = t.event_type
), acc AS (
  SELECT event_type, count(*) AS n_hours, sum(c) AS s,
         sum(CAST(c AS DECIMAL(38,0)) * c) AS sxx
  FROM filled GROUP BY event_type
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
       CAST(s AS BIGINT) AS n_events,
       CAST(round(s / CAST(n_hours AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS mean_per_hour_6,
       CAST(round(((CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(s AS DOUBLE) * s)
         / (CAST(n_hours AS DOUBLE) * s)) * 1e6) AS BIGINT) / 1e6 AS fano_6
FROM acc
"""


SEQ3_TOP_K = 20


def event_seq3_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} most frequent length-3 CONTIGUOUS event-type sequences
    across user timelines — the depth-3 sequential-pattern miner
    (PrefixSpan's contiguous special case) behind "what three-step
    flows dominate the product". Extends `event_transition_matrix`
    (first-order pairs) one step deeper.

    Plan: ONE window shuffle on user_id (two leads over the total
    per-user order ts,event_id — same single shuffle, both leads share
    the frame), then partial+final count into ≤|types|³ groups, then
    TakeOrdered(K). n_users is an exact distinct per trigram (count
    ∝ |types|³ groups, never corpus-sized). Output order is total:
    (n_occurrences desc, trigram) — the trigram is the group key, so
    the tiebreak is unique (FIXTURES rule 5)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.col("event_type").alias("e1"), "e2", "e3"
        )
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return tri.orderBy(
        F.desc("n_occurrences"), "e1", "e2", "e3"
    ).limit(SEQ3_TOP_K)


SEQ3_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*) AS n_occurrences,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n_occurrences DESC, e1, e2, e3
LIMIT {SEQ3_TOP_K}
"""


def rfm_quintile_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of customers — recency (days since last
    order), frequency (order count), monetary (lifetime cents) — each
    scored into value-based quintile buckets, reported as segment
    cells (r_b, f_b, m_b) with customer counts and exact monetary
    totals. The classic marketing/training-cohort stratifier.

    Exact shape: quintile CUTS (not per-row ntile — ntile's tie
    behavior is order-dependent at equal values) come from the
    distributed rank walk (`rank_stats._bucketed_cum`) over each
    metric's distinct-value count table: cut_q = smallest v with
    cum ≥ ceil(q·n). Each customer's bucket = 1 + #cuts strictly
    below its value — deterministic under ties in both engines, and
    the 4 cuts broadcast as ONE row. Per-segment monetary stays an
    exact integer-cents sum; the average snaps at 2dp-on-cents (one
    fixed-arity division)."""
    from spec_search_spark.operators.rank_stats import _bucketed_cum

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    anchor = o.groupBy().agg(F.max("o_orderdate").alias("d1"))
    per_c = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.expr("datediff(d1, o_orderdate)")).alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum("cents").alias("m"),
        )
    )

    def cuts_of(metric: str) -> DataFrame:
        per_v = per_c.groupBy(F.col(metric).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        cum = _bucketed_cum(per_v, "v", ["c"])
        tot = per_v.groupBy().agg(F.sum("c").alias("n"))
        return (
            cum.crossJoin(F.broadcast(tot))
            .groupBy()
            .agg(
                *[
                    F.min(
                        F.expr(f"case when cum_c >= ({j} * n + 4) div 5 then v end")
                    ).alias(f"{metric}q{j}")
                    for j in (1, 2, 3, 4)
                ]
            )
        )

    cut_r, cut_f, cut_m = cuts_of("r"), cuts_of("f"), cuts_of("m")
    scored = (
        per_c.crossJoin(F.broadcast(cut_r))
        .crossJoin(F.broadcast(cut_f))
        .crossJoin(F.broadcast(cut_m))
        .select(
            F.expr(
                "1 + cast(r > rq1 as int) + cast(r > rq2 as int)"
                " + cast(r > rq3 as int) + cast(r > rq4 as int)"
            ).alias("r_b"),
            F.expr(
                "1 + cast(f > fq1 as int) + cast(f > fq2 as int)"
                " + cast(f > fq3 as int) + cast(f > fq4 as int)"
            ).alias("f_b"),
            F.expr(
                "1 + cast(m > mq1 as int) + cast(m > mq2 as int)"
                " + cast(m > mq3 as int) + cast(m > mq4 as int)"
            ).alias("m_b"),
            "m",
        )
    )
    return scored.groupBy("r_b", "f_b", "m_b").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m").alias("monetary_cents"),
        F.expr(
            "cast(round(sum(m) / count(*) ) as bigint)"
        ).alias("avg_monetary_cents"),
    )


def _rfm_cut_sql(metric: str) -> str:
    return f"""cut_{metric} AS (
  SELECT {", ".join(f"min(CASE WHEN cc >= ({j} * n + 4) // 5 THEN v END) AS {metric}q{j}" for j in (1, 2, 3, 4))}
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
    FROM (SELECT {metric} AS v, count(*) AS c FROM per_c GROUP BY 1)
  ) CROSS JOIN (SELECT count(*) AS n FROM per_c)
)"""


RFM_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), anchor AS (SELECT max(o_orderdate) AS d1 FROM o),
per_c AS (
  SELECT o_custkey,
         min(datediff('day', o_orderdate, d1)) AS r,
         count(*) AS f,
         sum(cents) AS m
  FROM o CROSS JOIN anchor GROUP BY o_custkey
), {_rfm_cut_sql("r")}, {_rfm_cut_sql("f")}, {_rfm_cut_sql("m")},
scored AS (
  SELECT 1 + CAST(r > rq1 AS INT) + CAST(r > rq2 AS INT)
           + CAST(r > rq3 AS INT) + CAST(r > rq4 AS INT) AS r_b,
         1 + CAST(f > fq1 AS INT) + CAST(f > fq2 AS INT)
           + CAST(f > fq3 AS INT) + CAST(f > fq4 AS INT) AS f_b,
         1 + CAST(m > mq1 AS INT) + CAST(m > mq2 AS INT)
           + CAST(m > mq3 AS INT) + CAST(m > mq4 AS INT) AS m_b,
         m
  FROM per_c CROSS JOIN cut_r CROSS JOIN cut_f CROSS JOIN cut_m
)
SELECT r_b, f_b, m_b, count(*) AS n_customers,
       CAST(sum(m) AS BIGINT) AS monetary_cents,
       CAST(round(CAST(sum(m) AS BIGINT) / count(*)) AS BIGINT)
         AS avg_monetary_cents
FROM scored GROUP BY r_b, f_b, m_b
"""


# --- rolling 7-day active users (DAU / WAU / stickiness) --------------------

WAU_WINDOW_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and the DAU/WAU stickiness ratio per
    calendar day — the engagement triple every product dashboard runs.
    A sliding COUNT(DISTINCT) cannot be expressed as a window frame
    (each frame would rescan its members), so the scalable plan is the
    contribution explode: collapse events to distinct (user, day)
    pairs, explode each pair onto the ≤7 target days it makes the user
    week-active for, and de-duplicate (user, target_day) — shuffle
    cost is W × |user-days|, linear in data with a fixed factor, and
    every aggregate is a partial+final count.

    Output: (day, dau, wau, stickiness) for days inside the observed
    grid; stickiness snapped on the 1e-6 grid (FIXTURES rule 2)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    user_days = ev.distinct()
    bounds = user_days.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    contrib = (
        user_days.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(WAU_WINDOW_DAYS - 1))
            ).alias("off"),
            "day",
        )
        .select("user_id", F.expr("date_add(day, off)").alias("day"))
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    dau = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .join(F.broadcast(bounds))
        .filter((F.col("day") >= F.col("dmin")) & (F.col("day") <= F.col("dmax")))
        .select(
            "day",
            "dau",
            "wau",
            F.expr(
                "cast(round(dau / cast(wau as double) * 1e6) as bigint) / 1e6"
            ).alias("stickiness"),
        )
    )


ROLLING_ACTIVE_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ud),
contrib AS (
  SELECT DISTINCT user_id, day + CAST(off AS INT) AS day
  FROM ud, unnest(range(0, {WAU_WINDOW_DAYS})) AS t(off)
), wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
SELECT d.day, d.dau, w.wau,
       CAST(round(d.dau / CAST(w.wau AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS stickiness
FROM dau d JOIN wau w USING (day) CROSS JOIN b
WHERE d.day BETWEEN b.dmin AND b.dmax
"""


# --- cohort LTV triangle ------------------------------------------------------


def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort lifetime-value triangle: users grouped by
    first-activity WEEK, revenue accumulated along cohort AGE —
    cum_ltv(cohort, a) = Σ_{age≤a} cents(cohort, age) / cohort_size,
    the money-side companion of the retention cohort (retention counts
    who came back; THIS prices what they spent, the curve a payback
    model is fit to).

    Exact shape: events collapse to the BOUNDED (cohort_week, age_week)
    grid (weeks², fixed by the window) with integer-cents sums; the
    cumulative runs on that grid partitioned by cohort; LTV is one
    snapped division by the exact cohort size. First-activity week is
    a per-user min — one partial+final agg, no window over events.

    Output: (cohort_week, age_weeks, n_active, cents, cum_ltv)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    bounds = ev.groupBy().agg(F.min("day").alias("d0"))
    wk = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "cents",
        F.expr("cast(datediff(day, d0) div 7 as int)").alias("week"),
    )
    first = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cell = (
        wk.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
            "user_id",
            "cents",
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    w = W.partitionBy("cohort_week").orderBy("age_weeks")
    return (
        cell.withColumn("cum_cents", F.sum("cents").over(w))
        .join(F.broadcast(sizes), "cohort_week")
        .selectExpr(
            "cohort_week",
            "age_weeks",
            "n_active",
            "cents",
            "cast(round(cum_cents / (cohort_size * 100.0) * 1e4) as bigint)"
            " / 1e4 AS cum_ltv",
        )
    )


COHORT_LTV_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), b AS (SELECT min(day) AS d0 FROM ev),
wk AS (
  SELECT user_id, cents,
         CAST((day - d0) // 7 AS INT) AS week
  FROM ev CROSS JOIN b
), first AS (
  SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
), sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM first GROUP BY 1
), cell AS (
  SELECT f.cohort_week, w.week - f.cohort_week AS age_weeks,
         count(DISTINCT w.user_id) AS n_active,
         CAST(sum(w.cents) AS BIGINT) AS cents
  FROM wk w JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.age_weeks, c.n_active, c.cents,
       CAST(round(sum(c.cents) OVER (PARTITION BY c.cohort_week
              ORDER BY c.age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            / (s.cohort_size * 100.0) * 1e4) AS BIGINT) / 1e4 AS cum_ltv
FROM cell c JOIN sizes s USING (cohort_week)
"""


QUERIES = {
    "activity_streaks": activity_streaks,
    "rolling_active_users": rolling_active_users,
    "cohort_ltv_triangle": cohort_ltv_triangle,
    "ewma_user_value": ewma_user_value,
    "event_transition_matrix": event_transition_matrix,
    "attribution_last_touch": attribution_last_touch,
    "attribution_position_based": attribution_position_based,
    "cumulative_distinct_parts": cumulative_distinct_parts,
    "ab_test_welch": ab_test_welch,
    "km_survival_curve": km_survival_curve,
    "seasonal_anomaly_report": seasonal_anomaly_report,
    "event_seq3_support": event_seq3_support,
    "burstiness_by_type": burstiness_by_type,
    "rfm_quintile_segments": rfm_quintile_segments,
}

ORACLES = {
    "activity_streaks": ACTIVITY_STREAKS_SQL,
    "rolling_active_users": ROLLING_ACTIVE_SQL,
    "cohort_ltv_triangle": COHORT_LTV_SQL,
    "ewma_user_value": EWMA_SQL,
    "event_transition_matrix": EVENT_TRANSITION_SQL,
    "attribution_last_touch": ATTRIBUTION_SQL,
    "attribution_position_based": ATTRIBUTION_PB_SQL,
    "cumulative_distinct_parts": CUM_DISTINCT_SQL,
    "ab_test_welch": AB_TEST_SQL,
    "km_survival_curve": KM_SQL,
    "seasonal_anomaly_report": SEASONAL_SQL,
    "event_seq3_support": SEQ3_SQL,
    "burstiness_by_type": BURSTINESS_SQL,
    "rfm_quintile_segments": RFM_SQL,
}
