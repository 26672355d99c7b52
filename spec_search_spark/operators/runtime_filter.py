"""Bloom-filter semi-join reduction, built AS DATA with pure DataFrame
expressions — the hand-rolled form of Catalyst's InjectRuntimeFilter.

Why hand-rolled: Spark injects runtime bloom filters only when the
application-side scan exceeds ~10 GB
(`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`)
and `bloom_filter_agg` is not in the public function registry, so the
technique can neither fire nor be demonstrated at test scale. Building
the filter as a one-row DataFrame makes it explicit, auditable, and
portable:

- **build**: h=3 hashes per build key (`xxhash64(key, seed)` mod m),
  bit positions packed into m/64 int64 words via a `bit_or` partial+
  final aggregation (shuffle ∝ set words ≤ m/64 rows, NOT ∝ keys),
  then assembled into ONE row holding an `array<bigint>` of exactly
  m/64 words (map lookup over a dense index sequence — absent words
  are zero). m = 2^17 bits → a 16 KB broadcast.
- **probe**: the fact side crossJoins the one-row filter (broadcast —
  the audit-allowed one-row pattern) and keeps rows whose h bits are
  all set: `shiftrightunsigned(words[pos/64], pos%64) & 1` — pure
  codegen, no UDF, applied BEFORE the shuffle join.
- **exactness**: the final equi-join still runs, so false positives
  drop out — the bloom stage only sheds shuffle volume. The DuckDB
  oracle is therefore the PLAIN join query; the bloom is semantically
  invisible, exactly like Catalyst's injected filter.

At 100 TB this is the difference between shuffling the full fact table
and shuffling ~selectivity × fact: with a 1% selective dim filter the
probe drops ~99% of fact rows map-side for a 16 KB broadcast. The
false-positive rate at m=2^17, h=3, n≈6k keys is < 1e-4 (and the
pruning effectiveness is pinned by a test, not assumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table

M_BITS = 1 << 17  # filter width in bits; power of two, 16 KB packed
N_WORDS = M_BITS // 64
SEEDS = (17, 41, 97)  # h = 3 hash functions


def _positions(key: Column) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(M_BITS)) for s in SEEDS]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """ONE row: (words: array<bigint> of length N_WORDS). The per-word
    bit_or aggregates map-side first; the final map assembly touches at
    most N_WORDS rows regardless of key count."""
    pos = (
        keys.select(F.explode(F.array(*_positions(F.col(key_col)))).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.col("pos").cast("int").alias("p"),
        )
    )
    per_word = pos.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(1L, p % 64)")).alias("bits")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(N_WORDS - 1)),
        lambda i: F.coalesce(F.col("m")[i], F.lit(0).cast("long")),
    )
    return per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    ).select(dense.alias("words"))


def bloom_might_contain(key_name: str) -> Column:
    """All-h-bits-set probe against the broadcast `words` column. Seed
    literals are INT (`{s}`, not `{s}L`) to hash identically to the
    build side's `F.lit(s)` — xxhash64 folds argument TYPES into the
    hash, so a long seed would probe different bits than were set."""
    out = None
    for s in SEEDS:
        pos = f"pmod(xxhash64({key_name}, {s}), {M_BITS})"
        c = F.expr(
            f"(shiftrightunsigned(words[cast({pos} / 64 AS INT)], "
            f"cast({pos} % 64 AS INT)) & 1L) = 1L"
        )
        out = c if out is None else (out & c)
    return out


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of lineitems whose order is URGENT and placed in
    1996 — the selective dim filter whose keys feed the bloom. The fact
    scan is pruned by the 16 KB filter BEFORE the shuffle join; the
    join itself guarantees exactness. Revenue is summed in exact
    DECIMAL (the scalar_sql.decimal_exact_revenue contract) — a double
    sum differed from DuckDB by one ulp at a cent rounding boundary.

    Output: (ship_month, n_items, revenue)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1996)
    )
    keys = orders.select("o_orderkey")
    bloom = bloom_build(keys, "o_orderkey")

    lineitem = load_table(spark, sf_dir, "lineitem")
    pruned = lineitem.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain("l_orderkey")
    )

    joined = pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,4)")
                        - F.col("l_discount").cast("decimal(18,4)")
                    )
                ).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


BLOOM_PRUNED_JOIN_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       count(*) AS n_items,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1996
GROUP BY 1
"""

QUERIES = {"bloom_pruned_join": bloom_pruned_join}
ORACLES = {"bloom_pruned_join": BLOOM_PRUNED_JOIN_SQL}
