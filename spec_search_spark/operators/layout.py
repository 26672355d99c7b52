"""Data-layout operators: Z-order clustering + skipping-stats report —
the lakehouse write-side optimization a 100 TB table needs before any
of the read-side pruning in this repo pays off (Delta/Iceberg
`OPTIMIZE ZORDER BY` compute exactly this ordering; parquet row-group
min/max stats do the skipping).

The reference has no storage layer at all (it writes rows to Google
Sheets, `/root/reference/sheet_creator_tool.py:60-90`); this module is
target-engine surface per SURVEY.md §3's scale mandate.

Scale shape: per-dimension bounds are one tiny agg broadcast as a
single row; cell mapping + the Morton interleave are pure per-row
codegen expressions (no shuffle, no UDF); the stats report is one
partial+final aggregate. The write path in production is
``repartitionByRange(z).sortWithinPartitions(z)`` + parquet write —
the stats this query emits are precisely the row-group min/max that
make a later ``WHERE x BETWEEN ..`` prune buckets on BOTH dimensions
at once, which no single-column sort can do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

Z_BITS = 8           # bits per dimension after range normalization
N_ZBUCKETS = 64      # clustered "files" the report describes
# probe predicate for the prunable flag: a narrow partkey band
PROBE_LO, PROBE_HI = 100, 200


def _interleave(x: Column, y: Column) -> Column:
    """Morton/Z code: interleave the low Z_BITS of x (even positions)
    and y (odd positions). Pure shift/mask arithmetic — identical
    operator set in DuckDB, so the oracle is exact."""
    z = F.lit(0).cast("bigint")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order lineitem on (l_partkey, l_suppkey) and report per-bucket
    clustering stats: row count, the min/max of BOTH dimensions (the
    row-group stats data skipping reads), and whether the bucket is
    prunable for a fixed partkey probe band — the fraction of `true`
    in that column IS the two-dimensional skipping win.

    Algorithm (what OPTIMIZE ZORDER does): normalize each dimension
    onto its value RANGE first — cell = (v - min) * 2^Z_BITS div
    (max - min + 1), exact bigint arithmetic — then Morton-interleave
    the cell coordinates and cut z-space into equal-width buckets.
    Without the normalization, keys that occupy a fraction of the bit
    space collapse into one bucket. A single-column sort clusters one
    dimension and scrambles the other; the Morton code keeps both
    min/max ranges narrow, so range predicates on EITHER column prune
    most buckets. Production writes range-partition on z for
    equal-SIZE files — same code, planner-chosen boundaries.
    """
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    k = 1 << Z_BITS

    def cell(v: str, lo: str, hi: str) -> Column:
        return F.expr(f"(({v} - {lo}) * {k}) div ({hi} - {lo} + 1)")

    withz = li.join(F.broadcast(bounds)).select(
        "l_partkey",
        "l_suppkey",
        _interleave(
            cell("l_partkey", "pmin", "pmax"), cell("l_suppkey", "smin", "smax")
        ).alias("z"),
    )
    zspan = (k * k) // N_ZBUCKETS
    stats = (
        withz.select(
            F.expr(f"z div {zspan}").cast("int").alias("zbucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_partkey").alias("min_p"),
            F.max("l_partkey").alias("max_p"),
            F.min("l_suppkey").alias("min_s"),
            F.max("l_suppkey").alias("max_s"),
        )
    )
    prunable = (F.col("max_p") < PROBE_LO) | (F.col("min_p") > PROBE_HI)
    return stats.select(
        "zbucket", "n", "min_p", "max_p", "min_s", "max_s",
        prunable.alias("prunable_for_probe"),
    )


_K = 1 << Z_BITS
ZORDER_SQL = f"""
WITH b AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM lineitem
), z AS (
  SELECT ({_interleave_sql(
      f"(((l_partkey - pmin) * {_K}) // (pmax - pmin + 1))",
      f"(((l_suppkey - smin) * {_K}) // (smax - smin + 1))")}) AS zv,
         l_partkey, l_suppkey
  FROM lineitem CROSS JOIN b
)
SELECT CAST(zv // {(_K * _K) // N_ZBUCKETS} AS INT) AS zbucket,
       count(*) AS n,
       min(l_partkey) AS min_p, max(l_partkey) AS max_p,
       min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
       (max(l_partkey) < {PROBE_LO} OR min(l_partkey) > {PROBE_HI})
         AS prunable_for_probe
FROM z
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hive-style partition pruning — the directory-level skip
# ---------------------------------------------------------------------------

PRUNE_LANG = "en"

_PARTITIONED: dict[tuple[str, str], str] = {}


def _partitioned_docs_path(spark: SparkSession, sf_dir: str) -> str:
    """documents re-written hive-partitioned by lang (lang=en/...),
    once per (session, corpus) — the write-side half of partition
    pruning, memoized like bucketed's tables."""
    import tempfile

    from spec_search_spark.session import prune_memo

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PARTITIONED:
        base = tempfile.mkdtemp(prefix="spec_search_partitioned_")
        (
            load_table(spark, sf_dir, "documents")
            .write.partitionBy("lang")
            .mode("overwrite")
            .parquet(base)
        )
        prune_memo(_PARTITIONED, key[0])
        _PARTITIONED[key] = base
    return _PARTITIONED[key]


def partitioned_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: per-language stats read through a lang-partitioned
    copy of documents with a partition-pruned scan — at 100 TB the
    `lang = 'en'` predicate never touches the other languages' FILES
    (directory-level skip, before row groups or pages), which is the
    single cheapest filter the storage layout can buy.

    Plan invariant (audited): the predicate lands in the scan's
    PartitionFilters — NOT as a post-scan Filter over all rows. The
    oracle reads the original un-partitioned parquet; values must be
    identical because partitioning is a pure layout change."""
    tune(spark)
    path = _partitioned_docs_path(spark, sf_dir)
    docs = spark.read.parquet(path).filter(F.col("lang") == PRUNE_LANG)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        F.countDistinct("source").alias("n_sources"),
    )


PRUNE_SQL = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
       count(DISTINCT source) AS n_sources
FROM documents WHERE lang = '{PRUNE_LANG}'
GROUP BY lang
"""


DPP_SHARDS = 16  # hash-shard layout width for the DPP fact
DPP_MIN_CHARS = 530  # "oversize document" gate driving the dim

_SHARDED: dict[tuple[str, str], str] = {}


def _sharded_docs_path(spark: SparkSession, sf_dir: str) -> str:
    """documents re-written hive-partitioned by the hash shard
    `doc_id % {N}` — the layout a bulk store actually uses when no
    single column is the natural partition key. Memoized once per
    (session, corpus) like the lang-partitioned copy."""
    import tempfile

    from spec_search_spark.session import prune_memo

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SHARDED:
        base = tempfile.mkdtemp(prefix="spec_search_sharded_")
        (
            load_table(spark, sf_dir, "documents")
            .withColumn(
                "shard", F.expr(f"cast(doc_id % {DPP_SHARDS} as int)")
            )
            .write.partitionBy("shard")
            .mode("overwrite")
            .parquet(base)
        )
        prune_memo(_SHARDED, key[0])
        _SHARDED[key] = base
    return _SHARDED[key]


def dpp_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: per-shard stats of every shard that
    holds an OVERSIZE document (n_chars > {T}) — the shard list is
    only known after the dim side runs, and Spark pushes the dim's
    build-side values into the fact scan's PartitionFilters as a
    dynamicpruning subquery, skipping the other shards' files
    entirely. The static sibling (`partitioned_scan_prune`) skips
    directories from a literal predicate; THIS is the skip when the
    predicate is data — at 100 TB a star-join probes exactly the
    partitions the dimension names. (Note: the dim needs a genuine
    selective Filter — a LIMIT- or aggregate-derived dim does not
    pass the planner's DPP benefit test; verified empirically.)

    Plan invariant (audited): `dynamicpruningexpression` inside the
    fact scan's PartitionFilters, dim joined broadcast. The oracle
    runs the identical join on the un-partitioned original; values
    must match because partitioning is pure layout."""
    tune(spark)
    path = _sharded_docs_path(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > DPP_MIN_CHARS)
        .select(
            F.expr(f"cast(doc_id % {DPP_SHARDS} as int)").alias("shard")
        )
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), "shard")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


DPP_SQL = f"""
WITH fact AS (
  SELECT CAST(doc_id % {DPP_SHARDS} AS INT) AS shard, lang, n_chars
  FROM documents
), dim AS (
  SELECT DISTINCT CAST(doc_id % {DPP_SHARDS} AS INT) AS shard
  FROM documents WHERE n_chars > {DPP_MIN_CHARS}
)
SELECT f.shard, count(*) AS n_docs,
       CAST(sum(f.n_chars) AS BIGINT) AS n_chars_total,
       count(DISTINCT f.lang) AS n_langs
FROM fact f JOIN dim USING (shard)
GROUP BY f.shard
"""


QUERIES = {
    "zorder_layout": zorder_layout,
    "partitioned_scan_prune": partitioned_scan_prune,
    "dpp_join_prune": dpp_join_prune,
}

ORACLES = {
    "zorder_layout": ZORDER_SQL,
    "partitioned_scan_prune": PRUNE_SQL,
    "dpp_join_prune": DPP_SQL,
}
