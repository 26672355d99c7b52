"""Table catalog over the driver's parquet test tables.

The reference enumerates spreadsheets in a Drive folder and scans each
worksheet (`/root/reference/indexer.py:80-90`, `:29`); here the
equivalent "source" layer is ``spark.read.parquet`` over a scale-factor
directory, which buys Catalyst pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Lazy — Catalyst prunes columns/row-groups later.

    `events` is written with TIMESTAMP(NANOS) which the Spark parquet
    reader rejects; read nanos as long (runtime legacy conf) and
    truncate to microsecond timestamps — the same truncation DuckDB
    applies on its TIMESTAMP_NS → TIMESTAMP read, so oracle
    comparisons agree. Integer division (`div`) keeps the full 64-bit
    precision (a double division would corrupt epoch-nanos).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
