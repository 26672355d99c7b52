"""Format adapters: parquet/csv/json/orc read+write with schema
round-trip handling.

Scale notes: parquet/orc are the columnar defaults (pushdown +
pruning); csv/json exist for ingest edges. CSV/JSON write stringifies
nested types — array columns (embeddings) are json-encoded on write
and decoded on read, so a round trip preserves values. `inferSchema`
is never used on the read path (full-file pre-scan at 100 TB); callers
pass the schema or read parquet.

The sheet-shaped source/sink proper lives in sources/sheets_source.py
(custom PySpark DataSource: listing-pruned reader, ranged scan,
header-records mode, write-back sink over local fixtures); only the
network/auth half of a real Sheets connector stays out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")


def _array_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, T.ArrayType)]


def write_table_any(df: DataFrame, path: str, fmt: str) -> None:
    """Write in any supported format; array columns are json-encoded
    for the text formats (csv cannot hold nested types)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    out = df
    if fmt == "csv":
        for c in _array_cols(df.schema):
            out = out.withColumn(c, F.to_json(F.col(c)))
        out.write.mode("overwrite").option("header", True).csv(path)
    else:
        out.write.mode("overwrite").format(fmt).save(path)


def read_table_any(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read any supported format. For csv/json an explicit schema is
    required (no inferSchema full-file pre-scan); json-encoded array
    columns are decoded back to arrays."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if schema is None:
        raise ValueError(f"{fmt} read requires an explicit schema")
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    # csv: read array columns as strings, then decode
    arr_cols = {f.name: f.dataType for f in schema.fields if isinstance(f.dataType, T.ArrayType)}
    read_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in arr_cols else f.dataType, True)
            for f in schema.fields
        ]
    )
    df = spark.read.schema(read_schema).option("header", True).csv(path)
    for name, dtype in arr_cols.items():
        df = df.withColumn(name, F.from_json(F.col(name), dtype))
    return df
