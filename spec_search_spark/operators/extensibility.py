"""UDTF / UDAF extensibility surface (SURVEY.md §2.11).

The reference's only extensibility hook is LLM tool-function
registration (`/root/reference/sheet_creator_tool.py:130-144`, consumed
by the ReAct agent at `/root/reference/app.py:208-226`) — not an engine
concern. The engine-side analogs Spark offers are Python UDTFs (table
functions usable in LATERAL joins) and grouped-aggregate pandas UDFs
(the UDAF surface). Both demonstrated here on reference-shaped work:

- `udtf_chunk_explode` — the reference's text chunker
  (`/root/reference/indexer.py:62-66`) expressed as a Python UDTF in a
  SQL LATERAL join, semantics identical to `chunk_fixed`'s pure
  expression form so the same DuckDB oracle applies. A UDTF runs one
  Python process per task — embarrassingly parallel across partitions,
  no shuffle; at 100 TB this scales like any map stage (though the
  expression form in text_analysis.chunk_fixed stays JVM-side and is
  the one bench exercises — this entry exists to cover the API surface,
  not to replace codegen with Python).
- `udaf_label_centroid` — per-label embedding centroid as a grouped-agg
  pandas_udf (Arrow-batched partial aggregation per group). The same
  mean-of-vectors kernel IVF training uses (operators/ivf.py), here as
  a reusable UDAF with a zipped unnest/generate_subscripts DuckDB
  oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spec_search_spark.catalog import load_table
from spec_search_spark.operators.text_analysis import CHUNK_FIXED_SQL
from spec_search_spark.session import tune

CHUNK_SIZE = 120  # mirror text_analysis so CHUNK_FIXED_SQL is the oracle
CHUNK_OVERLAP = 30


class ChunkDocs:
    """Fixed-stride overlapping chunker as a table function: one input
    text row → n_chunks output rows. Same arithmetic as
    functions/text.chunk_indices + chunk_at."""

    def eval(self, text):  # noqa: D102 — UDTF contract method
        if text is None or text == "":
            return
        stride = CHUNK_SIZE - CHUNK_OVERLAP
        n = max(1, math.ceil((len(text) - CHUNK_OVERLAP) / stride))
        for i in range(n):
            yield i, text[i * stride : i * stride + CHUNK_SIZE]


def udtf_chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 via the UDTF surface: LATERAL chunk_docs(text)."""
    tune(spark)
    from pyspark.sql.functions import udtf

    chunk_docs = udtf(ChunkDocs, returnType="chunk_idx int, chunk string")
    spark.udtf.register("chunk_docs", chunk_docs)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM documents_udtf_v d, LATERAL chunk_docs(d.text) c
        WHERE d.text IS NOT NULL AND d.text <> ''
        """
    )


@F.pandas_udf(T.ArrayType(T.DoubleType()))  # DataType obj: no session needed at import
def _label_centroid(vec_ids: pd.Series, embs: pd.Series) -> list:  # grouped-agg
    """Mean of vectors with a DEFINED summation order: rows sorted by
    vec_id, then a sequential float64 left fold per component — the
    identical IEEE sequence as the oracle's list_reduce over
    list(val ORDER BY vec_id), so the mean is bit-for-bit equal across
    engines (numpy's pairwise-summation mean could differ by an ulp
    and flip the scaled-integer sig on a .5 boundary)."""
    order = np.argsort(vec_ids.to_numpy(), kind="stable")
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in embs])[order]
    acc = np.zeros(mat.shape[1], dtype=np.float64)
    for row in mat:  # ordered fold, not np.sum (pairwise)
        acc = acc + row
    return [float(x) for x in acc / mat.shape[0]]


def udaf_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via the UDAF (grouped-agg pandas_udf) surface.

    Output is the canon-safe scaled-int string projection (the driver's
    pandas canonicalizer crashes factorizing ndarray cells, so no raw
    array<double> leaves a registered query). Rounding happens in SQL
    (`round` = half-away-from-zero in both engines; np.round would
    banker's-round); integers render identically in both engines
    (double→string formatting does not)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(_label_centroid(F.col("vec_id"), F.col("embedding")).alias("c"))
        .select(
            "label",
            F.concat_ws(
                ",",
                F.transform(
                    F.col("c"),
                    lambda x: F.round(x * 1e4, 0).cast("bigint").cast("string"),
                ),
            ).alias("centroid_sig"),
        )
    )


def _arrow_group_stats(table):
    """applyInArrow kernel: one group's rows arrive as a pyarrow.Table;
    stats computed by Arrow compute kernels — no pandas materialization,
    no Python per-row loop. Raw doubles leave the kernel; rounding
    happens JVM-side so both engines share one half-away-from-zero
    round."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pa.table(
        {
            "event_type": [table.column("event_type")[0].as_py()],
            "n": [table.num_rows],
            "n_users": [pc.count_distinct(table.column("user_id")).as_py()],
            "total_value": [pc.sum(table.column("value")).as_py()],
            "max_value": [pc.max(table.column("value")).as_py()],
        }
    )


def arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third grouped-UDF API surface: `groupBy().applyInArrow` —
    the zero-copy Arrow-native sibling of applyInPandas (Spark 4).
    Per-event-type stats computed by Arrow compute kernels on the raw
    record batches; pandas never materializes.

    Scale: one shuffle on the group key, Arrow batches stream through
    the Python worker. The same stats are one `groupBy().agg()` in
    pure SQL (the oracle) — this entry exists to cover the API
    surface, proving custom columnar kernels slot into the operator
    set when built-ins genuinely cannot express one."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    out = ev.groupBy("event_type").applyInArrow(
        _arrow_group_stats,
        "event_type string, n bigint, n_users bigint, "
        "total_value double, max_value double",
    )
    return out.select(
        "event_type",
        "n",
        "n_users",
        F.round("total_value", 2).alias("total_value"),
        "max_value",
    )


ARROW_GROUP_STATS_SQL = """
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 2) AS total_value,
       max(value) AS max_value
FROM events GROUP BY event_type
"""


def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined functions (§2.11's declarative member): a
    scalar UDF (`disc_price`) and a scalar CASE classifier
    (`qty_band`) defined in SQL and used inside a grouped aggregation.
    Unlike Python UDFs, SQL UDFs are INLINED by Catalyst — the audited
    plan carries partial+final hash aggregation with ZERO
    Python/Arrow hops, i.e. user-defined abstraction at native codegen
    speed. This is THE extensibility mechanism to prefer at 100 TB
    whenever the body is expressible as an expression; the
    Python/pandas surfaces (`udtf_chunk_explode`,
    `udaf_label_centroid`, `arrow_group_stats`) exist for bodies that
    are not."""
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_li")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION _ssu_disc_price(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION _ssu_qty_band(q DOUBLE)"
        " RETURNS STRING RETURN"
        " CASE WHEN q < 10 THEN 'low' WHEN q < 30 THEN 'mid' ELSE 'high' END"
    )
    # integer-cents accumulation (bucketed.py pattern): a raw double
    # sum under round(,2) is partition-order-sensitive at a .005
    # boundary — the exact defect class e59cfe7 fixed in kmeans
    return spark.sql(
        """
        SELECT _ssu_qty_band(l_quantity) AS band,
               count(*) AS n_items,
               round(sum(cast(round(_ssu_disc_price(l_extendedprice, l_discount)
                                    * 100) as bigint)) / 1e2, 2) AS revenue
        FROM _sqludf_li
        GROUP BY _ssu_qty_band(l_quantity)
        """
    )


SQL_UDF_SQL = """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
       count(*) AS n_items,
       round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                      AS BIGINT)) / 1e2, 2) AS revenue
FROM lineitem
GROUP BY 1
"""


QUERIES = {
    "udtf_chunk_explode": udtf_chunk_explode,
    "udaf_label_centroid": udaf_label_centroid,
    "arrow_group_stats": arrow_group_stats,
    "sql_udf_revenue": sql_udf_revenue,
}

ORACLES = {
    "udtf_chunk_explode": CHUNK_FIXED_SQL,
    "udaf_label_centroid": """
SELECT label, string_agg(q::VARCHAR, ',' ORDER BY ord) AS centroid_sig FROM (
  -- ordered left fold / count, NOT avg(): matches the UDAF's
  -- vec_id-ordered sequential sum bit-for-bit (see _label_centroid)
  SELECT label, ord,
         CAST(round(list_reduce(list_prepend(0.0::DOUBLE,
                                             list(val::DOUBLE ORDER BY vec_id)),
                                (a, x) -> a + x)
                    / count(*) * 10000) AS BIGINT) AS q
  FROM (
    SELECT label, vec_id, generate_subscripts(embedding, 1) AS ord,
           unnest(embedding) AS val
    FROM embeddings
  ) u
  GROUP BY label, ord
) GROUP BY label
""",
    "arrow_group_stats": ARROW_GROUP_STATS_SQL,
    "sql_udf_revenue": SQL_UDF_SQL,
}
