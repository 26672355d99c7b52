"""Reference-pipeline operators: cell-grid unpivot (V3), A1 letters
(F1), composite ids (F2), deep links (F3), provenance (V4), type
sniffing (F5) — SURVEY.md §2.9.

The reference walks a spreadsheet grid with nested Python row/col
loops emitting one record per non-empty cell
(`/root/reference/indexer.py:31-44`). Here the grid is a DataFrame of
``cells: array<array<string>>`` and the unpivot is two ``posexplode``s
— fully parallel, no driver loop.

Scale: posexplode is a narrow transformation (no shuffle); the only
shuffles in the demo pipeline are the groupBys that *construct* the
grid from the flat `documents` table (a real deployment would read
grids directly from the source connector). Grid construction keys on
(file_id, row) → well-distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.sheets import (
    a1_letter,
    a1_letter_sql,
    cell_row_number,
    composite_id,
    deep_link,
    sniff_type,
    sniff_type_sql,
)
from spec_search_spark.session import tune

# grid layout: 60 cells per file, 30 columns per row → exercises
# two-letter A1 addresses (cols 26..29 → AA..AD).
CELLS_PER_FILE = 60
COLS_PER_ROW = 30


def build_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic grid(file_id, sheet_id, cells[][]) — the
    FIXTURES.md §1 construction."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    placed = docs.select(
        (F.col("doc_id") / CELLS_PER_FILE).cast("bigint").alias("file_id"),
        ((F.col("doc_id") % CELLS_PER_FILE) / COLS_PER_ROW).cast("int").alias("row_idx"),
        (F.col("doc_id") % COLS_PER_ROW).cast("int").alias("col_idx"),
        "text",
    )
    rows = placed.groupBy("file_id", "row_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("col_idx", "text"))), lambda s: s["text"]
        ).alias("cells_row")
    )
    return rows.groupBy("file_id").agg(
        (F.lit(100) + F.col("file_id")).alias("sheet_id"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("row_idx", "cells_row"))),
            lambda s: s["cells_row"],
        ).alias("cells"),
    )


def cell_grid_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: grid → one row per non-empty cell with full provenance
    (A1 address, composite id, deep link) — the reference's nested
    loops (`indexer.py:31-44`) as two posexplodes."""
    grid = build_grid(spark, sf_dir)
    per_row = grid.select(
        "file_id", "sheet_id", F.posexplode("cells").alias("row_idx", "row_cells")
    )
    cells = per_row.select(
        "file_id",
        "sheet_id",
        "row_idx",
        F.posexplode("row_cells").alias("col_idx", "cell_text"),
    ).filter(F.col("cell_text").isNotNull() & (F.col("cell_text") != ""))  # P1 empty filter
    return cells.select(
        "file_id",
        "sheet_id",
        a1_letter(F.col("col_idx")).alias("col_letter"),
        cell_row_number(F.col("row_idx")).alias("sheet_row"),
        composite_id(
            F.col("file_id"), F.col("sheet_id"), F.col("col_idx"), F.col("row_idx"), F.lit(0)
        ).alias("cell_id"),
        deep_link(
            F.col("file_id"), F.col("sheet_id"), F.col("col_idx"), F.col("row_idx")
        ).alias("link"),
        F.col("cell_text"),
    )


_A1 = a1_letter_sql(f"(doc_id % {COLS_PER_ROW})")
CELL_GRID_SQL = f"""
SELECT doc_id // {CELLS_PER_FILE} AS file_id,
       100 + doc_id // {CELLS_PER_FILE} AS sheet_id,
       {_A1} AS col_letter,
       CAST((doc_id % {CELLS_PER_FILE}) // {COLS_PER_ROW} + 2 AS INT) AS sheet_row,
       (doc_id // {CELLS_PER_FILE})::VARCHAR || '_' ||
       (100 + doc_id // {CELLS_PER_FILE})::VARCHAR || '_' ||
       {_A1} || ((doc_id % {CELLS_PER_FILE}) // {COLS_PER_ROW} + 2)::VARCHAR || '_0'
         AS cell_id,
       'https://docs.google.com/spreadsheets/d/' || (doc_id // {CELLS_PER_FILE})::VARCHAR ||
       '/edit#gid=' || (100 + doc_id // {CELLS_PER_FILE})::VARCHAR ||
       '&range=' || {_A1} || ((doc_id % {CELLS_PER_FILE}) // {COLS_PER_ROW} + 2)::VARCHAR
         AS link,
       text AS cell_text
FROM documents
WHERE text IS NOT NULL AND text <> ''
"""


def type_sniff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: classify stringified values from heterogeneous sources and
    count per (source, type) — the `suggest_data_type` heuristic
    (`sheet_creator_tool.py:98-128`) as a codegen'd CASE chain."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    sample = (
        ev.select(F.lit("event_id").alias("src"), F.col("event_id").cast("string").alias("v"))
        .unionByName(ev.select(F.lit("value").alias("src"), F.col("value").cast("string").alias("v")))
        .unionByName(ev.select(F.lit("event_type").alias("src"), F.col("event_type").alias("v")))
        .unionByName(
            ev.select(
                F.lit("date").alias("src"),
                F.date_format("ts", "yyyy-MM-dd").alias("v"),
            )
        )
    )
    return sample.groupBy("src", sniff_type(F.col("v")).alias("sniffed")).agg(
        F.count(F.lit(1)).alias("n")
    )


TYPE_SNIFF_SQL = f"""
SELECT src, {sniff_type_sql("v")} AS sniffed, count(*) AS n
FROM (
  SELECT 'event_id' AS src, event_id::VARCHAR AS v FROM events
  UNION ALL SELECT 'value', value::VARCHAR FROM events
  UNION ALL SELECT 'event_type', event_type FROM events
  UNION ALL SELECT 'date', strftime(ts, '%Y-%m-%d') FROM events
) s
GROUP BY src, sniffed
"""


def index_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (outcome counters / error isolation): per-source ingestion
    tallies — docs seen, docs indexed, empties skipped, chunks
    produced — the batch analog of the reference's per-file indexing
    counters (`/root/reference/indexer.py:58-60,117-129`). Bad rows
    are counted and quarantined by predicate, never by exception: one
    partial+final aggregation, no Python."""
    from spec_search_spark.functions.text import chunk_indices
    from spec_search_spark.operators.text_analysis import CHUNK_OVERLAP, CHUNK_SIZE

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    ok = F.col("text").isNotNull() & (F.col("text") != "")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(ok, 1)).alias("n_indexed"),
        F.count(F.when(~ok, 1)).alias("n_skipped_empty"),
        F.sum(
            F.when(ok, F.size(chunk_indices(F.col("text"), CHUNK_SIZE, CHUNK_OVERLAP)))
            .otherwise(F.lit(0))
        ).alias("n_chunks"),
    )


def _index_outcomes_sql() -> str:
    from spec_search_spark.functions.text import chunk_fixed_sql
    from spec_search_spark.operators.text_analysis import CHUNK_OVERLAP, CHUNK_SIZE

    n_chunks = chunk_fixed_sql(CHUNK_SIZE, CHUNK_OVERLAP)["n_chunks"]
    return f"""
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN text IS NOT NULL AND text <> '' THEN 1 END) AS n_indexed,
       count(CASE WHEN text IS NULL OR text = '' THEN 1 END) AS n_skipped_empty,
       CAST(sum(CASE WHEN text IS NOT NULL AND text <> ''
                     THEN {n_chunks} ELSE 0 END) AS BIGINT) AS n_chunks
FROM documents
GROUP BY source
"""


QUERIES = {
    "cell_grid_unpivot": cell_grid_unpivot,
    "type_sniff_summary": type_sniff_summary,
    "index_outcomes": index_outcomes,
}

ORACLES = {
    "cell_grid_unpivot": CELL_GRID_SQL,
    "type_sniff_summary": TYPE_SNIFF_SQL,
    "index_outcomes": _index_outcomes_sql(),
}
