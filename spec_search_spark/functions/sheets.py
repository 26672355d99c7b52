"""Sheet-addressing functions: A1 letters, composite ids, deep links,
type sniffing.

Reference behaviors re-expressed as pure Catalyst column expressions
(no Python UDFs — these run inside whole-stage codegen):

- A1 column letter: `/root/reference/indexer.py:42` computes
  ``chr(65 + col%26)`` with a buggy two-char branch (``chr(64+col//26)``
  yields ``@`` for col 26..51). We implement CORRECT base-26
  (A..Z, AA..ZZ) — documented divergence (SURVEY.md §7 "A1 bug").
- composite id: ``{file_id}_{sheet_id}_{colletter}{row}_{i}``
  (`/root/reference/indexer.py:56`).
- deep link: Google-Sheets cell URL (`/root/reference/app.py:69`).
- row addressing is 1-based plus a header row: ``row_idx + 2``
  (`/root/reference/indexer.py:54`).
- type sniffing: integer/float/bool/date/string heuristic
  (`/root/reference/sheet_creator_tool.py:98-128`), re-expressed as a
  regex/try_cast CASE chain with English labels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regexes shared verbatim with the DuckDB oracles (see operators/*.py) so
# both engines compute the identical classification.
RE_INT = r"^[+-]?[0-9]+$"
RE_FLOAT = r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"
RE_DATE_ISO = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
RE_DATE_DMY = r"^[0-9]{1,2}/[0-9]{1,2}/[0-9]{4}$"


def a1_letter(col_idx: Column) -> Column:
    """0-based column index → spreadsheet letter (A..Z, AA..ZZ, ...).

    Correct base-26 for 0..701 (two letters), unlike the reference's
    ``@``-producing branch (`indexer.py:42`).
    """
    first = F.char(F.lit(64) + F.floor(col_idx / 26))  # 65 + idx//26 - 1
    second = F.char(F.lit(65) + col_idx % 26)
    return F.when(col_idx < 26, second).otherwise(F.concat(first, second))


def cell_row_number(row_idx: Column) -> Column:
    """0-based data row index → 1-based sheet row below a header row
    (``row_index + 2``, `indexer.py:54`)."""
    return (row_idx + F.lit(2)).cast("int")


def composite_id(
    file_id: Column, sheet_id: Column, col_idx: Column, row_idx: Column, chunk_i: Column
) -> Column:
    """``{file_id}_{sheet_id}_{colletter}{row}_{i}`` (`indexer.py:56`)."""
    return F.concat_ws(
        "_",
        file_id.cast("string"),
        sheet_id.cast("string"),
        F.concat(a1_letter(col_idx), cell_row_number(row_idx).cast("string")),
        chunk_i.cast("string"),
    )


def deep_link(file_id: Column, sheet_id: Column, col_idx: Column, row_idx: Column) -> Column:
    """Cell-provenance URL (`app.py:69`)."""
    return F.concat(
        F.lit("https://docs.google.com/spreadsheets/d/"),
        file_id.cast("string"),
        F.lit("/edit#gid="),
        sheet_id.cast("string"),
        F.lit("&range="),
        a1_letter(col_idx),
        cell_row_number(row_idx).cast("string"),
    )


def sniff_type(value: Column) -> Column:
    """Heuristic value-type classifier (`sheet_creator_tool.py:98-128`),
    as a codegen'd CASE chain. English labels (divergence: reference
    returns Vietnamese strings)."""
    v = F.trim(value)
    return (
        F.when(v.rlike(RE_INT), F.lit("integer"))
        .when(v.rlike(RE_FLOAT), F.lit("float"))
        .when(F.lower(v).isin("true", "false", "yes", "no"), F.lit("boolean"))
        .when(v.rlike(RE_DATE_ISO) | v.rlike(RE_DATE_DMY), F.lit("date"))
        .otherwise(F.lit("string"))
    )


def sniff_type_sql(expr: str) -> str:
    """The identical classifier as DuckDB SQL (oracle side)."""
    return f"""CASE
      WHEN regexp_matches(trim({expr}), '{RE_INT}') THEN 'integer'
      WHEN regexp_matches(trim({expr}), '{RE_FLOAT}') THEN 'float'
      WHEN lower(trim({expr})) IN ('true','false','yes','no') THEN 'boolean'
      WHEN regexp_matches(trim({expr}), '{RE_DATE_ISO}')
        OR regexp_matches(trim({expr}), '{RE_DATE_DMY}') THEN 'date'
      ELSE 'string' END"""


def a1_letter_sql(expr: str) -> str:
    """Correct base-26 A1 letter as DuckDB SQL over a 0-based index."""
    return (
        f"CASE WHEN {expr} < 26 THEN chr((65 + ({expr}) % 26)::INT) "
        f"ELSE chr((64 + ({expr}) // 26)::INT) || chr((65 + ({expr}) % 26)::INT) END"
    )
