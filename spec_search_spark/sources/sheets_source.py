"""Custom PySpark DataSource ``sheets`` — the engine-surface form of
the reference's Drive/Sheets ingestion (S1 folder listing
`/root/reference/indexer.py:80-90`, S2/S3 full-sheet scans
`indexer.py:20-32` / `project_search.py:45`, S4 ranged scan
`sheet_creator_tool.py:55-68`, S6 write-back sink
`sheet_creator_tool.py:83-96`), over local fixtures instead of the
network API (auth is an I/O-adapter concern, not engine surface).

Fixture layout (the local stand-in for a Drive folder): a directory of
``{file_name}.sheet.json`` files, one per spreadsheet::

    {"file_id": 0, "file_name": "sheet_000", "tabs": [
        {"sheet_id": 100, "tab_name": "data", "values": [[...], ...]}]}

Read (grid mode, default) — one output row per grid row::

    file_id bigint, file_name string, sheet_id bigint, tab_name string,
    row_idx int, cells array<string>

- one InputPartition per FILE by default: sheets scan
  cluster-parallel, the same unit the reference iterates sequentially.
  partitions() only LISTS the directory — no file is opened until
  read() runs on an executor. ``option("bundle", N)`` packs files into
  ~N partitions (greedy, listing order, capped at
  ``_BUNDLE_BYTES_CAP`` bytes per partition so a huge corpus still
  splits by data size, guide §6 maxPartitionBytes-style): at test
  scale thousands of tiny files stop paying one scheduler/worker
  round-trip each, at 100 TB the byte cap keeps partitions bounded.
- read() yields Arrow RecordBatches (guide §4.2): whole decoded files
  cross the Python→JVM boundary as columnar batches instead of
  per-row pickled tuples.
- ``option("range", "B2:D5")``: A1 ranged scan (S4) — only the
  requested row window is emitted and cells are sliced to the column
  window, like the reference's ``get_range`` (raw values, no
  addresses).
- pushFilters: EqualTo on ``file_name`` prunes whole partitions from
  the directory listing BEFORE any file is opened (partition pruning
  at the listing level); everything else stays with Spark.

Read (``option("mode", "records")``) — S3 header-schema scan: the
first row of the first tab defines the column names
(``get_all_records`` semantics); each later row becomes one record of
string columns (padded with ''). schema() opens one file at planning
time to learn the header — the price of dynamic schemas.

Write — ``df.write.format("sheets").mode("overwrite").save(dir)``
accepts the grid-mode row shape and writes the fixture layout back:
executors write temp JSON parts (parallel, cell-count work), commit()
merges parts into per-file documents on the driver (serial work ∝
file count, not cell count) and is atomic-ish: parts land in a temp
dir and final files replace targets only in commit.

Streaming write — ``df.writeStream.format("sheets")`` upserts each
micro-batch into the sheet files at row granularity (overlay), with
per-epoch commit markers so a replayed batchId after restart is a
no-op (the vestigial `/index-file` webhook of `app.py:252-259` as a
real incremental sink).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SHEET_SUFFIX = ".sheet.json"

GRID_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("file_name", StringType()),
        StructField("sheet_id", LongType()),
        StructField("tab_name", StringType()),
        StructField("row_idx", IntegerType()),
        StructField("cells", ArrayType(StringType())),
    ]
)

_RANGE_RE = re.compile(r"^([A-Z]+)(\d+):([A-Z]+)(\d+)$")

#: byte cap per bundled scan partition: with option("bundle", N) files
#: are packed into ~N partitions ONLY while a partition stays under
#: this many bytes — a corpus far bigger than N × cap therefore splits
#: by size (≈ total_bytes / cap partitions), the maxPartitionBytes
#: behavior of a native scan, not N giant serial reads.
_BUNDLE_BYTES_CAP = 128 * 1024 * 1024

#: rows per emitted Arrow batch (bounds executor memory for bundles of
#: many files; one tiny file still emits one small batch).
_ARROW_BATCH_ROWS = 10_000


def _col_to_idx(letters: str) -> int:
    """A1 letters → 0-based column index (inverse of functions.sheets
    a1_letter; 'A'→0, 'Z'→25, 'AA'→26)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _parse_range(spec: str) -> tuple[int, int, int, int]:
    """'B2:D5' → (row_lo, row_hi, col_lo, col_hi) all 0-based inclusive."""
    m = _RANGE_RE.fullmatch(spec.strip())
    if not m:
        raise ValueError(f"bad A1 range {spec!r} (expected e.g. 'B2:D5')")
    c1, r1, c2, r2 = m.groups()
    return int(r1) - 1, int(r2) - 1, _col_to_idx(c1), _col_to_idx(c2)


def _list_sheet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(SHEET_SUFFIX)
    )




_ARROW_GRID_FIELDS = (
    ("file_id", "int64"),
    ("file_name", "string"),
    ("sheet_id", "int64"),
    ("tab_name", "string"),
    ("row_idx", "int32"),
    ("cells", "list<string>"),
)


def _arrow_grid_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("file_id", pa.int64()),
            pa.field("file_name", pa.string()),
            pa.field("sheet_id", pa.int64()),
            pa.field("tab_name", pa.string()),
            pa.field("row_idx", pa.int32()),
            pa.field("cells", pa.list_(pa.string())),
        ]
    )


def _grid_arrow_batches(paths, range_=None):
    """Grid-mode rows for a list of sheet files as Arrow RecordBatches
    (guide §4.2: columnar batches across the Python→JVM boundary, not
    per-row pickled tuples), flushed every _ARROW_BATCH_ROWS rows.
    Shared by the batch and streaming readers."""
    import pyarrow as pa

    schema = _arrow_grid_schema()
    cols: list[list] = [[] for _ in schema]

    def flush():
        batch = pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )
        for c in cols:
            c.clear()
        return batch

    for path in paths:
        with open(path) as fh:
            doc = json.load(fh)
        fid, fname = int(doc["file_id"]), doc["file_name"]
        for tab in doc["tabs"]:
            sid, tname = int(tab["sheet_id"]), tab["tab_name"]
            values = tab["values"]
            rows = enumerate(values)
            if range_ is not None:
                r_lo, r_hi, c_lo, c_hi = range_
                rows = (
                    (i, row[c_lo : c_hi + 1])
                    for i, row in enumerate(values)
                    if r_lo <= i <= r_hi
                )
            for row_idx, cells in rows:
                cols[0].append(fid)
                cols[1].append(fname)
                cols[2].append(sid)
                cols[3].append(tname)
                cols[4].append(int(row_idx))
                cols[5].append(
                    [None if c is None else str(c) for c in cells]
                )
        if len(cols[0]) >= _ARROW_BATCH_ROWS:
            yield flush()
    if cols[0]:
        yield flush()


class SheetsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming READER over the sheet-file feed: the
    offset is a position in the sorted file listing, each batch
    ingests the files that appeared since the last committed offset —
    the engine form of the reference's vestigial `/index-file`
    webhook's ingestion side (`app.py:252-259`), polling the folder
    instead of being called per file.

    Contract notes: ``latestOffset`` reports the TRUE latest (all
    files currently present) — the plain Python streaming API has no
    admission-control hook, and a reader-side throttle that remembers
    its own position replays data after a restart (a throttled offset
    can land BEHIND the checkpointed commit, and the engine then plans
    a backward batch; found by the restart test). Arrival pacing
    therefore lives where it belongs — in the feed (files appear over
    time; sheet names must be append-only in listing order, as
    arriving files sorting before already-committed positions would
    shift the mapping). partitions(start, end) hands one
    InputPartition per new file to executors, so each batch's decode
    work is cluster-parallel exactly like the batch scan; restart
    resumes from the checkpointed offset with no reader-side state at
    all."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheets source requires a path")
        self.bundle = int(options.get("bundle", "0") or "0")

    def _feed(self) -> list[str]:
        # a feed dir that does not exist YET is an empty feed, not an
        # error — the batch reader keeps its loud missing-path failure
        return _list_sheet_files(self.path) if os.path.isdir(self.path) else []

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._feed())}

    def partitions(self, start: dict, end: dict):
        files = self._feed()[start["index"] : end["index"]]
        return [InputPartition(chunk) for chunk in _bundle(files, self.bundle)]

    def read(self, partition: InputPartition):
        paths = (
            partition.value
            if isinstance(partition.value, (list, tuple))
            else [partition.value]
        )
        yield from _grid_arrow_batches(paths)

    def commit(self, end: dict) -> None:
        pass


def _bundle(files: list[str], target: int) -> list[list[str]]:
    """Pack files into ~``target`` partitions in listing order, capping
    each partition at _BUNDLE_BYTES_CAP bytes: deterministic greedy
    packing, so the same listing always yields the same partitions."""
    if target <= 0 or len(files) <= target:
        return [[f] for f in files]
    per = -(-len(files) // target)
    out: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and (len(cur) >= per or cur_bytes + sz > _BUNDLE_BYTES_CAP):
            out.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        out.append(cur)
    return out


class SheetsReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheets source requires a path")
        self.mode = (options.get("mode") or "grid").lower()
        self.range = _parse_range(options["range"]) if options.get("range") else None
        self.header: list[str] | None = None
        if self.mode == "records":
            self.header = [f.name for f in schema.fields]
        self.bundle = int(options.get("bundle", "0") or "0")
        self.file_name_filters: list[str] = []

    def pushFilters(self, filters):
        # AND-list: EqualTo(file_name) prunes the listing; everything
        # else is returned for Spark to evaluate post-scan.
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("file_name",):
                self.file_name_filters.append(f.value)
            else:
                yield f

    def partitions(self):
        files = _list_sheet_files(self.path)
        if self.file_name_filters:
            keep = {f"{name}{SHEET_SUFFIX}" for name in self.file_name_filters}
            files = [p for p in files if os.path.basename(p) in keep]
        return [InputPartition(chunk) for chunk in _bundle(files, self.bundle)]

    def read(self, partition: InputPartition):
        """Decode the partition's files and yield Arrow RecordBatches
        (guide §4.2: the decoded grid crosses the Python→JVM boundary
        as columnar batches, not per-row pickled tuples), flushing
        every _ARROW_BATCH_ROWS rows to bound batch memory."""
        paths = (
            partition.value
            if isinstance(partition.value, (list, tuple))
            else [partition.value]
        )
        if self.mode == "records":
            yield from self._records_arrow_batches(paths)
        else:
            yield from _grid_arrow_batches(paths, self.range)

    def _records_arrow_batches(self, paths):
        import pyarrow as pa

        header = self.header or []
        schema = pa.schema([pa.field(name, pa.string()) for name in header])
        width = len(header)
        cols: list[list] = [[] for _ in header]

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.string()) for c in cols], schema=schema
            )
            for c in cols:
                c.clear()
            return batch

        for path in paths:
            with open(path) as fh:
                doc = json.load(fh)
            for tab in doc["tabs"]:
                values = tab["values"]
                if not values:
                    continue
                for row in values[1:]:  # first row is the header
                    padded = [
                        str(c) if c is not None else "" for c in row[:width]
                    ]
                    padded += [""] * (width - len(padded))
                    for j in range(width):
                        cols[j].append(padded[j])
            if cols and len(cols[0]) >= _ARROW_BATCH_ROWS:
                yield flush()
        if cols and cols[0]:
            yield flush()


@dataclass
class SheetsCommitMessage(WriterCommitMessage):
    part_path: str


def _write_part(tmp_dir: str, iterator) -> SheetsCommitMessage:
    os.makedirs(tmp_dir, exist_ok=True)
    part = os.path.join(tmp_dir, f"part_{uuid.uuid4().hex}.json")
    rows = [
        {
            "file_id": r["file_id"],
            "file_name": r["file_name"],
            "sheet_id": r["sheet_id"],
            "tab_name": r["tab_name"],
            "row_idx": r["row_idx"],
            "cells": list(r["cells"]) if r["cells"] is not None else [],
        }
        for r in iterator
    ]
    with open(part, "w") as fh:
        json.dump(rows, fh)
    return SheetsCommitMessage(part_path=part)


def _collect_parts(messages) -> dict:
    """part files → {(file_id, file_name): {(sheet_id, tab): {row_idx: cells}}}"""
    files: dict[tuple[int, str], dict] = {}
    for m in messages:
        if m is None:
            continue
        with open(m.part_path) as fh:
            for r in json.load(fh):
                tab = files.setdefault((r["file_id"], r["file_name"]), {}).setdefault(
                    (r["sheet_id"], r["tab_name"]), {}
                )
                tab[r["row_idx"]] = r["cells"]
    return files


def _merge_into_dir(path: str, files: dict, overlay: bool) -> None:
    """Write per-file sheet documents. With overlay=True, new rows are
    merged over the rows of an existing same-named file (row-level
    upsert — the incremental-indexing shape); otherwise the file is
    replaced wholesale."""
    for (file_id, file_name), tabs in sorted(files.items()):
        target = os.path.join(path, f"{file_name}{SHEET_SUFFIX}")
        merged: dict[tuple[int, str], dict] = {}
        if overlay and os.path.exists(target):
            with open(target) as fh:
                old = json.load(fh)
            for t in old["tabs"]:
                merged[(t["sheet_id"], t["tab_name"])] = dict(enumerate(t["values"]))
        for key, rows in tabs.items():
            merged.setdefault(key, {}).update(rows)
        doc = {
            "file_id": file_id,
            "file_name": file_name,
            "tabs": [
                {
                    "sheet_id": sheet_id,
                    "tab_name": tab_name,
                    # dense row list in row_idx order (missing rows
                    # between written ones become empty rows)
                    "values": [
                        rows.get(i, [])
                        for i in range(max(rows.keys(), default=-1) + 1)
                    ],
                }
                for (sheet_id, tab_name), rows in sorted(merged.items())
            ],
        }
        with open(target, "w") as fh:
            json.dump(doc, fh)


class SheetsWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheets sink requires a path")
        self.overwrite = overwrite
        self.tmp_dir = os.path.join(self.path, f"_sheets_tmp_{uuid.uuid4().hex}")

    def write(self, iterator):
        return _write_part(self.tmp_dir, iterator)

    def commit(self, messages):
        import shutil

        files = _collect_parts(messages)
        if self.overwrite:
            for old in _list_sheet_files(self.path):
                os.remove(old)
        _merge_into_dir(self.path, files, overlay=False)
        shutil.rmtree(self.tmp_dir, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.tmp_dir, ignore_errors=True)


class SheetsStreamWriter(DataSourceStreamWriter):
    """Streaming sheet sink: each micro-batch upserts its rows into the
    sheet files (row-level overlay, like repeated write_values calls in
    the reference's agent loop). Epoch markers make re-commits after a
    restart idempotent: a batchId whose marker exists is dropped, so
    replayed epochs don't double-apply."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheets sink requires a path")
        self.tmp_dir = os.path.join(self.path, f"_sheets_stream_tmp_{uuid.uuid4().hex}")

    def write(self, iterator):
        return _write_part(self.tmp_dir, iterator)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_sheets_epoch_{batch_id}")

    def commit(self, messages, batchId: int) -> None:
        import shutil

        if not os.path.exists(self._marker(batchId)):
            _merge_into_dir(self.path, _collect_parts(messages), overlay=True)
            with open(self._marker(batchId), "w"):
                pass
        shutil.rmtree(self.tmp_dir, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(self.tmp_dir, ignore_errors=True)


class SheetsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sheets"

    def schema(self):
        if (self.options.get("mode") or "grid").lower() == "records":
            files = _list_sheet_files(self.options["path"])
            if not files:
                raise ValueError("records mode needs at least one sheet file")
            with open(files[0]) as fh:
                doc = json.load(fh)
            header = doc["tabs"][0]["values"][0]
            return StructType([StructField(str(h), StringType()) for h in header])
        return GRID_SCHEMA

    def reader(self, schema):
        return SheetsReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return SheetsWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return SheetsStreamWriter(self.options)

    def streamReader(self, schema):
        return SheetsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SheetsDataSource)
