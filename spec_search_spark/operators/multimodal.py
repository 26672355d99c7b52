"""Multimodal column operators (north-star, BASELINE.json): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` over whole partitions.

The container has no image/audio libraries, so the actual codec step
is STUBBED (``decode_stub_enabled`` / NotImplementedError path below)
behind a deterministic fake that derives metadata purely from the
payload bytes — the Spark-side plumbing (schema, partitioning, UDF
signature, Arrow batch shape) is real and oracle-checked.

Scale notes:
- payloads stay in executor memory as Arrow binary buffers; nothing
  is collected to the driver.
- `mapInPandas` yields per-batch DataFrames → one Python worker per
  core streams batches; `spark.sql.execution.arrow.maxRecordsPerBatch`
  bounds batch memory for multi-MB payloads (set it to ~64 for real
  images; the default 10k is fine for the test payloads).
- a real deployment stores payloads in parquet BINARY (or object-store
  pointers for >100 MB blobs) partitioned by content shard; metadata
  columns make partition pruning possible before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

#: flip to True when a real codec (PIL/torchaudio/ffmpeg) is installed;
#: the mapInPandas plumbing is identical either way.
REAL_DECODE_AVAILABLE = False

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, checksum bigint"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a codec: metadata derived from bytes.

    Replace with PIL/ffmpeg when available (REAL_DECODE_AVAILABLE);
    raise NotImplementedError there to make the stub boundary loud.
    """
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real codec here (PIL/ffmpeg)")
    n = len(payload)
    width = 64 + n % 577
    height = 64 + n % 433
    n_frames = 1 + n % 7
    checksum = 0
    for b in payload[:256]:  # bounded prefix so cost is O(1) per row
        checksum = (checksum * 31 + b) % 2147483647
    return width, height, n_frames, checksum


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media_type, payload) → metadata.

    Asserts the ASCII contract the DuckDB oracle depends on (oracle
    recomputes the checksum from the TEXT column via ord(); a
    non-ASCII doc would make utf-8 byte length ≠ char length and byte
    values ≠ code points, silently diverging) — better a loud error at
    the boundary than a hash mismatch downstream."""
    for pdf in batches:
        for p in pdf["payload"]:
            if any(b > 127 for b in p[:256]) or len(p) != len(p.decode("utf-8")):
                raise ValueError(
                    "multimodal oracle requires ASCII payloads (non-ASCII byte found)"
                )
        meta = pdf["payload"].map(_fake_decode)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": meta.map(lambda m: m[0]).astype("int32"),
                "height": meta.map(lambda m: m[1]).astype("int32"),
                "n_frames": meta.map(lambda m: m[2]).astype("int32"),
                "checksum": meta.map(lambda m: m[3]).astype("int64"),
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from `documents`: utf-8 payload bytes +
    a media_type derived from doc_id (the binary-column fixture)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over the binary column via mapInPandas.

    Oracle: the fake-decode metadata is pure arithmetic over byte
    length + byte prefix, so DuckDB reproduces it from the text column
    (payload = utf-8 of text; docs are ASCII so octet_length =
    length)."""
    media = media_table(spark, sf_dir)
    return media.mapInPandas(decode_media_batch, DECODED_SCHEMA)


MULTIMODAL_SQL = """
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
       CAST(64 + octet_length(encode(text)) % 433 AS INT) AS height,
       CAST(1 + octet_length(encode(text)) % 7 AS INT) AS n_frames,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_extract_all(substring(text, 1, 256), '[\\s\\S]'),
                          c -> ord(c)::BIGINT)),
         (acc, b) -> (acc * 31 + b) % 2147483647) AS checksum
FROM documents
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: explode n_frames into (doc_id, frame_idx)
    work units — the shape a video pipeline fans decode tasks out on."""
    decoded = multimodal_decode(spark, sf_dir)
    return decoded.select(
        "doc_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
       CAST(unnest(range(0, 1 + octet_length(encode(text)) % 7)) AS INT) AS frame_idx
FROM documents
"""


QUERIES = {
    "multimodal_decode": multimodal_decode,
    "multimodal_frame_sample": frame_sample,
}

ORACLES = {
    "multimodal_decode": MULTIMODAL_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
}
