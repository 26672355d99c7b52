"""Multimodal column operators (north-star, BASELINE.json): treat
image/audio/video payloads as opaque ``binary`` columns with typed
metadata; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` over whole partitions.

The codec seam is PLUGGABLE (``make_decode_media_batch(decoder)``):
the oracle-checked fixture queries use a deterministic fake decoder
over utf-8 text payloads (DuckDB can replicate its arithmetic), while
``real_decode`` is a real, working pure-Python codec that parses BMP
and WAV headers from raw bytes — no image/audio libraries exist in
this container, but header-parsing needs only ``struct``, so the seam
is proven end-to-end by ``multimodal_real_codec`` (builds genuine
BMP/WAV payloads, round-trips them through the mapInPandas kernel)
the same way the embedding-model seam is proven by a swap test.
``REAL_DECODE_AVAILABLE`` is flipped by an import-time probe that
decodes a 2x2 BMP and a 4-sample WAV. A PIL/ffmpeg-class decoder
drops into the same ``decoder`` argument for formats beyond
header-parse (pixel data, resampling).

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

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int, checksum bigint"
)


def _prefix_checksum(payload: bytes) -> int:
    checksum = 0
    for b in payload[:256]:  # bounded prefix so cost is O(1) per row
        checksum = (checksum * 31 + b) % 2147483647
    return checksum


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in codec for the TEXT-payload fixture:
    metadata derived purely from byte arithmetic, so the DuckDB oracle
    can replicate it from the text column. Asserts the ASCII contract
    that replication depends on (oracle recomputes the checksum via
    ord(); a non-ASCII doc would make utf-8 byte length ≠ char length
    and byte values ≠ code points, silently diverging) — better a loud
    error at the boundary than a hash mismatch downstream."""
    if any(b > 127 for b in payload[:256]) or len(payload) != len(
        payload.decode("utf-8")
    ):
        raise ValueError(
            "multimodal oracle requires ASCII payloads (non-ASCII byte found)"
        )
    n = len(payload)
    width = 64 + n % 577
    height = 64 + n % 433
    n_frames = 1 + n % 7
    return width, height, n_frames, _prefix_checksum(payload)


# --- real pure-Python codec (BMP + WAV header parse) ------------------------

def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A genuine, spec-valid 24-bit BMP file (BITMAPINFOHEADER), with
    deterministic pixel bytes. Row stride pads to 4 bytes per the BMP
    spec — n_bytes is therefore real format arithmetic, not a fake."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    pixels = bytearray(stride * height)
    for i in range(len(pixels)):
        pixels[i] = (seed * 31 + i * 7) % 251
    size = 54 + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + info + bytes(pixels)


def make_wav(sample_rate: int, channels: int, n_samples: int, seed: int = 0) -> bytes:
    """A genuine PCM-16 WAV file (RIFF/fmt /data chunks)."""
    import struct

    block_align = channels * 2
    data = bytearray(n_samples * block_align)
    for i in range(len(data)):
        data[i] = (seed * 17 + i * 13) % 256
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + bytes(data)
    )


def real_decode(payload: bytes) -> tuple[int, int, int, int]:
    """REAL codec: parse BMP and WAV headers from raw bytes (pure
    Python ``struct`` — the only codec dependency this container has).

    Output mapping into DECODED_SCHEMA's metadata slots:
    - BMP:  (width, height, n_frames=1)   from BITMAPINFOHEADER
    - WAV:  (width=sample_rate, height=channels, n_frames=n_samples)
            from the fmt/data chunks (a frame = one sample across
            channels, data_size // block_align)
    Unknown magic raises ValueError — the loud boundary. A PIL/ffmpeg
    decoder extends this to pixel/sample CONTENT; headers are what a
    100 TB metadata-extraction pass reads anyway."""
    import struct

    if payload[:2] == b"BM" and len(payload) >= 54:
        width = struct.unpack_from("<i", payload, 18)[0]
        height = struct.unpack_from("<i", payload, 22)[0]
        return width, abs(height), 1, _prefix_checksum(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        off, rate, channels, block_align, n_frames = 12, 0, 0, 1, 0
        while off + 8 <= len(payload):
            cid, csize = struct.unpack_from("<4sI", payload, off)
            if cid == b"fmt ":
                channels, rate = struct.unpack_from("<HI", payload, off + 10)
                block_align = struct.unpack_from("<H", payload, off + 20)[0] or 1
            elif cid == b"data":
                n_frames = csize // block_align
            off += 8 + csize + (csize % 2)
        return rate, channels, n_frames, _prefix_checksum(payload)
    raise ValueError(f"unknown media magic {payload[:4]!r}")


def _probe_real_codec() -> bool:
    """Import-time probe: the real codec must round-trip a 2x2 BMP and
    a 4-sample WAV before being advertised."""
    try:
        w, h, nf, _ = real_decode(make_bmp(2, 2))
        ok_bmp = (w, h, nf) == (2, 2, 1)
        r, c, ns, _ = real_decode(make_wav(8000, 2, 4))
        return ok_bmp and (r, c, ns) == (8000, 2, 4)
    except Exception:
        return False


#: True when a working codec backs `real_decode` (probed, not assumed);
#: the mapInPandas plumbing is identical either way.
REAL_DECODE_AVAILABLE = _probe_real_codec()


def make_decode_media_batch(decoder):
    """Build a mapInPandas kernel (doc_id, media_type, payload) →
    metadata around any ``bytes -> (width, height, n_frames, checksum)``
    decoder — the codec swap seam (fake for the text-payload oracle
    fixture, `real_decode` for BMP/WAV bytes, PIL/ffmpeg in a real
    deployment)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decoder)
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

    return kernel


decode_media_batch = make_decode_media_batch(_fake_decode)
real_decode_media_batch = make_decode_media_batch(real_decode)


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


REAL_CODEC_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_frames int"
)


def multimodal_real_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec seam driven by a REAL decoder: build genuine BMP/WAV
    files (doc_id-parameterized dimensions/sample counts), hand them
    through the binary Arrow column, and parse them back with
    `real_decode` — header fields and spec arithmetic (BMP 4-byte row
    stride, RIFF chunk layout) must survive the round trip.

    Oracle: payload dimensions are functions of doc_id, so DuckDB
    replicates the expected metadata (including the BMP stride and
    WAV chunk-size arithmetic) without parsing bytes; the Spark side
    genuinely packs and re-parses every file.

    Plan: scan → synth kernel → decode kernel, two chained MapInPandas
    in ONE stage — zero exchanges; payload bytes never leave the
    executor that made them. That is the 100 TB shape for decode
    pipelines: codec work scales with cores, shuffle volume is zero.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mtypes = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    payloads.append(make_bmp(1 + d % 31, 1 + d % 17, seed=d))
                    mtypes.append("image")
                else:
                    payloads.append(
                        make_wav(8000 + d % 100, 1 + d % 2, d % 50, seed=d)
                    )
                    mtypes.append("audio")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": mtypes, "payload": payloads}
            )

    media = docs.mapInPandas(synth, "doc_id bigint, media_type string, payload binary")
    return media.mapInPandas(real_decode_media_batch, DECODED_SCHEMA).select(
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames"
    )


MULTIMODAL_REAL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN 54 + (((1 + doc_id % 31) * 3 + 3) // 4 * 4) * (1 + doc_id % 17)
                 ELSE 44 + (doc_id % 50) * (1 + doc_id % 2) * 2
            END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 31
                 ELSE 8000 + doc_id % 100 END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 17
                 ELSE 1 + doc_id % 2 END AS INT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE doc_id % 50 END AS INT) AS n_frames
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


AUDIO_ENERGY_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_frames int, "
    "total_abs bigint, peak int"
)


def decode_wav_energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL sample-content decode: parse the RIFF/fmt/data chunks and
    the PCM-16 payload itself (numpy `frombuffer('<i2')` — vectorized,
    no per-sample Python), then fold to integer energy features.
    Integer outputs (sum/max of |sample|) are exact, so the oracle is
    a value oracle, not a tolerance check."""
    import struct

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            _, channels, sample_rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", payload[20:36]
            )
            (data_len,) = struct.unpack("<I", payload[40:44])
            samples = np.frombuffer(
                payload[44 : 44 + data_len], dtype="<i2"
            ).astype(np.int64)
            a = np.abs(samples)
            rows.append(
                (
                    int(doc_id),
                    int(sample_rate),
                    int(channels),
                    data_len // block_align,
                    int(a.sum()) if len(a) else 0,
                    int(a.max()) if len(a) else 0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "sample_rate",
                "n_channels",
                "n_frames",
                "total_abs",
                "peak",
            ],
        )


def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature EXTRACTION through the codec seam — one level deeper
    than `multimodal_real_codec`'s header parse: the kernel decodes the
    PCM sample CONTENT of genuine WAV files and folds it to energy
    features (sum/max absolute amplitude), the audio analog of pixel
    statistics. The synthetic sample bytes are doc_id-parameterized,
    so DuckDB replicates the expected features by pure arithmetic
    while Spark genuinely packs bytes and decodes them back.

    Plan: scan → synth kernel → decode kernel, chained MapInPandas in
    one stage, zero exchanges — payload bytes never cross the network
    (the only 100 TB-viable shape for media feature extraction)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 2 == 1
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_wav(8000 + d % 100, 1 + d % 2, d % 50, seed=d)
                for d in (int(x) for x in pdf["doc_id"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return media.mapInPandas(decode_wav_energy_batch, AUDIO_ENERGY_SCHEMA)


# expected features by arithmetic: data[i] = (doc_id*17 + i*13) % 256,
# sample j = int16le(data[2j], data[2j+1]) — same formulas as make_wav.
AUDIO_ENERGY_SQL = """
WITH audio AS (
  SELECT doc_id,
         CAST(8000 + doc_id % 100 AS INT) AS sample_rate,
         CAST(1 + doc_id % 2 AS INT) AS n_channels,
         CAST(doc_id % 50 AS INT) AS n_frames
  FROM documents WHERE doc_id % 2 = 1),
vals AS (
  SELECT doc_id, sample_rate, n_channels, n_frames,
         list_transform(range(0, n_frames * n_channels), j ->
           CASE WHEN (doc_id*17 + (2*j)*13) % 256
                     + 256 * ((doc_id*17 + (2*j+1)*13) % 256) >= 32768
                THEN (doc_id*17 + (2*j)*13) % 256
                     + 256 * ((doc_id*17 + (2*j+1)*13) % 256) - 65536
                ELSE (doc_id*17 + (2*j)*13) % 256
                     + 256 * ((doc_id*17 + (2*j+1)*13) % 256)
           END) AS v
  FROM audio)
SELECT doc_id, sample_rate, n_channels, n_frames,
       CAST(coalesce(list_aggregate(list_transform(v, x -> abs(x)), 'sum'), 0)
            AS BIGINT) AS total_abs,
       CAST(coalesce(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 0)
            AS INT) AS peak
FROM vals
"""


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image channel statistics from the PIXEL BYTES — the image
    twin of `multimodal_audio_energy`: genuine BMPs are packed per doc
    (even doc_ids, same parameterization as `multimodal_real_codec`),
    then a numpy kernel parses the BITMAPINFOHEADER, strips the 4-byte
    row-stride padding, and sums each BGR channel as exact integers
    (the reference's feature-extraction step, `indexer.py:62-66`
    spiritually, applied to image content instead of text).

    Oracle: pixel bytes are `(doc_id*31 + i*7) % 251` by construction,
    so DuckDB reproduces the channel sums in closed form from
    (y, x, c) coordinates WITHOUT parsing bytes — the Spark side
    genuinely decodes every payload; agreement proves the stride/
    offset arithmetic of the real parse.

    Plan: synth kernel → stats kernel, two chained MapInPandas in one
    stage; only (doc_id, 5 ints) per image crosses the boundary —
    payload bytes never shuffle.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    ).select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_bmp(1 + int(d) % 31, 1 + int(d) % 17, seed=int(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "sum_b": [], "sum_g": [], "sum_r": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                import struct

                w = struct.unpack_from("<i", b, 18)[0]
                h = struct.unpack_from("<i", b, 22)[0]
                off = struct.unpack_from("<I", b, 10)[0]
                stride = (w * 3 + 3) // 4 * 4
                px = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
                rows = px.reshape(h, stride)[:, : w * 3].astype(np.int64)
                chan = rows.reshape(-1, 3).sum(axis=0)
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_b"].append(int(chan[0]))
                out["sum_g"].append(int(chan[1]))
                out["sum_r"].append(int(chan[2]))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "width": "int32", "height": "int32",
                 "sum_b": "int64", "sum_g": "int64", "sum_r": "int64"}
            )

    media = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return media.mapInPandas(
        stats,
        "doc_id bigint, width int, height int, sum_b bigint, sum_g bigint, sum_r bigint",
    )


IMAGE_STATS_SQL = """
WITH img AS (
  SELECT doc_id, CAST(1 + doc_id % 31 AS INT) AS w, CAST(1 + doc_id % 17 AS INT) AS h
  FROM documents WHERE doc_id % 2 = 0
), rows_y AS (
  SELECT doc_id, w, h, (w * 3 + 3) // 4 * 4 AS stride,
         unnest(generate_series(0, h - 1)) AS y
  FROM img
), px AS (
  SELECT doc_id, w, h, stride, y,
         unnest(generate_series(0, w - 1)) AS x
  FROM rows_y
)
SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
       CAST(sum((doc_id * 31 + (y * stride + x * 3 + 0) * 7) % 251) AS BIGINT) AS sum_b,
       CAST(sum((doc_id * 31 + (y * stride + x * 3 + 1) * 7) % 251) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 31 + (y * stride + x * 3 + 2) * 7) % 251) AS BIGINT) AS sum_r
FROM px GROUP BY doc_id
"""


# --- perceptual-hash image dedup (dHash + banded Hamming pairs) -------------

PHASH_GRID = 8  # 8×8 nearest-neighbor sample grid -> 8 rows × 7 bits
PHASH_BITS = PHASH_GRID * (PHASH_GRID - 1)  # 56: fits signed BIGINT
PHASH_BANDS = 4  # 14 bits/band; pigeonhole-lossless for hamming <= 3
PHASH_HAM_T = 3
PHASH_QUAD = 8  # re-crawl fixture: evens in the same 8-block share one image


def image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual hash — the multimodal sibling of
    SimHash text dedup and the step a LAION-scale image pipeline runs
    before training (re-crawled copies of one image under different ids
    must collapse). The fixture models exactly that: even doc_ids in
    the same PHASH_QUAD block carry byte-identical BMPs (one logical
    image, many storage ids).

    dHash: the decoded pixel grid (genuine BITMAPINFOHEADER parse,
    stride-stripped — the `multimodal_image_stats` machinery) is
    nearest-neighbor-sampled to an 8×8 integer-gray grid; each of the
    56 bits is a horizontal brightness comparison. All-integer, so the
    hash is deterministic and the oracle reproduces it CLOSED-FORM
    from the pixel-byte formula without parsing anything — agreement
    proves the real decode.

    Pair search is the SimHash pigeonhole plan, never quadratic: 14-bit
    bands → same-band candidates → exact `bit_count(xor)` verify at
    hamming ≤ 3 (4 bands make banding lossless at that radius). The
    tiny O(n²) path exists only in the DuckDB oracle.

    Output: (doc1, doc2, hamming) over even-doc images, doc1 < doc2."""
    tune(spark)
    # spread the BARE id table before the synth→phash kernel chain:
    # payloads are generated INSIDE the kernels from doc_id, so pixel
    # bytes still never cross an exchange — only 8-byte ids shuffle,
    # and the per-image Python decode (the slot's dominant cost) fans
    # out from the single-row-group local scan's one core (spread is a
    # guarded no-op at scale).
    from spec_search_spark.session import spread

    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id"),
        "doc_id",
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_bmp(
                    1 + (int(d) // PHASH_QUAD * PHASH_QUAD) % 31,
                    1 + (int(d) // PHASH_QUAD * PHASH_QUAD) % 17,
                    seed=int(d) // PHASH_QUAD * PHASH_QUAD,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        g = PHASH_GRID
        for pdf in batches:
            ids, hashes = [], []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w = struct.unpack_from("<i", b, 18)[0]
                h = struct.unpack_from("<i", b, 22)[0]
                off = struct.unpack_from("<I", b, 10)[0]
                stride = (w * 3 + 3) // 4 * 4
                px = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
                rows = px.reshape(h, stride)
                hv = 0
                for y in range(g):
                    sy = (y * h) // g
                    for x in range(g - 1):
                        sx1, sx2 = (x * w) // g, ((x + 1) * w) // g
                        g1 = int(rows[sy, sx1 * 3 : sx1 * 3 + 3].astype(np.int64).sum()) // 3
                        g2 = int(rows[sy, sx2 * 3 : sx2 * 3 + 3].astype(np.int64).sum()) // 3
                        if g1 > g2:
                            hv |= 1 << (y * (g - 1) + x)
                ids.append(int(d))
                hashes.append(hv)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes}).astype(
                {"doc_id": "int64", "phash": "int64"}
            )

    media = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    hashed = media.mapInPandas(phash, "doc_id bigint, phash bigint")

    band_bits = PHASH_BITS // PHASH_BANDS
    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(
                            f"(phash div {1 << (i * band_bits)}) % {1 << band_bits}"
                        ).alias("key"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = bands.select(
        F.col("band"), F.col("key"),
        F.col("doc_id").alias("doc1"), F.col("phash").alias("h1"),
    )
    right = bands.select(
        F.col("band"), F.col("key"),
        F.col("doc_id").alias("doc2"), F.col("phash").alias("h2"),
    )
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "h1", "h2")
        .distinct()
    )
    return (
        cand.select(
            "doc1",
            "doc2",
            F.expr("bit_count(h1 ^ h2)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_T)
    )


def _phash_sql() -> str:
    g = PHASH_GRID
    q = PHASH_QUAD
    # closed-form gray at a sampled pixel of the quad-base image:
    # pixel byte i of seed s is (s*31 + i*7) % 251 (make_bmp)
    gray = (
        "(((s * 31 + (sy * stride + sx1 * 3 + 0) * 7) % 251)"
        " + ((s * 31 + (sy * stride + sx1 * 3 + 1) * 7) % 251)"
        " + ((s * 31 + (sy * stride + sx1 * 3 + 2) * 7) % 251)) // 3"
    )
    gray2 = gray.replace("sx1", "sx2")
    return f"""
WITH img AS (
  SELECT doc_id, (doc_id // {q} * {q}) AS s,
         CAST(1 + (doc_id // {q} * {q}) % 31 AS BIGINT) AS w,
         CAST(1 + (doc_id // {q} * {q}) % 17 AS BIGINT) AS h
  FROM documents WHERE doc_id % 2 = 0
), grid AS (
  SELECT doc_id, s, w, h, (w * 3 + 3) // 4 * 4 AS stride,
         unnest(generate_series(0, {g - 1})) AS y
  FROM img
), cells AS (
  SELECT doc_id, s, w, h, stride, y,
         unnest(generate_series(0, {g - 2})) AS x
  FROM grid
), bits AS (
  SELECT doc_id, y, x,
         (y * h) // {g} AS sy,
         (x * w) // {g} AS sx1,
         ((x + 1) * w) // {g} AS sx2,
         s, stride
  FROM cells
), hv AS (
  SELECT doc_id,
         sum(CASE WHEN ({gray}) > ({gray2})
                  THEN (1::BIGINT << (y * {g - 1} + x)) ELSE 0 END) AS phash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM hv a JOIN hv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_T}
"""


PHASH_SQL = _phash_sql()


RESIZE_GRID = 4  # nearest-neighbor target: 4×4 thumbnails


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image nearest-neighbor RESIZE to a fixed RESIZE_GRID² grid
    from the decoded pixel bytes — the thumbnail/downsample step of an
    image-training pipeline (the preprocessing between decode and
    feature-extract; CLIP-style pipelines resize before embedding).

    The kernel genuinely parses each BMP (header offset, row stride)
    and samples yy = ty·h // R, xx = tx·w // R — the same arithmetic
    torchvision's NEAREST mode uses. Outputs are exact integers: the
    resized per-channel sums plus a POSITION-WEIGHTED checksum
    Σ (b+g+r)·(ty·R + tx + 1) that pins every sample to its target
    cell, so a transposed or off-by-one-stride resize cannot pass.

    Oracle: pixels are (doc_id·31 + byteoff·7) % 251 by construction,
    so DuckDB reproduces all sums closed-form from grid coordinates
    without parsing bytes. Plan: two chained MapInPandas, no exchange;
    payload bytes never shuffle."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    ).select("doc_id")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_bmp(1 + int(d) % 31, 1 + int(d) % 17, seed=int(d))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        r = RESIZE_GRID
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "rs_b": [], "rs_g": [], "rs_r": [], "pos_checksum": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w = struct.unpack_from("<i", b, 18)[0]
                h = struct.unpack_from("<i", b, 22)[0]
                off = struct.unpack_from("<I", b, 10)[0]
                stride = (w * 3 + 3) // 4 * 4
                px = np.frombuffer(
                    b, dtype=np.uint8, count=stride * h, offset=off
                ).reshape(h, stride)
                yy = (np.arange(r) * h) // r
                xx = (np.arange(r) * w) // r
                # (r, r, 3) nearest-neighbor thumbnail, exact integers
                thumb = np.stack(
                    [px[y, xx * 3 + c].astype(np.int64) for y in yy for c in (0, 1, 2)]
                ).reshape(r, 3, r).transpose(0, 2, 1)
                sums = thumb.reshape(-1, 3).sum(axis=0)
                gray = thumb.sum(axis=2)  # b+g+r per cell
                pos = np.arange(1, r * r + 1).reshape(r, r)
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["rs_b"].append(int(sums[0]))
                out["rs_g"].append(int(sums[1]))
                out["rs_r"].append(int(sums[2]))
                out["pos_checksum"].append(int((gray * pos).sum()))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "width": "int32", "height": "int32",
                 "rs_b": "int64", "rs_g": "int64", "rs_r": "int64",
                 "pos_checksum": "int64"}
            )

    media = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return media.mapInPandas(
        resize,
        "doc_id bigint, width int, height int, rs_b bigint, rs_g bigint,"
        " rs_r bigint, pos_checksum bigint",
    )


IMAGE_RESIZE_SQL = f"""
WITH img AS (
  SELECT doc_id, CAST(1 + doc_id % 31 AS INT) AS w,
         CAST(1 + doc_id % 17 AS INT) AS h
  FROM documents WHERE doc_id % 2 = 0
), cells AS (
  SELECT doc_id, w, h, (w * 3 + 3) // 4 * 4 AS stride,
         unnest(generate_series(0, {RESIZE_GRID - 1})) AS ty
  FROM img
), grid AS (
  SELECT doc_id, w, h, stride, ty,
         unnest(generate_series(0, {RESIZE_GRID - 1})) AS tx
  FROM cells
), sampled AS (
  SELECT doc_id, w, h, ty, tx,
         (ty * h) // {RESIZE_GRID} AS yy,
         (tx * w) // {RESIZE_GRID} AS xx,
         stride
  FROM grid
), vals AS (
  SELECT doc_id, w, h, ty, tx,
         (doc_id * 31 + (yy * stride + xx * 3 + 0) * 7) % 251 AS b,
         (doc_id * 31 + (yy * stride + xx * 3 + 1) * 7) % 251 AS g,
         (doc_id * 31 + (yy * stride + xx * 3 + 2) * 7) % 251 AS r
  FROM sampled
)
SELECT doc_id, any_value(w) AS width, any_value(h) AS height,
       CAST(sum(b) AS BIGINT) AS rs_b,
       CAST(sum(g) AS BIGINT) AS rs_g,
       CAST(sum(r) AS BIGINT) AS rs_r,
       CAST(sum((b + g + r) * (ty * {RESIZE_GRID} + tx + 1)) AS BIGINT)
         AS pos_checksum
FROM vals GROUP BY doc_id
"""


# --- audio silence-run detection --------------------------------------------

SILENCE_THRESH = 4096  # |PCM-16 sample| below this counts as silence
SILENCE_SCHEMA = (
    "doc_id bigint, n_frames int, n_silent bigint, n_runs bigint,"
    " longest_run bigint"
)


def decode_wav_silence_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Silence segmentation from the PCM content: maximal runs of
    consecutive samples with |s| < SILENCE_THRESH — numpy run-length
    encoding over the decoded sample vector (edge-detect on the
    boolean mask; no per-sample Python). Integer outputs → value
    oracle."""
    import struct

    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            _, channels, _, _, block_align, _ = struct.unpack(
                "<HHIIHH", payload[20:36]
            )
            (data_len,) = struct.unpack("<I", payload[40:44])
            samples = np.frombuffer(
                payload[44 : 44 + data_len], dtype="<i2"
            ).astype(np.int64)
            silent = np.abs(samples) < SILENCE_THRESH
            if len(silent):
                edges = np.diff(silent.astype(np.int8))
                starts = int((edges == 1).sum()) + int(silent[0])
                # run lengths via split indices on the mask
                idx = np.flatnonzero(
                    np.diff(np.concatenate(([0], silent.view(np.int8), [0])))
                )
                lens = idx[1::2] - idx[0::2]
                longest = int(lens.max()) if len(lens) else 0
            else:
                starts, longest = 0, 0
            rows.append(
                (
                    int(doc_id),
                    data_len // block_align,
                    int(silent.sum()),
                    starts,
                    longest,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_frames", "n_silent", "n_runs", "longest_run"],
        )


def audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run detection over genuine WAV payloads — the audio
    segmentation primitive (VAD preprocessing / trailing-silence trim)
    a multimodal training pipeline runs before clipping or captioning:
    per clip, how many maximal silent runs the PCM contains, their
    longest length, and the total silent-sample count.

    Same codec seam and doc_id-parameterized bytes as
    `multimodal_audio_energy` (the kernel genuinely decodes PCM; the
    oracle reproduces the expected runs in closed form via SQL
    gaps-and-islands over the synthetic sample formula — agreement
    proves the run-length arithmetic end-to-end). Plan: synth kernel →
    silence kernel, chained MapInPandas in one stage, zero exchanges —
    payload bytes never cross the network."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 2 == 1
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_wav(8000 + d % 100, 1 + d % 2, d % 50, seed=d)
                for d in (int(x) for x in pdf["doc_id"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return media.mapInPandas(decode_wav_silence_batch, SILENCE_SCHEMA)


# same synthetic-byte formula as AUDIO_ENERGY_SQL; runs via the
# row_number gaps-and-islands trick over the unnested sample positions
AUDIO_SILENCE_SQL = f"""
WITH audio AS (
  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS n_channels,
         CAST(doc_id % 50 AS INT) AS n_frames
  FROM documents WHERE doc_id % 2 = 1),
pos AS (
  SELECT doc_id, n_frames, n_channels, unnest(
           range(0, n_frames * n_channels)) AS j
  FROM audio),
samp AS (
  SELECT doc_id, n_frames, n_channels, j,
         CASE WHEN (doc_id*17 + (2*j)*13) % 256
                   + 256 * ((doc_id*17 + (2*j+1)*13) % 256) >= 32768
              THEN (doc_id*17 + (2*j)*13) % 256
                   + 256 * ((doc_id*17 + (2*j+1)*13) % 256) - 65536
              ELSE (doc_id*17 + (2*j)*13) % 256
                   + 256 * ((doc_id*17 + (2*j+1)*13) % 256)
         END AS v
  FROM pos),
silent AS (
  SELECT doc_id, n_frames, j,
         j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS grp
  FROM samp WHERE abs(v) < {SILENCE_THRESH}),
runs AS (
  SELECT doc_id, grp, count(*) AS run_len
  FROM silent GROUP BY doc_id, grp),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         CAST(sum(run_len) AS BIGINT) AS n_silent,
         CAST(max(run_len) AS BIGINT) AS longest_run
  FROM runs GROUP BY doc_id)
SELECT a.doc_id, a.n_frames,
       coalesce(p.n_silent, 0) AS n_silent,
       coalesce(p.n_runs, 0) AS n_runs,
       coalesce(p.longest_run, 0) AS longest_run
FROM audio a LEFT JOIN per_doc p ON p.doc_id = a.doc_id
"""


QUERIES = {
    "multimodal_decode": multimodal_decode,
    "audio_silence_runs": audio_silence_runs,
    "multimodal_frame_sample": frame_sample,
    "multimodal_real_codec": multimodal_real_codec,
    "multimodal_audio_energy": multimodal_audio_energy,
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_image_resize": multimodal_image_resize,
    "image_phash_pairs": image_phash_pairs,
}

ORACLES = {
    "multimodal_decode": MULTIMODAL_SQL,
    "audio_silence_runs": AUDIO_SILENCE_SQL,
    "multimodal_frame_sample": FRAME_SAMPLE_SQL,
    "multimodal_real_codec": MULTIMODAL_REAL_SQL,
    "multimodal_audio_energy": AUDIO_ENERGY_SQL,
    "multimodal_image_stats": IMAGE_STATS_SQL,
    "multimodal_image_resize": IMAGE_RESIZE_SQL,
    "image_phash_pairs": PHASH_SQL,
}
