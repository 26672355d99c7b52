"""Vector functions: distances as Catalyst higher-order-function
expressions, plus a deterministic embedding pandas_udf.

The reference delegates both to ChromaDB (L2 over HNSW, implicit
MiniLM embedding — `/root/reference/app.py:50-52`, `:35-36`). Here:

- distances are pure SQL higher-order functions (``zip_with`` +
  ``aggregate``) → JVM-side, whole-stage-codegen'd, no Python in the
  hot path. Elements are cast to double FIRST so Spark and the DuckDB
  oracle fold the identical IEEE sequence.
- the embedder is a seeded hash-projection (SURVEY.md §7 "embedding
  determinism"): dependency-free, stable across runs/processes, unit
  norm, fixed dim. It is the documented swap point for a real model
  (sentence-transformers via the same pandas_udf signature). Runs as an
  Arrow-batched pandas_udf — the scalable path for any real model too.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64  # matches the test `embeddings` table; reference uses 384


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_squared(a: Column, b: Column) -> Column:
    """Σ (a_i - b_i)² via zip_with+aggregate (codegen'd, no UDF)."""
    diffs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(l2_squared(a, b))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


# ---------------------------------------------------------------------------
# DuckDB-side oracle builders: the same left-to-right fold, so both engines
# produce bit-identical doubles (modulo final rounding in the queries).
# ---------------------------------------------------------------------------

def l2_squared_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), z -> "
        f"(z[1]::DOUBLE - z[2]::DOUBLE) * (z[1]::DOUBLE - z[2]::DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), z -> z[1]::DOUBLE * z[2]::DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def cosine_similarity_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)}) / "
        f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"
    )


# ---------------------------------------------------------------------------
# Deterministic hash-projection embedder (the MiniLM stand-in).
# ---------------------------------------------------------------------------

def _embed_text(text: str, dim: int) -> np.ndarray:
    """Feature-hash unigrams into `dim` buckets with ±1 signs, L2-normalize.

    blake2b keyed digests → no PYTHONHASHSEED dependence; same text →
    same vector on every worker, every run.
    """
    vec = np.zeros(dim, dtype=np.float64)
    if text:
        for tok in text.lower().split():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
            )
            idx = h % dim
            sign = 1.0 if (h >> 32) & 1 else -1.0
            vec[idx] += sign
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def make_embed_udf(dim: int = DEFAULT_DIM):
    """Arrow-batched pandas_udf: text column → array<float> embedding."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _embed_text(t if isinstance(t, str) else "", dim))

    return embed


def embed_text_local(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side helper for probe vectors (same function as the UDF)."""
    return [float(x) for x in _embed_text(text, dim)]
