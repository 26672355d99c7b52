"""Text functions: chunking, token stats, language guess, quality
score, rolling-hash fingerprint.

Reference: chunking is LangChain's RecursiveCharacterTextSplitter with
chunk_size=1000, overlap=200 (`/root/reference/indexer.py:62-66,39`).
Two implementations here:

- :func:`chunk_fixed_expr` — fixed-stride windowed chunking as a pure
  Catalyst expression (``sequence`` + ``explode`` + ``substring``).
  JVM-side, codegen'd, and SQL-expressible → has a DuckDB oracle.
- :func:`split_text_recursive` — a from-scratch recursive splitter with
  the reference's separator-fallback semantics (paragraph → line →
  word → char), exposed as a plain-Python UDF and property-tested
  (chunks ≤ size; coverage; overlap), per SURVEY.md §5. Not
  byte-compatible with LangChain by design.

Everything else is built-in-function compositions shared (regex-for-
regex) with the DuckDB oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CHUNK_SIZE = 1000  # indexer.py:63
DEFAULT_OVERLAP = 200      # indexer.py:64
SEPARATORS = ["\n\n", "\n", " ", ""]  # LangChain defaults, indexer.py:62-66


# ---------------------------------------------------------------------------
# Fixed-stride chunking (expression form; oracle-able)
# ---------------------------------------------------------------------------

def chunk_indices(text: Column, size: int, overlap: int) -> Column:
    """0..n_chunks-1 where chunks start every (size-overlap) chars."""
    stride = size - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(text) - F.lit(overlap)).cast("double") / F.lit(stride)).cast("int"),
    )
    return F.sequence(F.lit(0), n - 1)


def chunk_at(text: Column, idx: Column, size: int, overlap: int) -> Column:
    stride = size - overlap
    return F.substring(text, idx * stride + 1, size)


def chunk_fixed_sql(size: int, overlap: int) -> dict[str, str]:
    """DuckDB fragments mirroring chunk_indices/chunk_at exactly."""
    stride = size - overlap
    return {
        "n_chunks": (
            f"greatest(1, CAST(ceil((length(text) - {overlap})::DOUBLE / {stride}) AS INT))"
        ),
        "chunk": f"substring(text, i * {stride} + 1, {size})",
    }


# ---------------------------------------------------------------------------
# Recursive splitter (UDF form; property-tested)
# ---------------------------------------------------------------------------

def _merge_splits(parts: list[str], sep: str, size: int, overlap: int) -> list[str]:
    """Greedily pack splits into ≤size chunks, carrying `overlap` chars
    of tail context into the next chunk."""
    chunks: list[str] = []
    cur = ""
    for p in parts:
        cand = (cur + sep + p) if cur else p
        if cur and len(cand) > size:
            chunks.append(cur)
            tail = cur[-overlap:] if overlap > 0 else ""
            cur = (tail + sep + p) if tail else p
            if len(cur) > size:  # overlap carry would overflow: drop it
                cur = p
        else:
            cur = cand
    if cur:
        chunks.append(cur)
    return chunks


def split_text_recursive(
    text: str,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive character splitting with separator fallback.

    Split on the coarsest separator that appears; recursively re-split
    any piece still longer than `size` with the next-finer separator;
    finally hard-wrap at the character level with overlap. Then greedily
    merge adjacent small pieces back up to `size` with `overlap` carry.
    """
    if text is None:
        return []
    if len(text) <= size:
        return [text] if text else []
    seps = SEPARATORS if separators is None else separators

    def recurse(t: str, seps_left: list[str]) -> list[str]:
        if len(t) <= size:
            return [t]
        if not seps_left or seps_left[0] == "":
            stride = size - overlap
            return [t[i : i + size] for i in range(0, max(len(t) - overlap, 1), stride)]
        sep, rest = seps_left[0], seps_left[1:]
        if sep not in t:
            return recurse(t, rest)
        pieces: list[str] = []
        for part in t.split(sep):
            if len(part) > size:
                pieces.extend(recurse(part, rest))
            else:
                pieces.append(part)
        return _merge_splits(pieces, sep, size, overlap)

    return [c for c in recurse(text, seps) if c]


def make_chunk_udf(size: int = DEFAULT_CHUNK_SIZE, overlap: int = DEFAULT_OVERLAP):
    """Arrow-batched pandas_udf: text → array<string> of chunks (use
    with F.posexplode). The splitter itself is per-string Python (its
    recursion doesn't vectorize), but Arrow batching removes the
    per-row pickle round-trip a plain F.udf pays — this was the last
    row-at-a-time UDF in the package."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def chunk(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: split_text_recursive(t if isinstance(t, str) else "", size, overlap)
        )

    return chunk


# ---------------------------------------------------------------------------
# Token / quality / language / fingerprint expressions (shared with oracles)
# ---------------------------------------------------------------------------

RE_TOKEN_SPLIT = r"\s+"
# marker-word lists for the n-gram-free language heuristic; scoring is
# count of marker hits per language, argmax with fixed precedence.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break precedence

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

FP_BASE = 31
FP_MOD = 2147483647  # 2^31 - 1


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, RE_TOKEN_SPLIT)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of `word` as a whole word (case-insensitive)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(rf"\b{word}\b"), F.lit(0)))


def lang_score(text: Column, lang: str) -> Column:
    c = F.lit(0)
    for w in LANG_MARKERS[lang]:
        c = c + _count_word(text, w)
    return c


def lang_guess(text: Column) -> Column:
    """Argmax of marker-hit counts with LANG_ORDER precedence; 'und' if 0."""
    scores = {lg: lang_score(text, lg) for lg in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lg in reversed(LANG_ORDER):  # earlier langs win ties → applied last
        out = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(out)
    return out


def lang_guess_sql(expr: str) -> str:
    def score(lg: str) -> str:
        parts = [
            f"len(regexp_extract_all(lower({expr}), '\\b{w}\\b'))"
            for w in LANG_MARKERS[lg]
        ]
        return "(" + " + ".join(parts) + ")"

    scores = {lg: score(lg) for lg in LANG_ORDER}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = "".join(
        f" WHEN {scores[lg]} = __best THEN '{lg}'" for lg in LANG_ORDER
    )
    return (
        f"(SELECT CASE WHEN __best = 0 THEN 'und'{cases} ELSE 'und' END "
        f"FROM (SELECT {best} AS __best))"
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length component, alpha ratio,
    stopword-hit ratio. Pure arithmetic → identical in the oracle."""
    n = F.length(text).cast("double")
    len_c = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]"), F.lit(0))).cast("double")
    alpha_c = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    stop_hits = F.lit(0)
    for w in STOPWORDS:
        stop_hits = stop_hits + _count_word(text, w)
    ntok = token_count(text).cast("double")
    stop_c = F.when(ntok > 0, F.least(stop_hits.cast("double") / ntok, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    return F.round((len_c + alpha_c + stop_c) / F.lit(3.0), 4)


def quality_score_sql(expr: str) -> str:
    stop_hits = " + ".join(
        f"len(regexp_extract_all(lower({expr}), '\\b{w}\\b'))" for w in STOPWORDS
    )
    ntok = f"CASE WHEN trim({expr}) = '' THEN 0 ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END"
    return f"""round((
      least(length({expr})::DOUBLE / 500.0, 1.0)
      + CASE WHEN length({expr}) > 0
             THEN len(regexp_extract_all({expr}, '[A-Za-z]'))::DOUBLE / length({expr})
             ELSE 0.0 END
      + CASE WHEN ({ntok}) > 0
             THEN least(({stop_hits})::DOUBLE / ({ntok}), 1.0)
             ELSE 0.0 END
    ) / 3.0, 4)"""


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over code points: fold(acc*31+cp mod 2³¹-1).

    Order-sensitive document fingerprint (exact-dup detection key that
    is cheap to compare/shuffle at 100 TB: 8 bytes instead of full
    text). Pure higher-order-function fold — no UDF.
    """
    cps = F.transform(F.regexp_extract_all(text, F.lit(r"[\s\S]"), F.lit(0)), F.ascii)
    return F.aggregate(
        cps,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * FP_BASE + c.cast("bigint")) % FP_MOD,
    )


def poly_hash_batch(strs: list):
    """Batched polynomial fold: list of strings → int64 ndarray of the
    SAME hash as :func:`fingerprint`. Vectorized across the batch —
    iterate positions (≤ max_len), not strings; each step is a numpy
    op over the whole batch. ASCII inputs take the fast path (utf-8
    bytes == code points); any non-ASCII string drops the whole batch
    to the per-codepoint ord loop (identical values either way)."""
    import numpy as np

    n = len(strs)
    enc = [s.encode("utf-8") if isinstance(s, str) else b"" for s in strs]
    if any(len(b) != len(s) for b, s in zip(enc, strs) if isinstance(s, str)):
        out = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(strs):
            acc = 0
            for ch in s if isinstance(s, str) else "":
                acc = (acc * FP_BASE + ord(ch)) % FP_MOD
            out[i] = acc
        return out
    maxlen = max((len(b) for b in enc), default=0)
    acc = np.zeros(n, dtype=np.int64)
    if maxlen:
        mat = np.zeros((n, maxlen), dtype=np.int64)
        mask = np.zeros((n, maxlen), dtype=bool)
        for i, b in enumerate(enc):
            if b:
                arr = np.frombuffer(b, dtype=np.uint8)
                mat[i, : len(b)] = arr
                mask[i, : len(b)] = True
        for j in range(maxlen):
            live = mask[:, j]
            acc[live] = (acc[live] * FP_BASE + mat[live, j]) % FP_MOD
    return acc


def make_poly_hash_udf():
    """Arrow-batched pandas_udf over :func:`poly_hash_batch` (identical
    bigint for identical input), ~50× faster than the per-char
    expression fold on hot paths (measured: dedup pack at sf0.1). The
    expression form stays available where a pure-Catalyst plan is
    preferred; both hash identically so the DuckDB oracles don't care
    which side produced the value."""

    @F.pandas_udf(T.LongType())
    def poly_hash(s: pd.Series) -> pd.Series:
        return pd.Series(poly_hash_batch(s.tolist()), index=s.index)

    return poly_hash


def fingerprint_sql(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(regexp_extract_all({expr}, '[\\s\\S]'), c -> ord(c)::BIGINT)), "
        f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})"
    )
