"""Unit/property tests for the pure functions (chunker, embedder, A1,
type sniffing) — the test strategy SURVEY.md §5 prescribes for the
non-SQL-expressible pieces."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spec_search_spark.functions.text import split_text_recursive
from spec_search_spark.functions.vector import embed_text_local


# --- recursive chunker properties (reference params indexer.py:62-66) ------

TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " \n.,!?",
    min_size=0,
    max_size=5000,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_chunks_within_size(text):
    for c in split_text_recursive(text, size=1000, overlap=200):
        assert 0 < len(c) <= 1000


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_chunks_cover_content(text):
    """Every non-separator character sequence survives chunking:
    concatenated chunks contain the original text's non-whitespace
    characters in order (overlap may duplicate, never drop)."""
    chunks = split_text_recursive(text, size=1000, overlap=200)
    if not text:
        assert chunks == []
        return
    joined = "".join(chunks)
    orig = "".join(text.split())
    # subsequence check: every non-ws char of the original appears in
    # order in the concatenation
    it = iter(joined)
    assert all(ch in it for ch in orig)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_short_text_single_chunk(text):
    if 0 < len(text) <= 1000:
        assert split_text_recursive(text, size=1000, overlap=200) == [text]


def test_chunker_prefers_paragraph_boundaries():
    text = "para one is here.\n\n" + "word " * 300 + "\n\nlast para."
    chunks = split_text_recursive(text, size=200, overlap=50)
    assert all(len(c) <= 200 for c in chunks)
    assert chunks[0].startswith("para one")


# --- embedder ---------------------------------------------------------------

def test_embed_deterministic_and_unit_norm():
    a = embed_text_local("the quick brown fox", 64)
    b = embed_text_local("the quick brown fox", 64)
    assert a == b
    assert len(a) == 64
    n = sum(x * x for x in a) ** 0.5
    assert abs(n - 1.0) < 1e-5


def test_embed_distinguishes_texts():
    a = embed_text_local("alpha beta gamma", 64)
    b = embed_text_local("delta epsilon zeta", 64)
    assert a != b


def test_embed_empty_is_zero():
    assert all(x == 0.0 for x in embed_text_local("", 64))


# --- A1 letters & type sniffing (need Spark) --------------------------------

@pytest.mark.parametrize(
    "idx,expected",
    [(0, "A"), (1, "B"), (25, "Z"), (26, "AA"), (27, "AB"), (51, "AZ"), (52, "BA"), (701, "ZZ")],
)
def test_a1_letter_correct_base26(spark, idx, expected):
    from pyspark.sql import functions as F

    from spec_search_spark.functions.sheets import a1_letter

    row = spark.range(1).select(a1_letter(F.lit(idx)).alias("a1")).first()
    assert row["a1"] == expected, f"idx {idx}"


@pytest.mark.parametrize(
    "value,expected",
    [
        ("42", "integer"),
        ("-7", "integer"),
        ("3.14", "float"),
        ("1.0E-7", "float"),
        ("true", "boolean"),
        ("No", "boolean"),
        ("2023-05-12", "date"),
        ("12/5/2023", "date"),
        ("hello", "string"),
        ("12 monkeys", "string"),
    ],
)
def test_sniff_type(spark, value, expected):
    from pyspark.sql import functions as F

    from spec_search_spark.functions.sheets import sniff_type

    row = spark.range(1).select(sniff_type(F.lit(value)).alias("t")).first()
    assert row["t"] == expected, value
