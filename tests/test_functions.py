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


# --- lossless-blocking properties (pure Python, no Spark) -------------------


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=14),
        min_size=2,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_fuzzy_qgram_blocking_is_lossless(names):
    """Every pair within EDIT_D must be admitted by the candidate rule
    used in operators.fuzzy (shared q-gram with position shift <= d and
    count >= the Gravano bound, OR both strings short): a pair the
    blocking drops while levenshtein says <= d would be a silent
    correctness hole."""
    from spec_search_spark.operators.fuzzy import EDIT_D, QGRAM, SHORT_LEN

    def grams(s):
        n = max(len(s) - QGRAM + 1, 1)
        return [(i, s[i : i + QGRAM]) for i in range(n)]

    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if abs(len(a) - len(b)) > EDIT_D:
                continue
            if _levenshtein(a, b) > EDIT_D:
                continue
            # the pair qualifies — the blocking must admit it
            if max(len(a), len(b)) <= SHORT_LEN:
                continue  # short-string block admits it
            matched = sum(
                1
                for pa, ga in grams(a)
                for pb, gb in grams(b)
                if ga == gb and abs(pa - pb) <= EDIT_D
            )
            bound = max(len(a), len(b)) - (QGRAM - 1) - QGRAM * EDIT_D
            assert matched >= max(bound, 1), (a, b, matched, bound)


@given(st.integers(min_value=1, max_value=10_000))
@settings(max_examples=300, deadline=None)
def test_jaccard_prefix_len_matches_exact_rational_ceil(n):
    """The SQL integer form of |x| - ceil(t*|x|) + 1 must equal the
    exact Fraction computation for every set size."""
    import math
    from fractions import Fraction

    from spec_search_spark.operators.dedup import JACCARD_STRICT_THRESHOLD

    frac = Fraction(str(JACCARD_STRICT_THRESHOLD))
    num, den = frac.numerator, frac.denominator
    sql_form = n - ((num * n + den - 1) // den) + 1
    exact = n - math.ceil(frac * n) + 1
    assert sql_form == exact
