"""Property tests for the span-dedup primitives (pure-Python mirrors
of the Spark logic — the Spark↔DuckDB value parity is selfcheck's job;
these prove the ALGORITHMS are right on adversarial inputs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spec_search_spark.functions.text import FP_BASE, FP_MOD
from spec_search_spark.operators.span_dedup import COMBINE_B, K_WINDOW


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


def _rolling_fp(tokens: list[str], i: int) -> int:
    fp = _poly(tokens[i])
    for j in range(1, K_WINDOW):
        fp = (fp * COMBINE_B + _poly(tokens[i + j])) % FP_MOD
    return fp


def _merge_islands(positions: list[int], k: int) -> list[tuple[int, int]]:
    """The gaps-and-islands merge exactly as the Spark/SQL window
    computes it: new island when pos > prev_pos + k, span =
    [min_pos, max_pos + k - 1] per island."""
    spans: list[list[int]] = []
    prev = None
    for p in sorted(positions):
        if prev is None or p > prev + k:
            spans.append([p, p + k - 1])
        else:
            spans[-1][1] = p + k - 1
        prev = p
    return [(s, e) for s, e in spans]


def _merge_bruteforce(positions: list[int], k: int) -> list[tuple[int, int]]:
    """Ground truth: mark covered tokens, read off maximal runs."""
    covered = set()
    for p in positions:
        covered.update(range(p, p + k))
    spans, run = [], None
    for t in sorted(covered):
        if run and t == run[1] + 1:
            run = (run[0], t)
        else:
            if run:
                spans.append(run)
            run = (t, t)
    if run:
        spans.append(run)
    return spans


@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=60), max_size=25))
def test_islands_merge_equals_covered_token_runs(positions):
    got = _merge_islands(sorted(positions), K_WINDOW)
    want = _merge_bruteforce(sorted(positions), K_WINDOW)
    # equal-length windows: the pos > prev + K island rule fuses
    # exactly the overlap-or-adjacent cases, so merged spans must equal
    # the maximal runs of covered tokens — boundary for boundary
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=K_WINDOW,
        max_size=K_WINDOW,
    ),
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3),
        min_size=K_WINDOW,
        max_size=K_WINDOW,
    ),
)
def test_rolling_fp_separates_token_boundaries(a, b):
    # token-level combine: two windows collide only if the HASH chain
    # collides, never because token concatenation is ambiguous
    # ("ab","c" vs "a","bc")
    fa, fb = _rolling_fp(a, 0), _rolling_fp(b, 0)
    if a == b:
        assert fa == fb
    elif fa == fb:
        # permitted only as a genuine modular collision; astronomically
        # unlikely in this tiny strategy space — flag it if seen
        raise AssertionError(f"hash collision {a} vs {b}")


def test_bloom_positions_stable(spark):
    # probe/build symmetry: the SQL probe and the build-side Column
    # expressions must hash to the same positions (guards the INT-vs-
    # LONG seed-literal pitfall documented in runtime_filter.py)
    from pyspark.sql import functions as F

    from spec_search_spark.operators.runtime_filter import (
        M_BITS,
        SEEDS,
        _positions,
    )

    assert len(SEEDS) == len(set(SEEDS))
    assert M_BITS & (M_BITS - 1) == 0  # power of two
    cols = _positions(F.lit(12345).cast("long"))
    assert len(cols) == len(SEEDS)
