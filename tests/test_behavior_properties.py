"""Property tests for the behavioral-analytics primitives (pure-Python
mirrors of the Spark logic — Spark↔DuckDB value parity is selfcheck's
job; these prove the ALGORITHMS and the documented scale identities on
adversarial inputs)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spec_search_spark.operators.behavior import EWMA_ALPHA


def _ewma(vals: list[float], seed: float | None = None) -> float | None:
    if seed is None:
        if not vals:
            return None
        acc, rest = vals[0], vals[1:]
    else:
        acc, rest = seed, vals
    for x in rest:
        acc = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
    return acc


@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=60),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=200)
def test_ewma_segment_stitching_identity(vals, cut):
    """SCALE.md's 100 TB claim: ewma(a ∥ b) == fold(b, seed=ewma(a)) —
    segment folds stitched with the decay identity are EXACTLY the
    one-pass fold, bit for bit (same operations in the same order)."""
    cut = min(cut, len(vals))
    a, b = vals[:cut], vals[cut:]
    whole = _ewma(vals)
    if not a:
        assert _ewma(b) == whole
    else:
        assert _ewma(b, seed=_ewma(a)) == whole


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=60))
@settings(max_examples=200)
def test_ewma_stays_in_hull_property(vals):
    got = _ewma(vals)
    assert min(vals) - 1e-9 <= got <= max(vals) + 1e-9


def _streaks(days: set[int]) -> list[int]:
    """Reference implementation: lengths of maximal consecutive runs."""
    lengths = []
    ordered = sorted(days)
    i = 0
    while i < len(ordered):
        j = i
        while j + 1 < len(ordered) and ordered[j + 1] == ordered[j] + 1:
            j += 1
        lengths.append(j - i + 1)
        i = j + 1
    return lengths


@given(st.sets(st.integers(min_value=0, max_value=200), min_size=1, max_size=80))
@settings(max_examples=300)
def test_islands_formula_equals_reference(days):
    """day_number − row_number is constant exactly within a maximal
    consecutive run: grouping by it yields the reference streaks."""
    ordered = sorted(days)
    groups: dict[int, int] = {}
    for rn, d in enumerate(ordered, start=1):
        key = d - rn
        groups[key] = groups.get(key, 0) + 1
    assert sorted(groups.values()) == sorted(_streaks(days))
    # totals always reconcile: every active day is in exactly one island
    assert sum(groups.values()) == len(days)


def _attribute(events: list[tuple[str, float]]) -> list[tuple[str, float]]:
    """Reference last-touch attribution over an ordered event list."""
    out, last = [], None
    for etype, value in events:
        if etype == "purchase":
            out.append((last if last is not None else "direct", value))
        else:
            last = etype
    return out


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.floats(0, 100, allow_nan=False),
        ),
        max_size=60,
    ),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=200)
def test_stream_attribution_kernel_matches_reference_across_batch_cuts(
    events, cut
):
    """The streaming kernel's shift+ffill vectorization equals the
    reference loop, for EVERY micro-batch boundary placement (the
    exactly-once-across-batches claim)."""
    import pandas as pd

    from spec_search_spark.streaming.stateful import _attribute_purchases

    cut = min(cut, len(events))

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = (None,)

        def update(self, v):
            self.exists = True
            self.get = v

    def run(batches):
        state = FakeState()
        out = []
        for batch in batches:
            if not batch:
                continue
            pdf = pd.DataFrame(
                {
                    "ts": range(len(out_ts), len(out_ts) + len(batch)),
                    "event_id": range(len(out_ts), len(out_ts) + len(batch)),
                    "event_type": [e[0] for e in batch],
                    "value": [e[1] for e in batch],
                }
            )
            out_ts.extend([None] * len(batch))
            for res in _attribute_purchases((1,), iter([pdf]), state):
                out.extend(zip(res["channel"], res["value"]))
        return out

    out_ts: list = []
    got = run([events[:cut], events[cut:]])
    want = _attribute(events)
    assert [(c, round(v, 9)) for c, v in got] == [
        (c, round(v, 9)) for c, v in want
    ]
