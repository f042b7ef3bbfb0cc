"""Property test for the round-6 sharpened sweep-line contract
(operators/analytic.py::interval_peak_concurrency): per-day peak is the
SUSTAINED maximum — each event also exposes its pre-delta level, so a day
opening on an end reports the carry-in plateau — and delta-free days
inside open intervals are emitted from the day spine with
``peak = carry_in``.  The reference is the naive global sweep evaluated
instant-by-instant, which is what the plain-English contract means.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

D = 10  # shrunken "day" length: the operator hard-codes 86400-second
# days, so timestamps are drawn in units of 8640 s (day = 10 units)
U = 8640

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=49),  # start unit
        st.integers(min_value=1, max_value=35),  # duration units
    ),
    min_size=1,
    max_size=12,
)


def _reference(intervals):
    """Instant-by-instant truth: concurrency level between consecutive
    event instants; a day's peak is the max level over every instant the
    day contains while anything is active or changing (starts touch ends
    at equal instants — the operator's d DESC tie rule)."""
    deltas = sorted(
        [(s, 1, i) for i, (s, e) in enumerate(intervals)]
        + [(e, -1, i) for i, (s, e) in enumerate(intervals)],
        key=lambda x: (x[0], -x[1], x[2]),
    )
    best: dict[int, int] = {}
    changes: dict[int, int] = {}
    c = 0
    for t, d, _ in deltas:
        day = t // (D * U) * (D * U)
        # pre-delta level (the plateau held walking into this event) and
        # post-delta level are both peak candidates for the event's day
        best[day] = max(best.get(day, -(10**9)), c, c + d)
        changes[day] = changes.get(day, 0) + 1
        c += d
    # delta-free days between the first and last event day carry the
    # running level if it is nonzero
    expected = {day: (best[day], changes[day]) for day in best}
    carry = 0
    for day in range(min(best), max(best) + D * U, D * U):
        if day not in changes and carry > 0:
            expected[day] = (carry, 0)
        carry += sum(d for t, d, _ in deltas if t // (D * U) * (D * U) == day)
    return expected


@given(_intervals)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_peak_concurrency_matches_instantwise_sweep(spark, intervals):
    from bigdatapipeline_steamreviews_spark.operators.analytic import (
        interval_peak_concurrency,
    )

    rows = [
        (i, s * U, (s + dur) * U) for i, (s, dur) in enumerate(intervals)
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.day_unix: (r.peak_concurrency, r.n_changes)
        for r in interval_peak_concurrency(
            df, "s", "e", tiebreak_cols=("k",)
        ).collect()
    }
    assert got == _reference([(s * U, (s + dur) * U) for s, dur in intervals])
