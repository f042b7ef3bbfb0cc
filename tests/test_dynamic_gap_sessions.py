"""Dynamic-gap session windows: pin Spark's merge/split boundary against
the running-max oracle formulation that stream_session_window_dynamic_gap
relies on (see its docstring proof that session ends are monotone).

The oracle splits iff ``us > max over previous (us + gap_us)`` — i.e. an
event arriving EXACTLY at the current session's horizon merges.  The
fixed-gap contract was probed empirically in round 4
(tests/test_streaming.py); the per-event gap changes which horizon
applies, so the boundary is re-probed here on adversarial shapes: exact-
gap successors whose gap comes from the *previous* event's type, ±1 us
around the horizon, and random mixes (hypothesis).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP_A_US = 2_000_000  # type 'a' holds the session open 2 s
GAP_B_US = 5_000_000  # type 'b' holds it open 5 s


def _reference_sessions(rows):
    """rows: [(us, type)] for ONE key, any order.  Returns the session
    partition as a sorted tuple of (start_us, close_us, n) using the
    running-max rule with merge-on-equal."""
    evs = sorted(rows)
    sessions = []
    horizon = None
    for us, t in evs:
        gap = GAP_A_US if t == "a" else GAP_B_US
        if horizon is None or us > horizon:
            sessions.append([us, us + gap, 1])
            horizon = us + gap
        else:
            sessions[-1][1] = max(sessions[-1][1], us + gap)
            sessions[-1][2] += 1
            horizon = max(horizon, us + gap)
    return tuple((s, e, n) for s, e, n in sessions)


def _spark_sessions(spark, rows):
    df = spark.createDataFrame(
        list(rows), "us long, t string"
    ).select(F.timestamp_micros(F.col("us")).alias("ts"), "t")
    gap = F.when(F.col("t") == "a", F.lit("2 seconds")).otherwise(
        F.lit("5 seconds")
    )
    out = (
        df.groupBy(F.session_window(F.col("ts"), gap))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("session_window.start")).alias("s"),
            F.unix_micros(F.col("session_window.end")).alias("e"),
            "n",
        )
        .collect()
    )
    return tuple(sorted((r.s, r.e, r.n) for r in out))


def test_exact_horizon_boundary_merges(spark):
    """An event exactly AT the previous event's horizon merges; 1 us past
    it splits — and the horizon comes from the PREVIOUS event's gap."""
    base = 1_000_000_000
    cases = [
        # 'a' then event exactly at +2s: merge
        [(base, "a"), (base + GAP_A_US, "b")],
        # 'a' then +2s+1us: split
        [(base, "a"), (base + GAP_A_US + 1, "b")],
        # 'b' then +5s (b's horizon, not a's): merge even though > 2s
        [(base, "b"), (base + GAP_B_US, "a")],
        # 'b' then +5s+1us: split
        [(base, "b"), (base + GAP_B_US + 1, "a")],
        # horizon extended by a middle 'b': third event merges via the
        # running MAX, not the immediately-previous event's end
        [(base, "b"), (base + 1_000_000, "a"),
         (base + GAP_B_US, "a")],
    ]
    for rows in cases:
        assert _spark_sessions(spark, rows) == _reference_sessions(rows), rows


_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20).map(
            lambda k: 1_000_000_000 + k * 1_000_000
        ),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@given(_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_mixes_match_running_max_rule(spark, rows):
    assert _spark_sessions(spark, rows) == _reference_sessions(rows)
