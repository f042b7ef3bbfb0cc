"""Property-based tests (hypothesis) for the operators whose correctness
is a STRUCTURAL invariant over arbitrary inputs, not a golden row — the
complement to the DuckDB oracle gates, which only ever see the driver's
synthetic distributions.

Example counts are deliberately small (each example runs Spark jobs);
the point is adversarial shapes (ties, empty groups, exact-boundary
gaps), which hypothesis shrinks toward, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP = 100

# (user_id, ts_seconds, value): few users, tight ts range so sessions
# split/merge often, ts multiples near the gap so EXACT-gap boundaries
# are generated (the sessionizer keeps diff == gap in-session).
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=GAP * 8),
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=25,
)


def _sessions_reference(rows, gap):
    """Pure-Python reference sessionizer: per-user sorted (ts, event_id)
    runs split where the gap is EXCEEDED (diff > gap)."""
    by_user: dict[int, list[tuple[int, int, float]]] = {}
    for eid, (uid, ts, val) in enumerate(rows):
        by_user.setdefault(uid, []).append((ts, eid, val))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, _eid, val in evs:
            if prev is None or ts - prev > gap:
                sid += 1
                out[(uid, sid)] = [ts, ts, 0, 0.0]
            s = out[(uid, sid)]
            s[0] = min(s[0], ts)
            s[1] = max(s[1], ts)
            s[2] += 1
            s[3] += val
            prev = ts
    return out


@given(_events)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_session_stats_matches_reference(spark, rows):
    """Batch sessionize == the obvious per-user Python fold, for arbitrary
    event sets including exact-gap ties and duplicate timestamps."""
    df = spark.createDataFrame(
        [
            (eid, ts * 10**6, uid, float(val))
            for eid, (uid, ts, val) in enumerate(rows)
        ],
        "event_id long, ts_us long, user_id long, value double",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "value",
    )
    from bigdatapipeline_steamreviews_spark.operators.analytic import session_stats

    got = {
        (r.user_id, r.session_id): (
            r.session_start_unix,
            r.session_end_unix,
            r.n_events,
        )
        for r in session_stats(df, gap_seconds=GAP).collect()
    }
    want = {
        k: (v[0], v[1], v[2]) for k, v in _sessions_reference(rows, GAP).items()
    }
    assert got == want


@given(_events)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_paragraph_dedup_invariants(spark, rows):
    """paragraph_dedup structural invariants for arbitrary corpora:
    every doc keeps 0 < n_kept <= n_spans; total kept == distinct spans
    corpus-wide; a document whose spans are all first-occurrences is
    reassembled verbatim."""
    # Tiny word alphabet so spans collide across documents often.
    docs = [
        (i, " ".join(f"w{(uid + ts + j) % 5}" for j in range(1 + ts % 7)))
        for i, (uid, ts, _val) in enumerate(rows)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from bigdatapipeline_steamreviews_spark.operators.dedup import (
        paragraph_dedup,
        paragraph_spans,
    )

    span_words = 3
    got = {r.doc_id: r for r in paragraph_dedup(df, span_words=span_words).collect()}
    spans = paragraph_spans(df, span_words=span_words).collect()
    n_distinct = len({r.h for r in spans})
    per_doc: dict[int, int] = {}
    for r in spans:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1

    assert set(got) == set(per_doc)
    assert sum(r.n_kept for r in got.values()) == n_distinct
    first_doc = min(d for d, _ in docs)
    for doc_id, text in docs:
        r = got[doc_id]
        assert 0 <= r.n_kept <= r.n_spans == per_doc[doc_id]
        if doc_id == first_doc:
            # The minimum doc id wins every tie it participates in, but it
            # can still lose spans to ITSELF (a span repeated within the
            # doc keeps only its first occurrence).
            own_distinct = len(
                {s.h for s in spans if s.doc_id == doc_id}
            )
            assert r.n_kept == own_distinct


# ---------------------------------------------------------------------------
# per_key_top_hash: two-phase pruning must equal the single global window
# for ANY data distribution, any k, any partitioning.
# ---------------------------------------------------------------------------

_keyed_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # few keys -> heavy groups
        st.integers(min_value=0, max_value=10**6),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_keyed_rows, k=st.integers(min_value=1, max_value=5))
def test_per_key_top_hash_equals_global_window(spark, rows, k):
    from pyspark.sql import Window

    from bigdatapipeline_steamreviews_spark.operators.quality import per_key_top_hash

    # Duplicate ids across keys are fine; dedup within (key, id) keeps the
    # reference's row_number deterministic.
    rows = list({(key, i) for key, i in rows})
    df = spark.createDataFrame(rows, "k int, id long").repartition(5)
    order = [F.md5(F.col("id").cast("string")), F.col("id")]
    got = sorted(
        map(tuple, per_key_top_hash(df, ["k"], order, k, rank_name="rn").collect())
    )
    w = Window.partitionBy("k").orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# sliding_distinct_count: explode-form must equal a brute-force reference
# for ANY day/user pattern (gaps, duplicates, single-day spikes).
# ---------------------------------------------------------------------------

_day_user = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # day offset
        st.integers(min_value=1, max_value=5),   # user
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_day_user, window_days=st.integers(min_value=1, max_value=8))
def test_sliding_distinct_count_matches_bruteforce(spark, rows, window_days):
    import datetime

    from bigdatapipeline_steamreviews_spark.operators.quality import (
        sliding_distinct_count,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (base + datetime.timedelta(days=d, hours=u), u) for d, u in rows
    ]
    df = spark.createDataFrame(data, "ts timestamp, user_id long")
    got = {
        r["win_end"].date(): r["n"]
        for r in sliding_distinct_count(df, "ts", "user_id", window_days, "n").collect()
    }
    days = {base.date() + datetime.timedelta(days=d) for d, _ in rows}
    want = {
        day: len(
            {
                u
                for d, u in rows
                if 0 <= (day - (base.date() + datetime.timedelta(days=d))).days
                < window_days
            }
        )
        for day in days
    }
    assert got == want
