"""Hand-computed semantics tests for the second round-5 addition batch:
the two-phase Pareto frontier (skyline), last-touch attribution, market-
basket lift, the XOR table checksum, and the key-skew report.

The oracle sweep proves engine-vs-engine parity on the synthetic tables;
these pin the INTENDED semantics on tiny literal inputs — including the
skyline's dominance edge cases (ties on one or both axes) that the
synthetic data may never exercise.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.analytic import (
    pareto_frontier_2d,
)


def _brute_frontier(rows):
    """O(n^2) reference skyline: minimize cost, maximize gain."""
    out = []
    for k, c, g in rows:
        dominated = any(
            (qc <= c and qg >= g and (qc < c or qg > g))
            for _, qc, qg in rows
        )
        if not dominated:
            out.append((k, c, g))
    return sorted(out, key=lambda r: (r[1], r[0]))


def test_pareto_frontier_matches_brute_force(spark):
    # Includes: equal-cost ties (only max gain survives), exact duplicates
    # (BOTH survive: neither dominates the other), a point dominated only
    # by a same-bucket neighbor (phase 2 must catch what phase 1 cannot),
    # and a cross-bucket domination (phase 1 prune).
    rows = [
        (1, 10.0, 5),
        (2, 10.0, 9),   # same cost as 1, larger gain -> dominates 1
        (3, 10.5, 9),   # same bucket as 1/2 (width 1), dominated by 2
        (4, 11.0, 9),   # cheaper point 2 has equal gain -> dominated
        (5, 12.0, 12),
        (6, 12.0, 12),  # exact duplicate of 5 -> both on frontier
        (7, 25.0, 11),  # far bucket, dominated by 5 via bucket prune
        (8, 30.0, 13),
    ]
    df = spark.createDataFrame(rows, "k long, cost double, gain long")
    got = [
        (r.k, r.cost, r.gain)
        for r in pareto_frontier_2d(
            df, "cost", "gain", "k", bucket_width=1.0
        ).collect()
    ]
    assert got == _brute_frontier(rows)


def test_pareto_frontier_randomized_vs_brute_force(spark):
    # Deterministic pseudo-random grid: collisions on both axes guaranteed.
    rows = [
        (i, float(5 + (i * 7) % 13) / 2.0, (i * 11) % 7)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k long, cost double, gain long")
    got = [
        (r.k, r.cost, r.gain)
        for r in pareto_frontier_2d(
            df, "cost", "gain", "k", bucket_width=1.0
        ).collect()
    ]
    assert got == _brute_frontier(rows)


def test_checksum_is_order_and_partitioning_independent(spark):
    """bit_xor folding must give the identical checksum for the same row
    set under any row order / partition count — the property that makes it
    a valid cross-replica reconciliation fingerprint."""
    serial = F.concat_ws("|", F.col("id").cast("string"), F.col("v"))
    rh = F.conv(F.substring(F.md5(serial), 1, 15), 16, 10).cast("long")

    def checksum(df):
        return (
            df.select(rh.alias("h"))
            .agg(F.expr("bit_xor(h)").alias("c"))
            .collect()[0]["c"]
        )

    rows = [(i, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id long, v string").repartition(1)
    b = spark.createDataFrame(rows[::-1], "id long, v string").repartition(13)
    assert checksum(a) == checksum(b)
    # and it detects a single changed row
    c = spark.createDataFrame(
        rows[:-1] + [(99, "CHANGED")], "id long, v string"
    )
    assert checksum(a) != checksum(c)


def test_basket_pair_counts_by_hand(spark):
    """Orders {A,B,C}, {A,B}, {B,C}, {A} -> pair supports AB=2 BC=2 AC=1;
    lift(AB) = n * c(AB) / (c(A) c(B)) = 4*2/(3*3)."""
    li = spark.createDataFrame(
        [
            (1, "A"), (1, "B"), (1, "C"),
            (2, "A"), (2, "B"), (2, "A"),  # dup line must not double-count
            (3, "B"), (3, "C"),
            (4, "A"),
        ],
        "l_orderkey long, l_partkey string",
    )
    items = li.distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .count()
    )
    got = {(r.pa, r.pb): r["count"] for r in pairs.collect()}
    assert got == {("A", "B"): 2, ("B", "C"): 2, ("A", "C"): 1}


def test_as_of_join_forward_hand_case(spark):
    """Forward as-of: each left row picks the SMALLEST right_ts >= left_ts;
    a right row at exactly left_ts must match (>= semantics)."""
    from bigdatapipeline_steamreviews_spark.operators.analytic import as_of_join

    left = spark.createDataFrame(
        [(1, 5), (1, 9), (1, 20), (2, 1)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 9, "b"), (1, 12, "c"), (2, 100, "z")],
        "k long, rts long, v string",
    )
    out = as_of_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        carry_cols=["v"], direction="forward",
    )
    got = {(r.k, r.lts): r.v for r in out.collect()}
    assert got == {(1, 5): "a", (1, 9): "b", (1, 20): None, (2, 1): "z"}


def test_equi_depth_boundaries_match_global_sort(spark):
    """Multi-rank two-phase selection must equal row_number() global-sort
    nearest-rank boundaries — including several ranks landing in the SAME
    cell, duplicates straddling a boundary, and the degenerate
    all-equal-values branch."""
    from bigdatapipeline_steamreviews_spark.operators.selection import (
        equi_depth_boundaries,
    )

    vals = [float(v) for v in [5, 5, 5, 7, 8, 8, 9, 12, 50, 50, 50, 51]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.i: r.boundary
        for r in equi_depth_boundaries(df, "x", n_out=4, n_cells=4).collect()
    }
    n = len(vals)
    s = sorted(vals)
    want = {i: s[(i * n + 3) // 4 - 1] for i in (1, 2, 3)}
    assert got == want

    const = spark.createDataFrame([(3.0,)] * 7, "x double")
    got_c = {
        r.i: r.boundary
        for r in equi_depth_boundaries(const, "x", n_out=4).collect()
    }
    assert got_c == {1: 3.0, 2: 3.0, 3: 3.0}


def test_interval_peak_concurrency_hand_case(spark):
    """Sweep-line decomposition: intervals spanning the day boundary must
    carry into the next day's base (carry-in), starts beat ends at equal
    timestamps, a day opening on an END still reports its carry-in
    plateau (pre-delta of the first event), delta-free days inside a
    long open interval are emitted with peak = carry_in, and the
    brute-force global running sum is the truth."""
    from bigdatapipeline_steamreviews_spark.operators.analytic import (
        interval_peak_concurrency,
    )

    D = 86400
    # (key, start, end): two overlapping on day 0, one spanning midnight,
    # one starting exactly when another ends (must overlap at the instant),
    # one entirely inside day 1 while the spanner is still open, one long
    # interval spanning days 2..5 (days 3 and 4 have NO deltas -> spine
    # emission), whose end is day 5's ONLY event (pre-delta plateau 1).
    iv = [
        (1, 100, 200),
        (2, 150, 300),              # overlaps 1 -> peak 2 on day 0
        (3, D - 50, D + 500),       # spans midnight (carry-in 1 into day 1)
        (4, 300, 400),              # starts exactly at 2's end -> overlap
        (5, D + 100, D + 200),      # inside day 1 while 3 open -> peak 2
        (6, 2 * D + 100, 5 * D + 100),  # days 3,4 delta-free; ends day 5
    ]
    df = spark.createDataFrame(iv, "k long, s long, e long")
    got = {
        r.day_unix: (r.peak_concurrency, r.n_changes)
        for r in interval_peak_concurrency(
            df, "s", "e", tiebreak_cols=("k",)
        ).collect()
    }
    # Brute force: global sweep; each event also exposes its pre-delta
    # level, so a day's carry-in plateau is a peak candidate.
    deltas = sorted(
        [(s, 1, k) for k, s, e in iv] + [(e, -1, k) for k, s, e in iv],
        key=lambda x: (x[0], -x[1], x[2]),
    )
    c, best, changes = 0, {}, {}
    for t, d, _ in deltas:
        day = (t // D) * D
        best[day] = max(best.get(day, -10**9), c, c + d)
        changes[day] = changes.get(day, 0) + 1
        c += d
    expected = {day: (best[day], changes[day]) for day in best}
    # Delta-free days between min and max event day with nonzero carry:
    carry, prev = 0, {}
    for day in range(min(best), max(best) + D, D):
        if day not in changes and carry > 0:
            expected[day] = (carry, 0)
        carry += sum(d for t, d, _ in deltas if (t // D) * D == day)
    assert got == expected
    # The scenario exercises every clause: day 5 opens on an end (plateau
    # 1 reported with a single -1 event), days 3 and 4 are spine rows.
    assert got[5 * D] == (1, 1)
    assert got[3 * D] == (1, 0) and got[4 * D] == (1, 0)


def test_interval_peak_concurrency_drops_null_bounds(spark):
    """NULL contract: a half-NULL interval is dropped, not swept — its
    unbalanced delta would corrupt carry_in for every later day (r6
    advice).  Result must equal the same input minus the NULL rows."""
    from bigdatapipeline_steamreviews_spark.operators.analytic import (
        interval_peak_concurrency,
    )

    D = 86400
    clean = [(1, 100, 200), (2, 150, 300), (3, D - 50, D + 500)]
    dirty = clean + [(4, None, 250), (5, 120, None), (6, None, None)]
    schema = "k long, s long, e long"
    want = {
        r.day_unix: (r.peak_concurrency, r.n_changes)
        for r in interval_peak_concurrency(
            spark.createDataFrame(clean, schema), "s", "e", ("k",)
        ).collect()
    }
    got = {
        r.day_unix: (r.peak_concurrency, r.n_changes)
        for r in interval_peak_concurrency(
            spark.createDataFrame(dirty, schema), "s", "e", ("k",)
        ).collect()
    }
    assert got == want
    assert got[D] == (1, 1)  # carry-in survives the dropped rows


def test_last_touch_attribution_semantics(spark):
    """A purchase credits the latest PRECEDING view/click (strictly before
    it in (ts, event_id) order); purchases with no prior touch fall into
    'none'; a touch AFTER the purchase must not count."""
    import datetime as dt

    from bigdatapipeline_steamreviews_spark.registry import REGISTRY
    from bigdatapipeline_steamreviews_spark import queries

    queries()

    def ts(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # user 1: view -> purchase (view wins), then click -> purchase
        (1, ts("2024-01-01 10:00:00"), 1, "view", 0.0, "{}"),
        (2, ts("2024-01-01 10:05:00"), 1, "purchase", 10.0, "{}"),
        (3, ts("2024-01-01 10:10:00"), 1, "click", 0.0, "{}"),
        (4, ts("2024-01-01 10:15:00"), 1, "purchase", 20.0, "{}"),
        # user 2: purchase with NO prior touch; later view is irrelevant
        (5, ts("2024-01-01 09:00:00"), 2, "purchase", 5.0, "{}"),
        (6, ts("2024-01-01 09:30:00"), 2, "view", 0.0, "{}"),
        # user 3: error events are not touches
        (7, ts("2024-01-01 08:00:00"), 3, "error", 0.0, "{}"),
        (8, ts("2024-01-01 08:10:00"), 3, "purchase", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="attr_events_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = REGISTRY["w16_last_touch_attribution"].fn(spark, d)
    got = {
        r.touch_type: (r.n_purchases, r.attributed_value)
        for r in out.collect()
    }
    assert got == {
        "view": (1, 10.0),
        "click": (1, 20.0),
        "none": (2, 12.0),  # user 2 (no prior touch) + user 3 (error only)
    }


def test_key_skew_report_flags_hot_key(spark):
    """The heavy key tops the report with the right ppm share and
    skew_x_keys = cnt * n_distinct_keys (exact integers)."""
    from bigdatapipeline_steamreviews_spark.registry import REGISTRY
    from bigdatapipeline_steamreviews_spark import queries

    queries()
    import tempfile, os, datetime as dt

    rows = [(1, 100, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1))] * 60 + [
        (2, 200, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
    ] * 30 + [
        (3, 300, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
    ] * 10
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    d = tempfile.mkdtemp(prefix="skew_li_")
    df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    out = REGISTRY["dq_key_skew_report"].fn(spark, d).collect()
    assert [r.key for r in out] == [100, 200, 300]
    top = out[0]
    assert (top.cnt, top.share_ppm, top.skew_x_keys) == (60, 600000, 180)
