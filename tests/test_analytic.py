"""Analytic-window and temporal-join operator tests: semantics on small
literal frames plus the plan shapes that matter at 100 TB (as-of join is
one shuffle, range join never degenerates to a nested loop, sessionize
shares one exchange across its two windows).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.analytic import (
    as_of_join,
    nearest_rank_percentiles,
    rolling_frame_avg,
    sessionize,
)
from bigdatapipeline_steamreviews_spark import queries
from tests.conftest import SF_DIR


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 1, _ts("2024-01-01 10:00:00")),
        (1, 2, _ts("2024-01-01 10:10:00")),   # 10 min -> same session
        (1, 3, _ts("2024-01-01 11:00:00")),   # 50 min -> new session
        (2, 4, _ts("2024-01-01 10:00:00")),   # other user -> own session 1
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_as_of_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-05 00:00:00")), (1, 101, _ts("2024-01-01 00:00:00")),
         (2, 102, _ts("2024-01-05 00:00:00"))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 10.0),   # exactly simultaneous: visible
         (1, _ts("2024-01-04 00:00:00"), 20.0),
         (1, _ts("2024-01-06 00:00:00"), 30.0),   # future: never visible
         (3, _ts("2024-01-01 00:00:00"), 99.0)],  # other key
        "user_id long, ots timestamp, val double",
    )
    out = as_of_join(left, right, "user_id", "ts", "ots", ["val"])
    got = {r.event_id: r.val for r in out.collect()}
    assert got == {100: 20.0, 101: 10.0, 102: None}


def test_as_of_join_is_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-05 00:00:00"))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 1.0)], "user_id long, ots timestamp, val double"
    )
    plan = (
        as_of_join(left, right, "user_id", "ts", "ots", ["val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Union-tag algorithm: no join node at all, exactly one exchange (the
    # window's hashpartitioning on the key), never a range-join product.
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_not_nested_loop(spark):
    plan = (
        queries()["t2_shipments_within_30d"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_plan_shapes(spark):
    plan = (
        queries()["j2_customer_order_cohorts"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_rolling_frame_avg_exact(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "day int, v double"
    )
    got = {
        r.day: r.rolling_avg
        for r in rolling_frame_avg(df, "day", "v", preceding=1).collect()
    }
    assert got == {1: 10.0, 2: 15.0, 3: 25.0, 4: 35.0}


def test_nearest_rank_percentiles_small(spark):
    df = spark.createDataFrame(
        [("a", float(v), v) for v in range(1, 11)], "g string, v double, id int"
    )
    row = nearest_rank_percentiles(df, ["g"], "v", "id", (0.5, 0.9)).collect()[0]
    # nearest-rank over 1..10: p50 = 5th value, p90 = 9th value
    assert (row.p50, row.p90, row.n_rows) == (5.0, 9.0, 10)


def test_salted_join_shuffles_not_broadcasts(spark):
    from bigdatapipeline_steamreviews_spark.operators.partitioning import salted_join

    left = spark.range(100).withColumnRenamed("id", "k")
    right = spark.range(10).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 2
    )
    out = salted_join(left, right, "k", n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The whole point: hot keys spread over (key, salt) shuffle buckets —
    # a broadcast would erase the shuffle the salt is spreading.
    assert "BroadcastHashJoin" not in plan
    assert "__salt" not in out.columns
    # Routing never changes results.
    assert out.count() == 10


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], "user_id long, event_id long, ts timestamp"
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    # lag-window and running-sum-window share partitioning+ordering: one
    # exchange, not two.
    assert plan.count("Exchange hashpartitioning") == 1


def test_hll_corrected_estimate_accuracy(spark):
    """The portable HLL's corrected estimate lands within the expected
    error band of the exact distinct count (m=64 -> ~13% standard error;
    linear counting takes over in the small-n regime)."""
    from pyspark.sql import functions as F

    from bigdatapipeline_steamreviews_spark.operators.sketches import (
        hll_corrected,
        hll_distinct,
    )
    from bigdatapipeline_steamreviews_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events")
    est = {
        r["event_type"]: hll_corrected(r["hll_raw"], r["empty_buckets"])
        for r in hll_distinct(e, "user_id", ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for etype, n in exact.items():
        assert abs(est[etype] - n) / n < 0.35, (etype, est[etype], n)


def test_conversion_funnel_ordering_semantics(spark):
    """Hand-computed funnel: a click BEFORE the first view must not count,
    a click AT the same instant as the view must (>= semantics), and a
    purchase before the first qualifying click must not."""
    from bigdatapipeline_steamreviews_spark.queries_analytic import (
        w8_conversion_funnel,
    )
    import tempfile

    rows = [
        # user 1: view -> click -> purchase, fully ordered: all 3 stages
        (1, 1000, 1, "view", 0.0, "{}"),
        (2, 2000, 1, "click", 0.0, "{}"),
        (3, 3000, 1, "purchase", 0.0, "{}"),
        # user 2: click BEFORE first view, purchase after view but no
        # qualifying click: stops at 'view'
        (4, 500, 2, "click", 0.0, "{}"),
        (5, 1000, 2, "view", 0.0, "{}"),
        (6, 2000, 2, "purchase", 0.0, "{}"),
        # user 3: click at the SAME micros as view (>= counts), no purchase
        (7, 1000, 3, "view", 0.0, "{}"),
        (8, 1000, 3, "click", 0.0, "{}"),
        # user 4: never views: no stage at all
        (9, 1000, 4, "click", 0.0, "{}"),
    ]
    sf = tempfile.mkdtemp(prefix="funnel_sf_")
    spark.createDataFrame(
        [(eid, __import__("datetime").datetime.utcfromtimestamp(ts), uid, et, v, p)
         for eid, ts, uid, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {r.stage: r.n_users for r in w8_conversion_funnel(spark, sf).collect()}
    assert got == {"view": 3, "view>click": 2, "view>click>purchase": 1}


def test_time_weighted_value_hand_case(spark):
    """Hand-computed time-weighted average: value 10 held 30 s then value
    20 held 10 s -> (10*30 + 20*10) / 40 = 12.5; the last reading (no
    successor) contributes no span."""
    from bigdatapipeline_steamreviews_spark.queries_analytic import (
        w9_time_weighted_value,
    )
    import datetime
    import tempfile

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 10.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=30), 1, "click", 20.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=40), 1, "click", 99.0, "{}"),
    ]
    sf = tempfile.mkdtemp(prefix="twa_sf_")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = w9_time_weighted_value(spark, sf).collect()
    assert len(got) == 1
    assert got[0].observed_s == 40
    assert got[0].tw_avg == 12.5
