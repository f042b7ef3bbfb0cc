"""Golden-row tests for serving-layer operators (A5-A8, O1-O2, P11-P12)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.aggregations import (
    global_rollup,
    monthly_rollup,
)
from bigdatapipeline_steamreviews_spark.operators.serving import (
    distinct_values,
    hierarchical_time_filter,
    top_n,
    upsert_compact,
    with_date_parts,
)


def _serving_rows(spark):
    # (key, year, month, day, A_metric, T_metric, seq)
    rows = [
        ("a", 2024, 1, 1, 10.0, 5, 1),
        ("a", 2024, 1, 1, 20.0, 7, 2),  # later write, same key -> wins
        ("a", 2024, 1, 2, 30.0, 1, 3),
        ("a", 2024, 2, 1, 50.0, 2, 4),
        ("b", 2024, 1, 1, 100.0, 10, 5),
        ("b", 2025, 3, 9, 7.0, 3, 6),
    ]
    return spark.createDataFrame(
        rows, ["k", "time_year", "time_month", "time_day", "A_m", "T_m", "seq"]
    )


def test_upsert_compact_last_writer_wins(spark):
    df = _serving_rows(spark)
    got = upsert_compact(
        df,
        keys=["k", "time_year", "time_month", "time_day"],
        order_by=[F.col("seq").desc()],
    )
    vals = {(r.k, r.time_year, r.time_month, r.time_day): r.A_m for r in got.collect()}
    assert vals[("a", 2024, 1, 1)] == 20.0  # seq=2 replaced seq=1
    assert len(vals) == 5


def test_monthly_rollup_mean_of_means_dispatch(spark):
    # Faithful A5 semantics: A_* -> unweighted mean of daily values,
    # T_* -> sum (ref visualizer.py:197-207).
    df = _serving_rows(spark).filter(F.col("seq") != 1)
    got = monthly_rollup(df, ["A_m", "T_m"], ["k", "time_year", "time_month"])
    row = {(r.k, r.time_year, r.time_month): (r.A_m, r.T_m) for r in got.collect()}
    assert row[("a", 2024, 1)] == (25.0, 8)  # mean(20,30), sum(7,1)


def test_weighted_rollup_equals_raw_reaggregation(spark):
    # weighted mean of daily means == mean over the raw rows
    raw = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 1, 20.0), ("a", 1, 30.0), ("a", 2, 100.0)],
        ["k", "day", "v"],
    )
    daily = raw.groupBy("k", "day").agg(
        F.avg("v").alias("A_v"), F.count("v").alias("T_n")
    )
    rolled = monthly_rollup(daily, ["A_v", "T_n"], ["k"], weight_col="T_n")
    r = rolled.collect()[0]
    assert r.A_v == 40.0  # (10+20+30+100)/4 — not mean(20, 100) = 60
    assert r.T_n == 4


def test_global_rollup(spark):
    df = _serving_rows(spark).filter(F.col("seq") != 1)
    got = {r.k: r.T_m for r in global_rollup(df, ["T_m"], key="k").collect()}
    assert got == {"a": 10, "b": 13}


def test_hierarchical_time_filter_drilldown(spark):
    df = _serving_rows(spark)
    assert hierarchical_time_filter(df).count() == 6
    assert hierarchical_time_filter(df, year=2024).count() == 5
    assert hierarchical_time_filter(df, year=2024, month=1).count() == 4
    assert hierarchical_time_filter(df, year=2024, month=1, day=2).count() == 1
    # finer grains ignored when coarser unset (the fixed if/elif semantics)
    assert hierarchical_time_filter(df, month=1).count() == 6


def test_top_n_and_distinct(spark):
    df = _serving_rows(spark)
    top = top_n(df, [F.col("A_m").desc()], 2).collect()
    assert [r.A_m for r in top] == [100.0, 50.0]
    assert sorted(r.k for r in distinct_values(df, "k").collect()) == ["a", "b"]


def test_with_date_parts(spark):
    df = spark.createDataFrame([(datetime(2024, 3, 9, 15, 30),)], ["time"])
    r = with_date_parts(df).collect()[0]
    assert (r.time_year, r.time_month, r.time_day) == (2024, 3, 9)


def test_snapshot_diff_classifies_all_change_types(spark):
    from bigdatapipeline_steamreviews_spark.operators.serving import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(2, 25.0), (3, None), (4, None), (5, 50.0)], "k int, v double"
    )
    rows = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert rows[1][0] == "removed"
    assert rows[2] == ("changed", 20.0, 25.0)
    assert 3 not in rows  # null == null: unchanged, dropped
    assert rows[4][0] == "changed"  # value -> null IS a change
    assert rows[5][0] == "added"
    assert len(rows) == 4
