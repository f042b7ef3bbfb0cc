"""Unit tests for the data-quality operator family (operators/quality.py):
hand-computed goldens plus the skew/edge cases the sf-data oracles can't
force (heavy keys, empty groups, gap days, all-null columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.quality import (
    column_profile,
    constraint_report,
    per_key_top_hash,
    sliding_distinct_count,
    winsorized_stats,
)


def test_column_profile_counts_nulls_distincts_and_typed_minmax(spark):
    df = spark.createDataFrame(
        [(1, None, "b"), (2, 5.0, "a"), (2, 7.5, None), (3, 7.5, "c")],
        "k int, v double, s string",
    )
    rows = {
        r["col"]: r
        for r in column_profile(
            df, numeric_cols=("k", "v"), string_cols=("s",)
        ).collect()
    }
    assert rows["k"]["n_rows"] == 4
    assert rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 3.0
    assert rows["k"]["min_str"] is None and rows["k"]["max_str"] is None
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["n_distinct"] == 2  # NULL excluded, 7.5 deduped
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "c"
    assert rows["s"]["min_num"] is None


def test_column_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k int, v double")
    row = {
        r["col"]: r for r in column_profile(df, numeric_cols=("k", "v")).collect()
    }["v"]
    assert row["n_nulls"] == 2
    assert row["n_distinct"] == 0
    assert row["min_num"] is None and row["max_num"] is None


def test_constraint_report_pass_fail_and_null_coalesce(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    rules = [
        ("unique k", df.agg((F.count(F.lit(1)) - F.countDistinct("k")).alias("n_violations"))),
        ("k positive", df.agg(F.sum((F.col("k") <= 0).cast("long")).alias("n_violations"))),
        # an empty-input rule: sum over no rows is NULL and must coalesce to 0
        ("empty slice", df.filter(F.lit(False)).agg(F.sum(F.lit(1)).alias("n_violations"))),
    ]
    rows = {r["rule"]: r for r in constraint_report(rules).collect()}
    assert rows["unique k"]["n_violations"] == 1
    assert rows["unique k"]["status"] == "fail"
    assert rows["k positive"]["n_violations"] == 0
    assert rows["k positive"]["status"] == "pass"
    assert rows["empty slice"]["n_violations"] == 0
    assert rows["empty slice"]["status"] == "pass"


def test_winsorized_mean_golden(spark):
    # group g: values 1..10, one outlier 1000 at id 11.
    # n=11: p10 -> ceil(.1*11)=rank 2 -> 2.0; p90 -> ceil(.9*11)=rank 10 -> 10.0
    # clamped: [2,2,3,...,10,10,10] -> sum = 2 + 54 + 10 + 10 = ... compute:
    # values 1..10 clamp to [2,2,3,4,5,6,7,8,9,10]=56; outlier->10; total 66/11=6.0
    data = [("g", float(i), i) for i in range(1, 11)] + [("g", 1000.0, 11)]
    df = spark.createDataFrame(data, "grp string, v double, id int")
    row = winsorized_stats(df, ["grp"], "v", "id", 0.10, 0.90).collect()[0]
    assert row["p10"] == 2.0
    assert row["p90"] == 10.0
    assert row["n_rows"] == 11
    assert row["winsorized_mean"] == pytest.approx(6.0)


def test_per_key_top_hash_matches_single_window_under_skew(spark):
    # one heavy key (900 rows) + two light keys; phase-1 partition pruning
    # must not change the result vs the single global window.
    rows = [("heavy", i) for i in range(900)] + [("a", i) for i in range(5)] + [
        ("b", i + 100) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k string, id long").repartition(8)
    order = [F.md5(F.col("id").cast("string")), F.col("id")]
    got = per_key_top_hash(df, ["k"], order, 10, rank_name="rn")

    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(*order)
    want = (
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_per_key_top_hash_keeps_small_groups_whole(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, id long")
    got = per_key_top_hash(df, ["k"], [F.col("id")], 10, rank_name="rn").collect()
    assert len(got) == 3  # k smaller than group size keeps everything


def test_sliding_distinct_count_with_gap_days(spark):
    # days 1, 2 and 9 (gap): window ending day 9 must not see day-1/2 users;
    # only observed days appear as window ends.
    rows = [
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 11:00:00", 2),
        ("2024-01-02 10:00:00", 2),
        ("2024-01-09 10:00:00", 3),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {
        str(r["win_end"]): r["n"]
        for r in sliding_distinct_count(df, "ts", "user_id", 7, "n").collect()
    }
    assert got == {
        "2024-01-01 00:00:00": 2,
        "2024-01-02 00:00:00": 2,  # users 1,2 within trailing 7 days
        "2024-01-09 00:00:00": 1,  # day 2 is 7 days back -> outside the 7-day frame
    }


def test_blob_reconciliation_all_discrepancy_classes(spark):
    """A healthy lake only ever produces ok/quarantined rows (the
    registered query's oracle gates those); the discrepancy classes the
    operator exists to SURFACE never occur on any corpus, so exercise
    every one synthetically: missing blob, orphan blob, orphan blob for
    a no-payload doc, and a byte-length mismatch."""
    from bigdatapipeline_steamreviews_spark.operators.quality import (
        blob_reconciliation,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello"),        # ok (5 bytes)
            (2, None),           # quarantined: NULL payload, no blob
            (3, ""),             # quarantined: empty payload, no blob
            (4, "lost"),         # missing_blob: payload, blob absent
            (5, "héllo"),        # ok, multibyte: 6 UTF-8 bytes
            (6, "truncated"),    # size_mismatch: blob shorter than text
            (7, None),           # orphan_blob: catalog says no payload
        ],
        "doc_id long, text string",
    )
    blobs = spark.createDataFrame(
        [
            (1, 5),
            (5, 6),
            (6, 4),    # truncated write
            (7, 3),    # blob exists though catalog has no payload
            (99, 10),  # orphan: no catalog row at all
        ],
        "b_doc_id long, blob_bytes long",
    )
    got = {
        r.status: (r.n_docs, r.total_bytes)
        for r in blob_reconciliation(docs, blobs).collect()
    }
    assert got == {
        "ok": (2, 11),
        "quarantined_no_payload": (2, 0),
        "missing_blob": (1, 0),
        "orphan_blob": (2, 13),
        "size_mismatch": (1, 4),
    }
