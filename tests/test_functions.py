"""Unit tests for the Catalyst column helpers — including the reference's
edge-case quirks (SURVEY.md §5.3)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.functions import (
    avg_exact,
    cosine_similarity,
    count_if,
    epoch_seconds_to_ts,
    normalize_bool_string,
    sum_exact,
    word_shingles,
)


def test_normalize_bool_string_null_is_false(spark):
    # Ref quirk: "recommended" string -> bool with null->False
    # (/root/reference/summarizer.py:68-70).
    df = spark.createDataFrame(
        [("true",), ("false",), (None,), ("TRUE",), ("garbage",)], ["s"]
    )
    got = [r.b for r in df.select(normalize_bool_string("s").alias("b")).collect()]
    assert got == [True, False, False, False, False]


def test_word_shingles_basic_and_short(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("a",)], ["t"])
    got = [r.s for r in df.select(word_shingles("t", 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n -> empty, not sequence(1,0) garbage
    assert got[2] == []


def test_sum_avg_exact_partitioning_independent(spark):
    vals = [(float(i) + 0.1,) for i in range(1000)]
    one = spark.createDataFrame(vals, ["v"]).coalesce(1)
    many = spark.createDataFrame(vals, ["v"]).repartition(32)
    s1 = one.select(sum_exact("v").alias("s"), avg_exact("v").alias("a")).collect()[0]
    s2 = many.select(sum_exact("v").alias("s"), avg_exact("v").alias("a")).collect()[0]
    assert s1.s == s2.s and s1.a == s2.a  # bitwise, not approx


def test_count_if_and_epoch(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["a", "epoch"])
    r = df.select(
        count_if(F.col("a") > 1).alias("c"),
    ).collect()[0]
    assert r.c == 2
    ts = df.select(epoch_seconds_to_ts("epoch").alias("t")).collect()
    assert ts[0].t.second == 10


def test_count_if_all_null_predicate_group_is_zero(spark):
    # sum over an all-NULL cast is NULL in Spark; the oracle's
    # CASE WHEN .. ELSE 0 makes it 0 — count_if must coalesce.
    df = spark.createDataFrame(
        [("g", None), ("g", None)], "k string, v double"
    )
    r = df.groupBy("k").agg(count_if(F.col("v") > 1.0).alias("c")).collect()[0]
    assert r.c == 0


def test_cosine_similarity_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0, 2.0], b=[1.0, 0.0, 2.0]), Row(a=[1.0, 0.0, 0.0], b=[0.0, 1.0, 0.0])]
    )
    got = [r.c for r in df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(got[0], 1.0, rel_tol=1e-12)
    assert got[1] == 0.0
