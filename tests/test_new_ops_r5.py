"""Hand-computed semantics tests for the round-5 additions: gap fill,
rolling z-score, Markov transitions, equi-width histogram, fuzzy
(edit-distance) linkage, SCD2 history, and bigram PMI.

Each test pins the operator's behavior on a tiny literal input whose
expected output is computable by hand — the oracle sweep proves
engine-vs-engine parity; these prove the semantics are the INTENDED ones.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.analytic import (
    equi_width_histogram,
    event_transitions,
    gap_fill_forward,
    rolling_zscore,
)
from bigdatapipeline_steamreviews_spark.operators.linkage import (
    deletion_variants,
    fuzzy_pairs_distance1,
)
from bigdatapipeline_steamreviews_spark.operators.serving import scd2_history
from bigdatapipeline_steamreviews_spark.operators.text import bigram_pmi


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_gap_fill_forward_fills_and_flags(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), 10.0), (_ts("2024-01-04 00:00:00"), 40.0)],
        "day timestamp, revenue double",
    )
    out = gap_fill_forward(df, "day", ["revenue"]).orderBy("day").collect()
    assert [r.day.day for r in out] == [1, 2, 3, 4]
    assert [r.revenue for r in out] == [10.0, 10.0, 10.0, 40.0]
    assert [r.is_gap for r in out] == [0, 1, 1, 0]


def test_rolling_zscore_constant_series_is_null(spark):
    rows = [("a", i, 5.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    out = rolling_zscore(df, ["g"], "i", "v", preceding=2).collect()
    assert all(r.zscore is None for r in out)
    assert all(r.is_anomaly == 0 for r in out)
    assert all(r.frame_mean == 5.0 for r in out)


def test_rolling_zscore_hand_case(spark):
    # frame at i=2 over [1, 1, 4]: mean=2, var=(1+1+16)/3-4=2, z=(4-2)/sqrt(2)
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 1.0), ("a", 2, 4.0)], "g string, i long, v double"
    )
    out = {r.i: r for r in rolling_zscore(df, ["g"], "i", "v", preceding=2).collect()}
    assert out[2].frame_n == 3
    assert out[2].frame_mean == pytest.approx(2.0)
    assert out[2].zscore == pytest.approx(2.0 / 2.0**0.5)
    assert out[2].is_anomaly == 0  # |z| ~ 1.414 < 2


def test_event_transitions_counts_and_probs(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:00"), "view"),
        (1, 2, _ts("2024-01-01 00:01:00"), "click"),
        (1, 3, _ts("2024-01-01 00:02:00"), "view"),
        (2, 4, _ts("2024-01-01 00:00:00"), "view"),
        (2, 5, _ts("2024-01-01 00:01:00"), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {
        (r.from_state, r.to_state): (r.n_transitions, r.p_transition)
        for r in event_transitions(df).collect()
    }
    # view->click twice, click->view once; first event per user excluded.
    assert out[("view", "click")] == (2, 1.0)
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 2


def test_equi_width_histogram_hand_case(spark):
    df = spark.createDataFrame(
        [(5.0,), (15.0,), (17.0,), (25.0,)], "v double"
    )
    out = {r.bucket: r for r in equi_width_histogram(df, "v", 10.0).collect()}
    assert out[0].n == 1 and out[0].lo == 0.0 and out[0].hi == 10.0
    assert out[1].n == 2 and out[1].value_sum == 32.0
    assert out[2].n == 1
    assert out[1].share == pytest.approx(0.5)
    # CDF accumulates in bucket order.
    assert (out[0].cum_n, out[1].cum_n, out[2].cum_n) == (1, 3, 4)


def test_deletion_variants_distinct(spark):
    df = spark.createDataFrame([(1, "aab")], "k long, name string")
    got = {r.variant for r in deletion_variants(df, "k", "name").collect()}
    # delete pos1/pos2 both give "ab" (dedup'd), delete pos3 gives "aa",
    # plus the original.
    assert got == {"aab", "ab", "aa"}


def test_fuzzy_pairs_distance1_sub_ins_del(spark):
    df = spark.createDataFrame(
        [
            (1, "cat"),
            (2, "cut"),  # substitution, dist 1 from cat
            (3, "cats"),  # insertion, dist 1 from cat
            (4, "ca"),  # deletion, dist 1 from cat (and from cut? c-a vs c-u-t: 2)
            (5, "dog"),  # unrelated
        ],
        "k long, name string",
    )
    pairs = {
        (r.l_key, r.r_key): r.distance
        for r in fuzzy_pairs_distance1(df, "k", "name").collect()
    }
    assert pairs[(1, 2)] == 1  # cat ~ cut
    assert pairs[(1, 3)] == 1  # cat ~ cats
    assert pairs[(1, 4)] == 1  # cat ~ ca
    assert (2, 3) not in pairs  # cut vs cats: dist 2
    assert all(k != 5 and v != 5 for k, v in pairs)  # dog matches nothing
    # cut~ca is distance 2: candidate via shared variant? "cu"/"ca" differ;
    # shared deletion variant "c" requires deleting 2 chars — not generated.
    assert (2, 4) not in pairs


def test_scd2_history_intervals(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:00"), 10.0),  # low
        (1, 2, _ts("2024-01-02 00:00:00"), 20.0),  # low (no change -> merged)
        (1, 3, _ts("2024-01-03 00:00:00"), 120.0),  # high
        (1, 4, _ts("2024-01-04 00:00:00"), 10.0),  # low again -> new version
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    tier = F.when(F.col("value") >= 100.0, F.lit("high")).otherwise(F.lit("low"))
    out = sorted(
        scd2_history(df, "user_id", tier, "tier").collect(), key=lambda r: r.version
    )
    assert [(r.tier, r.version, r.is_current) for r in out] == [
        ("low", 1, 0),
        ("high", 2, 0),
        ("low", 3, 1),
    ]
    # Intervals chain: each valid_to equals the next valid_from; final open.
    assert out[0].valid_to_unix == out[1].valid_from_unix
    assert out[1].valid_to_unix == out[2].valid_from_unix
    assert out[2].valid_to_unix is None


def test_scd2_first_observation_with_null_attr(spark):
    # A key whose first value is null must still open version 1 (the
    # change filter is null-safe on both the first-row and compare paths).
    df = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 00:00:00"), None),
         (1, 2, _ts("2024-01-02 00:00:00"), 5.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    tier = F.when(F.col("value").isNull(), F.lit(None).cast("string")).otherwise(
        F.lit("x")
    )
    out = sorted(
        scd2_history(df, "user_id", tier, "tier").collect(), key=lambda r: r.version
    )
    assert [(r.tier, r.version) for r in out] == [(None, 1), ("x", 2)]


def test_bigram_pmi_ranks_exclusive_pair_top(spark):
    # "x y" always co-occur and appear nowhere else -> maximal PMI ratio;
    # "a b" co-occurs but a and b also appear alone -> lower ratio.
    docs = [("x y a b",), ("x y b a",), ("x y a c b",), ("x y a b",), ("x y a b",)]
    df = spark.createDataFrame(docs, "text string")
    out = bigram_pmi(df, min_count=5, top_k=10).collect()
    assert out[0].w1 == "x" and out[0].w2 == "y"
    got = {(r.w1, r.w2): r for r in out}
    assert got[("x", "y")].n_pair == 5
    # exact ratio: p(xy)=5/M, p(x)=p(y)=5/N with N=22 tokens, M=17 pairs
    n_tokens = sum(len(d[0].split()) for d in docs)
    n_pairs = sum(len(d[0].split()) - 1 for d in docs)
    exp = (5 * n_tokens * n_tokens) / (n_pairs * 5 * 5)
    assert got[("x", "y")].pmi_ratio == pytest.approx(exp)


def test_cluster_inertia_hand_case(spark):
    # label 1: vectors (0,0) and (2,0) -> centroid (1,0), inertia 1+1=2,
    # mean 1.0; label 2: single vector -> inertia 0.
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], 1), (2, [2.0, 0.0], 1), (3, [5.0, 5.0], 2)],
        "vec_id long, embedding array<float>, label int",
    )
    from bigdatapipeline_steamreviews_spark.operators.similarity import (
        cluster_inertia,
    )

    out = {r.label: r for r in cluster_inertia(df).collect()}
    assert out[1].n_vecs == 2
    assert out[1].inertia == pytest.approx(2.0)
    assert out[1].mean_sqdist == pytest.approx(1.0)
    assert out[2].inertia == pytest.approx(0.0)


def test_interleave_order_rotates_sources(spark, tmp_path):
    # 2 sources, 3 docs each: sorting by interleave_pos must alternate
    # sources (a, b, a, b, a, b).
    import bigdatapipeline_steamreviews_spark.queries_text  # noqa: F401
    from bigdatapipeline_steamreviews_spark.registry import REGISTRY

    docs = spark.createDataFrame(
        [(i, "x", "en", f"src{i % 2}", 1) for i in range(6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = (
        REGISTRY["x4_interleave_order"]
        .fn(spark, sf)
        .orderBy("interleave_pos")
        .collect()
    )
    assert [r.source for r in out] == ["src0", "src1"] * 3
    # Positions are strictly increasing (a valid total order key).
    pos = [r.interleave_pos for r in out]
    assert pos == sorted(pos) and len(set(pos)) == 6


def test_dirty_csv_triage_counts(spark):
    import bigdatapipeline_steamreviews_spark.queries_reviews  # noqa: F401
    from bigdatapipeline_steamreviews_spark.registry import REGISTRY

    out = {
        r.reason: (r.n_rows, r.first_index)
        for r in REGISTRY["src_csv_dirty_rows"].fn(spark, "").collect()
    }
    # Fixture: the 31-row sample (which already carries two null-sentiment
    # rows, 19 and 29) + 1 short row + 2 broken timestamps (text and empty)
    # + 1 broken sentiment, with fixed classification priority.
    assert out["ok"] == (29, 0)
    assert out["short_row"] == (1, 33)
    assert out["bad_timestamp"] == (2, 31)
    assert out["bad_sentiment"] == (3, 19)
