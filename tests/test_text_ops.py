"""Golden-row unit tests for the text-analysis operators added beyond the
oracle gate: lexicon sentiment, tf-idf ranking, vocabulary stats — plus the
paced rate-source replay's schema contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.text import (
    lexicon_sentiment,
    tfidf_top_terms,
    vocab_stats,
)


def _docs(spark):
    rows = [
        (1, "fast fast slow data"),     # +1 +1 -1 over 4 tokens = 0.25
        (2, "data data data"),          # no lexicon hits
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lexicon_sentiment_mean_weight(spark):
    got = {r.doc_id: r for r in lexicon_sentiment(_docs(spark)).collect()}
    assert got[1].n_tokens == 4 and got[1].n_hits == 3
    assert got[1].lexicon_sentiment == pytest.approx(0.25)
    assert got[2].n_hits == 0 and got[2].lexicon_sentiment == 0.0


def test_tfidf_ranks_distinctive_terms_first(spark):
    rows = [
        (1, "rare rare common"),
        (2, "common other other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = tfidf_top_terms(df, top_k=1)
    got = {r.doc_id: (r.token, r.score) for r in top.collect()}
    # rare: tf=2, df=1 -> 2*2/1 = 4.0 beats common: tf=1, df=2 -> 1.0
    assert got == {1: ("rare", 4.0), 2: ("other", 4.0)}


def test_vocab_stats_rank_and_counts(spark):
    got = {r.token: r for r in vocab_stats(_docs(spark), top_k=10).collect()}
    assert got["data"].n_total == 4 and got["data"].n_docs == 2
    assert got["data"].rank == 1  # most frequent
    assert got["fast"].n_total == 2 and got["fast"].n_docs == 1


def test_paced_event_stream_contract(spark):
    from bigdatapipeline_steamreviews_spark.sources.replay import (
        paced_event_stream,
    )

    df = paced_event_stream(spark, rows_per_second=10)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_exact_quantile_threshold_matches_nearest_rank(spark):
    import math

    from bigdatapipeline_steamreviews_spark.operators.selection import (
        exact_quantile_threshold,
    )

    # Clumpy values with ties, not uniformly spread.
    vals = [1.0, 1.0, 1.0, 2.5, 2.5, 3.0, 100.0, 100.0, 100.5, 101.0, 7.25]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for q in (0.1, 0.25, 0.5, 0.9, 1.0):
        want = sorted(vals)[math.ceil(q * len(vals)) - 1]
        got = exact_quantile_threshold(df, "v", q, n_buckets=4).collect()
        assert len(got) == 1 and got[0].threshold == want, q


def test_exact_quantile_threshold_degenerate_and_empty(spark):
    from bigdatapipeline_steamreviews_spark.operators.selection import (
        exact_quantile_threshold,
    )

    const = spark.createDataFrame([(5.0,)] * 7, "v double")
    got = exact_quantile_threshold(const, "v", 0.25).collect()
    assert len(got) == 1 and got[0].threshold == 5.0

    empty = spark.createDataFrame([], "v double")
    assert exact_quantile_threshold(empty, "v", 0.25).collect() == []


def test_language_id_generalizes_to_n_profiles(spark):
    from bigdatapipeline_steamreviews_spark.operators.text import (
        LANG_PROFILES,
        language_id,
    )

    profiles = dict(LANG_PROFILES)
    profiles["fr"] = ["le", "la", "et", "les", "des", "une"]
    df = spark.createDataFrame(
        [
            (1, "le chat et les chiens des villes"),
            (2, "the cat and the dogs of a town"),
            (3, "tie breaker with no profile words at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.predicted_lang
        for r in language_id(df, profiles=profiles).collect()
    }
    # Doc 3 scores 0 everywhere -> earliest profile wins the tie.
    assert got == {1: "fr", 2: "en", 3: "en"}


def test_paced_event_stream_delivers_rows_live(spark):
    # Actually run the rate source (not just the schema contract): a short
    # live window must deliver paced rows with valid derived columns.
    import time

    from bigdatapipeline_steamreviews_spark.sources.replay import (
        paced_event_stream,
    )

    df = paced_event_stream(spark, rows_per_second=50)
    q = (
        df.writeStream.format("memory")
        .queryName("paced_smoke")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("paced_smoke").count() >= 10:
                break
            time.sleep(0.5)
        rows = spark.table("paced_smoke").collect()
        assert len(rows) >= 10
        types = {r.event_type for r in rows}
        assert types <= {"click", "view", "purchase", "signup", "error"}
        assert all(0 <= r.value < 200.0 and r.user_id < 1000 for r in rows)
    finally:
        q.stop()


def test_textrank_fixed_point_hand_case(spark):
    """Two documents, tiny graph: 'a b a b' and 'b c'.  Edges: a->b (x2),
    b->a (x1), b->c (x1).  N=3, scale=10^12.  Hand-compute iteration 1:
      base = 3e12 // 60 = 50_000_000_000; r0 = 10^12 // 3 = 333_333_333_333
      ow: a=2, b=2
      contrib(b) = (r0*17*2) // (20*2) = (333333333333*34) // 40
      contrib(a) = (r0*17*1) // (20*2) = (333333333333*17) // 40
      contrib(c) = same as a
    and assert the operator's iteration-1 ranks match exactly.
    """
    from bigdatapipeline_steamreviews_spark.operators.text import textrank_keywords

    df = spark.createDataFrame([("a b a b",), ("b c",)], "text string")
    got = {r["w"]: r["rank_fp"] for r in textrank_keywords(df, iters=1, top_k=10).collect()}
    r0 = 10**12 // 3
    base = 3 * 10**12 // 60
    want = {
        "b": base + (r0 * 17 * 2) // 40,
        "a": base + (r0 * 17 * 1) // 40,
        "c": base + (r0 * 17 * 1) // 40,
    }
    assert got == want
    # ranks are BIGINTs, never floats
    assert all(isinstance(v, int) for v in got.values())


def test_bigram_surprisal_hand_case(spark):
    """Docs 'a b', 'a b', 'a c': ow(a)=3; bits(a,b)=len(bin(3//2))-1=0,
    bits(a,c)=len(bin(3//1))-1=1.  Common transitions score 0 bits, the
    rare one 1 bit — and all arithmetic is integer-exact."""
    from bigdatapipeline_steamreviews_spark.operators.text import bigram_surprisal

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert (got[1]["n_bigrams"], got[1]["total_bits"], got[1]["mean_bits"]) == (1, 0, 0.0)
    assert (got[3]["n_bigrams"], got[3]["total_bits"], got[3]["mean_bits"]) == (1, 1, 1.0)
