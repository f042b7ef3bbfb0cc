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
