"""Custom stateful streaming operator (applyInPandasWithState transition
steps): the streamed transition matrix must exactly equal the batch lag()
formulation — including pairs that straddle micro-batch boundaries, which
only exist if the per-key state row reconstructs them.
"""

from __future__ import annotations

import datetime as dt

import pytest

from bigdatapipeline_steamreviews_spark.operators.analytic import event_transitions
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
    run_to_memory_table,
    stage_events_for_replay,
)
from bigdatapipeline_steamreviews_spark.streaming.transitions import (
    streaming_transitions,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def streamed_steps(spark, tmp_path_factory):
    stage = str(tmp_path_factory.mktemp("trans_stage"))
    # chunks=4, one file per trigger: forces at least 4 micro-batches, so
    # cross-batch pairs genuinely exercise the state path.
    stage_events_for_replay(spark, SF_DIR, stage, chunks=4)
    stream = events_file_stream(spark, stage, max_files_per_trigger=1)
    result = streaming_transitions(stream)
    ckpt = str(tmp_path_factory.mktemp("trans_ckpt"))
    return run_to_memory_table(result, "trans_test", ckpt, "append").collect()


def test_streamed_transition_matrix_equals_batch(spark, streamed_steps):
    from collections import Counter

    streamed = Counter((r.from_state, r.to_state) for r in streamed_steps)
    batch = {
        (r.from_state, r.to_state): r.n_transitions
        for r in event_transitions(load_table(spark, SF_DIR, "events")).collect()
    }
    assert len(streamed) > 0
    assert dict(streamed) == batch


def test_streamed_step_count_is_events_minus_users(spark, streamed_steps):
    # Every event except each user's first emits exactly one step.
    events = load_table(spark, SF_DIR, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert len(streamed_steps) == n_events - n_users


def test_cross_batch_pair_reconstructed(spark, tmp_path):
    """Two events of one user split across two micro-batches must still
    produce their transition (the state row carries the first event)."""
    # Staged wire format: ts = epoch-MICROS long (see stage_events_for_replay).
    base_us = int(dt.datetime(2023, 11, 14, tzinfo=dt.timezone.utc).timestamp()) * 10**6
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    df1 = spark.createDataFrame([(1, base_us, 7, "view", 1.0, "{}")], schema)
    df2 = spark.createDataFrame(
        [(2, base_us + 60 * 10**6, 7, "click", 1.0, "{}")], schema
    )
    stage = str(tmp_path / "stage")
    df1.coalesce(1).write.mode("append").parquet(stage)
    df2.coalesce(1).write.mode("append").parquet(stage)
    stream = events_file_stream(spark, stage, max_files_per_trigger=1)
    ckpt = str(tmp_path / "ckpt")
    out = run_to_memory_table(
        streaming_transitions(stream), "trans_xbatch", ckpt, "append"
    ).collect()
    assert [(r.user_id, r.from_state, r.to_state) for r in out] == [
        (7, "view", "click")
    ]
