"""Custom stateful streaming operator (applyInPandasWithState
sessionization): closed sessions emitted by the stream must exactly match
the batch sessionize result for the same input — the streaming/batch
equivalence property, restricted to sessions the watermark has closed.
"""

from __future__ import annotations

import pytest

from bigdatapipeline_steamreviews_spark.operators.analytic import session_stats
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from bigdatapipeline_steamreviews_spark.streaming.sessions import (
    streaming_sessionize,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
    run_to_memory_table,
    stage_events_for_replay,
)
from tests.conftest import SF_DIR

GAP = 1800


@pytest.fixture(scope="module")
def streamed_sessions(spark, tmp_path_factory):
    stage = str(tmp_path_factory.mktemp("sess_stage"))
    stage_events_for_replay(spark, SF_DIR, stage, chunks=4)
    stream = events_file_stream(spark, stage, max_files_per_trigger=1)
    result = streaming_sessionize(stream, gap_seconds=GAP, watermark="30 minutes")
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    return run_to_memory_table(result, "sess_test", ckpt, "append").collect()


def test_streamed_sessions_match_batch(spark, streamed_sessions):
    batch = {
        (r.user_id, r.session_start_unix): r
        for r in session_stats(
            load_table(spark, SF_DIR, "events"), gap_seconds=GAP
        ).collect()
    }
    assert len(streamed_sessions) > 0
    for s in streamed_sessions:
        b = batch.get((s.user_id, s.session_start_unix))
        assert b is not None, f"streamed session not in batch: {s}"
        assert s.session_end_unix == b.session_end_unix
        assert s.duration_s == b.duration_s
        assert s.n_events == b.n_events
        # Streaming sums float64 per-session; batch sums exact decimal.
        assert s.total_value == pytest.approx(b.total_value, rel=1e-12)


def test_streamed_sessions_are_unique_and_closed(streamed_sessions):
    keys = [(s.user_id, s.session_start_unix) for s in streamed_sessions]
    # Append-mode: each closed session is emitted exactly once.
    assert len(keys) == len(set(keys))
    for s in streamed_sessions:
        assert s.session_end_unix >= s.session_start_unix
        assert s.n_events >= 1
