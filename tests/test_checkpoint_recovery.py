"""Checkpoint crash-recovery (T6/T8): a streaming aggregate interrupted
mid-replay and RESTARTED from its checkpoint must converge to exactly the
batch answer — offsets resume where the killed run committed, no input is
skipped, and no double-counting occurs even though the first run died
between micro-batches.

This is the property every other streaming test assumes but none
exercised: they all drain availableNow in one uninterrupted run.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.queries_streaming import (
    _stage_events_chunks,
)
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_restart_from_checkpoint_reaches_batch_answer(spark):
    stage = _stage_events_chunks(spark, SF_DIR)
    ckpt = tempfile.mkdtemp(prefix="recovery_ckpt_")

    def aggregate(stream):
        return stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("total"),
        )

    # Run 1: one file per trigger, killed after the FIRST micro-batch
    # commits (awaitTermination with a poll loop on recentProgress).
    stream = events_file_stream(spark, stage, max_files_per_trigger=1)
    q1 = (
        aggregate(stream)
        .writeStream.format("memory")
        .queryName("recovery_run1")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        done = [p for p in q1.recentProgress if p.numInputRows > 0]
        if done:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(30)
    partial = {r.event_type: r.n for r in spark.table("recovery_run1").collect()}
    batch = {
        r.event_type: r.n
        for r in aggregate(load_table(spark, SF_DIR, "events")).collect()
    }
    # the kill must land mid-replay (with 4 chunks and 1 file/trigger the
    # first commit holds ~1/4 of rows) or the test degenerates to the
    # uninterrupted case; on a machine fast enough to drain all 4 chunks
    # before stop() lands, skip honestly rather than pass vacuously.
    if sum(partial.values()) >= sum(batch.values()):
        import pytest

        pytest.skip("replay drained before the kill landed; retry later")

    # Run 2: same checkpoint, fresh query — resumes from committed
    # offsets and drains the rest (availableNow).
    stream2 = events_file_stream(spark, stage, max_files_per_trigger=1)
    q2 = (
        aggregate(stream2)
        .writeStream.format("memory")
        .queryName("recovery_run2")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    final = {
        (r.event_type): (r.n, r.total)
        for r in spark.table("recovery_run2").collect()
    }
    want = {
        (r.event_type): (r.n, r.total)
        for r in aggregate(load_table(spark, SF_DIR, "events")).collect()
    }
    assert final == want, "restarted stream diverged from the batch answer"
