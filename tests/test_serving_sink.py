"""Tests for the foreachBatch serving materializer (S6/A7/T6/T7): the
Spark-first replacement for the visualizer's pandas upsert store."""

from __future__ import annotations

import tempfile

from bigdatapipeline_steamreviews_spark.operators.aggregations import daily_summary
from bigdatapipeline_steamreviews_spark.operators.serving import with_date_parts
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from bigdatapipeline_steamreviews_spark.streaming.serving_sink import (
    materialize_stream_to_serving,
    upsert_batch_writer,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
    stage_events_for_replay,
    streaming_daily_summary,
)
from tests.conftest import SF_DIR

KEYS = ["event_type", "time"]


def test_stream_materializes_to_batch_equivalent_serving_table(spark):
    """Replay the stream through update-mode foreachBatch merges; the final
    parquet serving table must equal the batch daily summary."""
    stage = stage_events_for_replay(spark, SF_DIR, tempfile.mkdtemp(prefix="stage_"))
    table_dir = tempfile.mkdtemp(prefix="serving_") + "/table"
    stream = events_file_stream(spark, stage, max_files_per_trigger=1)
    materialize_stream_to_serving(
        streaming_daily_summary(stream),
        table_dir,
        KEYS,
        tempfile.mkdtemp(prefix="ckpt_"),
    )
    got = spark.read.parquet(table_dir).orderBy(*KEYS)
    want = daily_summary(load_table(spark, SF_DIR, "events")).orderBy(*KEYS)
    assert got.collect() == want.collect()


def test_upsert_writer_is_idempotent_per_key(spark):
    """T7 — at-least-once delivery: re-applying the same batch converges
    (replace-else-append per key, like visualizer.py:67-77)."""
    table_dir = tempfile.mkdtemp(prefix="serving_") + "/table"
    writer = upsert_batch_writer(table_dir, keys=["k"])
    b1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["k", "v"])
    writer(b1, 0)
    writer(b1, 0)  # duplicate delivery
    got = {r.k: r.v for r in spark.read.parquet(table_dir).collect()}
    assert got == {"a": 1.0, "b": 2.0}
    # a later batch replaces existing keys and appends new ones
    b2 = spark.createDataFrame([("b", 20.0), ("c", 3.0)], ["k", "v"])
    writer(b2, 1)
    got = {r.k: r.v for r in spark.read.parquet(table_dir).collect()}
    assert got == {"a": 1.0, "b": 20.0, "c": 3.0}
    # within one batch, the later row wins (arrival order = seq order)
    b3 = spark.createDataFrame([("d", 1.0), ("d", 9.0)], ["k", "v"]).coalesce(1)
    writer(b3, 2)
    got = {r.k: r.v for r in spark.read.parquet(table_dir).collect()}
    assert got["d"] == 9.0


def test_serving_table_supports_reference_queries(spark):
    """The materialized table answers the visualizer's query shapes
    (rollup A5/A6 over date parts) straight from parquet."""
    stage = stage_events_for_replay(spark, SF_DIR, tempfile.mkdtemp(prefix="stage_"))
    table_dir = tempfile.mkdtemp(prefix="serving_") + "/table"
    stream = events_file_stream(spark, stage, max_files_per_trigger=2)
    materialize_stream_to_serving(
        streaming_daily_summary(stream),
        table_dir,
        KEYS,
        tempfile.mkdtemp(prefix="ckpt_"),
    )
    serving = with_date_parts(spark.read.parquet(table_dir))
    from bigdatapipeline_steamreviews_spark.operators.aggregations import monthly_rollup

    rolled = monthly_rollup(
        serving, ["A_value", "T_events"], ["event_type", "time_year", "time_month"]
    )
    assert rolled.count() > 0
