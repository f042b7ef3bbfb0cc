"""In-flight observability (round 13): df.observe metrics riding the
pipeline's own pass, and StreamingQueryListener capture of per-batch
counters — including the watermark-drop accounting that no output-table
query can reveal (dropped rows never reach the output).

streaming/metrics.py; semantics notes there.  The batch observation is
separately DuckDB-oracled as the registered query obs_ingest_metrics.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.sources.tables import (
    event_ts_micros,
    load_table,
)
from bigdatapipeline_steamreviews_spark.streaming.metrics import (
    INGEST_OBS_NAME,
    StreamMetricsListener,
    ingest_metric_exprs,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
    run_to_memory_table,
    streaming_daily_summary,
)
from tests.conftest import SF_DIR

DAY_US = 86_400 * 1_000_000
_qn = 0


def _fresh_name() -> str:
    global _qn
    _qn += 1
    return f"obs_stream_{_qn}"


def _stage_displaced(spark, chunks=4, late_mod=10, displacement=1):
    """The displaced replay from test_streaming.py: 4 event-time chunks,
    a content-hash-selected 1/late_mod of rows arriving ``displacement``
    chunks late.  displacement=2 is needed to produce watermark DROPS
    even at zero delay: the late-row filter lags the watermark by one
    batch (streaming/metrics.py), so a one-chunk straggler is always
    newer than the filter value — an exactly-one-trigger disorder is
    structurally safe, which is itself worth knowing."""
    stage = tempfile.mkdtemp(prefix="obs_displaced_")
    raw = event_ts_micros(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    n = raw.count()
    ranked = raw.withColumn(
        "__chunk",
        F.least(
            F.lit(chunks - 1),
            F.floor(
                F.row_number().over(W.orderBy("ts", "event_id"))
                * chunks
                / (n + 1)
            ).cast("int"),
        ),
    )
    late = (
        F.pmod(F.xxhash64(F.lit("late"), F.col("event_id")), F.lit(late_mod))
        == 0
    )
    staged = ranked.withColumn(
        "__arrival",
        F.when(
            late, F.least(F.col("__chunk") + displacement, F.lit(chunks - 1))
        ).otherwise(F.col("__chunk")),
    )
    for i in range(chunks):
        staged.filter(F.col("__arrival") == i).drop(
            "__chunk", "__arrival"
        ).coalesce(1).write.mode("append").parquet(stage)
        time.sleep(0.05)
    return stage


def _staged_files_in_replay_order(stage: str) -> list[str]:
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    return sorted(files, key=os.path.getmtime)


def _run_with_listener(spark, stage, watermark, output_mode):
    name = _fresh_name()
    listener = StreamMetricsListener(name)
    spark.streams.addListener(listener)
    try:
        stream = events_file_stream(spark, stage, max_files_per_trigger=1)
        result = streaming_daily_summary(
            stream, watermark=watermark, observe_name=INGEST_OBS_NAME
        )
        ckpt = tempfile.mkdtemp(prefix="obs_ckpt_")
        table = run_to_memory_table(result, name, ckpt, output_mode)
        assert listener.wait_terminated(), "listener never saw termination"
    finally:
        spark.streams.removeListener(listener)
    return table, listener


def test_observed_metrics_sum_to_batch_oracle(spark, staged_dir=None):
    """Per-batch observed counters, summed across the replay's
    micro-batches, equal one batch aggregate over the same rows — the
    observe path IS a real aggregate (accumulator-side), not an
    estimate.  Mirrors the DuckDB-oracled obs_ingest_metrics totals."""
    stage = _stage_displaced(spark)
    _, listener = _run_with_listener(
        spark, stage, watermark=None, output_mode="complete"
    )
    got = listener.observed_totals()
    truth = (
        spark.read.parquet(stage)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
        .agg(*ingest_metric_exprs())
        .first()
    )
    assert got["n_rows"] == truth["n_rows"] > 0
    assert got["n_null_user"] == truth["n_null_user"]
    assert got["n_null_value"] == truth["n_null_value"]
    assert got["n_purchase"] == truth["n_purchase"] > 0
    # Each batch's progress carried the observation (not just the sum).
    per_batch = [
        p["observedMetrics"][INGEST_OBS_NAME]["n_rows"]
        for p in listener.progresses
    ]
    assert len(per_batch) >= 4 and all(v >= 0 for v in per_batch)
    assert sum(per_batch) == truth["n_rows"]


def test_listener_drop_count_equals_late_row_oracle(spark):
    """stateOperators.numRowsDroppedByWatermark, captured by the
    listener under the displaced replay with a TIGHT watermark, equals
    an independently computed late-row count.

    Drop oracle (semantics pinned empirically, streaming/metrics.py):
    (1) the filter in batch j uses the watermark reported for batch
    j-1, which is max event time over batches 0..j-2 minus the delay —
    one batch LAGGED, so an exactly-one-trigger disorder never drops;
    (2) a group is dropped iff its window END is before that filter
    value; and (3) the counter counts rows AT THE STATE OPERATOR —
    after map-side partial aggregation — so with each chunk read as a
    single input partition the unit is distinct (window, event_type)
    groups among the late rows, not raw events.  The test computes the
    expectation from the staged chunk files alone (no listener data)
    and asserts both that drops occurred and that the counter equals
    the oracle exactly."""
    stage = _stage_displaced(spark, displacement=2)
    files = _staged_files_in_replay_order(stage)
    assert len(files) == 4

    # Expected drops, from the staged files only.  delay = 0 seconds.
    maxts = [
        spark.read.parquet(f).agg(F.max("ts")).first()[0] for f in files
    ]
    expected_lt = expected_le = 0
    win_end = ((F.floor(F.col("ts") / DAY_US) + 1) * DAY_US).alias("we")
    for j in range(2, len(files)):
        filter_wm = max(maxts[: j - 1])  # state through batch j-2
        chunk = spark.read.parquet(files[j])
        # The partial-aggregation unit: one staged file = one input
        # partition (precondition for the distinct-group oracle).
        assert chunk.rdd.getNumPartitions() == 1
        late_groups = chunk.select(win_end, "event_type").distinct()
        expected_lt += late_groups.filter(F.col("we") < F.lit(filter_wm)).count()
        expected_le += late_groups.filter(F.col("we") <= F.lit(filter_wm)).count()
    # No window boundary coincides with a filter watermark in this data,
    # so the oracle is insensitive to the <-vs-<= boundary convention.
    assert expected_lt == expected_le
    assert expected_lt > 0, "staging produced no droppable stragglers"

    _, listener = _run_with_listener(
        spark, stage, watermark="0 seconds", output_mode="update"
    )
    assert listener.dropped_by_watermark() == expected_lt
    # The arriving-row counters still saw EVERY row (observe sits before
    # the watermark filter): drops are accounted, not silently absorbed.
    n_staged = spark.read.parquet(stage).count()
    assert listener.observed_totals()["n_rows"] == n_staged
