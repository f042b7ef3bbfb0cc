"""Custom Python DataSource (sources/pyds.py): properties the oracle gate
can't see — partition planning, Arrow batch hand-off, and the per-trigger
replay mode of the stream reader."""

from __future__ import annotations

import tempfile
import time

from bigdatapipeline_steamreviews_spark.queries_reviews import REVIEWS_FIXTURE
from bigdatapipeline_steamreviews_spark.sources.pyds import (
    _ReviewBatchReader,
    _ReviewStreamReader,
    register_steamreviews_source,
)
from bigdatapipeline_steamreviews_spark.sources.tables import read_reviews_csv


def test_batch_source_matches_builtin_csv_scan(spark):
    register_steamreviews_source(spark)
    pyds = spark.read.format("steamreviews").load(REVIEWS_FIXTURE)
    builtin = read_reviews_csv(spark, REVIEWS_FIXTURE)
    # Python data sources surface every field nullable (the Arrow batches
    # carry no nullability contract) — compare names + types, not flags.
    assert [(f.name, f.dataType) for f in pyds.schema.fields] == [
        (f.name, f.dataType) for f in builtin.schema.fields
    ]
    key = lambda r: r["index"]  # noqa: E731 — .index collides with Row method
    assert sorted(pyds.collect(), key=key) == sorted(builtin.collect(), key=key)


def test_batch_reader_plans_one_partition_per_file():
    reader = _ReviewBatchReader({"path": REVIEWS_FIXTURE})
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].path == REVIEWS_FIXTURE


def test_stream_reader_row_range_offsets():
    reader = _ReviewStreamReader({"path": REVIEWS_FIXTURE, "rows_per_batch": "8"})
    assert reader.initialOffset() == {"row": 0}
    end = reader.latestOffset()
    assert end == {"row": 31}  # fixture has 31 reviews; EOF drain mode
    parts = reader.partitions({"row": 0}, end)
    assert [(p.start, p.end) for p in parts] == [(0, 8), (8, 16), (16, 24), (24, 31)]
    total = sum(b.num_rows for p in parts for b in reader.read(p))
    assert total == 31


def test_stream_advance_per_trigger_replays_in_microbatches(spark):
    """advance_per_trigger=true: each trigger drains exactly one
    rows_per_batch slice — the reference generator's tick loop."""
    register_steamreviews_source(spark)
    stream = (
        spark.readStream.format("steamreviews")
        .option("rows_per_batch", "10")
        .option("advance_per_trigger", "true")
        .load(REVIEWS_FIXTURE)
    )
    ckpt = tempfile.mkdtemp(prefix="pyds_adv_ckpt_")
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_adv_raw")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("pyds_adv_raw").count() == 31:
                break
            time.sleep(0.5)
        assert spark.table("pyds_adv_raw").count() == 31
        sizes = [p.numInputRows for p in q.recentProgress if p.numInputRows > 0]
        assert max(sizes) <= 10, f"a trigger drained more than one slice: {sizes}"
    finally:
        q.stop()
