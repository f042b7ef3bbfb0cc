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


def test_stream_advance_offset_never_regresses_after_restart():
    """Checkpointed-restart simulation: a fresh reader (driver memory
    reset, _pos=0) handed the committed offset through partitions() or
    commit() must clamp forward — latestOffset regressing below the
    committed offset produces dead triggers until it re-advances."""
    # First incarnation (Spark calls initialOffset on a true first
    # start) advances three triggers.
    r1 = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "8",
         "advance_per_trigger": "true"}
    )
    r1.initialOffset()
    offs = [r1.latestOffset() for _ in range(3)]
    assert offs[-1] == {"row": 24}

    # Restart: new instance, Spark re-plans the last uncommitted range
    # from its offset log before asking for new data.
    r2 = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "8",
         "advance_per_trigger": "true"}
    )
    r2.partitions({"row": 16}, {"row": 24})
    assert r2.latestOffset() == {"row": 31}  # 24 + 8 clamped to EOF, not 8

    # commit() alone must clamp too.
    r3 = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "8",
         "advance_per_trigger": "true"}
    )
    r3.commit({"row": 24})
    assert r3.latestOffset()["row"] > 24


def test_stream_advance_latest_offset_first_restart_fast_forwards():
    """The restart path the API can't clamp eagerly (the runner protocol
    feeds no offset into latestOffset): Spark recovers offsets from its
    checkpoint, skips initialOffset(), and asks latestOffset() first.
    The reader detects that shape (no initialOffset call) and doubles
    the advance step per trigger until a planned batch lands — the dead
    window is O(log committed), not O(committed / rows_per_batch)."""
    # Fresh start: initialOffset() seen -> plain per-trigger pacing.
    r0 = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "4",
         "advance_per_trigger": "true"}
    )
    r0.initialOffset()
    assert [r0.latestOffset()["row"] for _ in range(3)] == [4, 8, 12]

    # Restart: no initialOffset() -> geometric catch-up (4, +8, +16 -> 28
    # passes a committed offset of 24 in 3 triggers, not 6).
    r1 = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "4",
         "advance_per_trigger": "true"}
    )
    offs = [r1.latestOffset()["row"] for _ in range(3)]
    assert offs == [4, 12, 28]
    # First planned batch resets pacing to rows_per_batch.
    r1.partitions({"row": 24}, {"row": 28})
    assert r1.latestOffset()["row"] == 31  # 28 + 4 clamped to EOF


def test_stream_read_uses_parse_cache():
    """A drain splits into many range partitions; the file must be parsed
    once per (path, mtime), not once per partition."""
    from unittest import mock

    from bigdatapipeline_steamreviews_spark.sources import pyds

    pyds._PARSE_CACHE.clear()
    reader = _ReviewStreamReader(
        {"path": REVIEWS_FIXTURE, "rows_per_batch": "4"}
    )
    parts = reader.partitions({"row": 0}, reader.latestOffset())
    assert len(parts) == 8
    with mock.patch.object(
        pyds, "_read_file", wraps=pyds._read_file
    ) as spy:
        total = sum(b.num_rows for p in parts for b in reader.read(p))
        assert total == 31
        # One parse for the whole drain (the first read fills the cache);
        # __init__'s driver-side row count deliberately does NOT cache —
        # it would pin the full Arrow table in driver memory for the
        # process lifetime just to read .num_rows.
        assert spy.call_count == 1
