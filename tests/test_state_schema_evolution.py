"""State-SCHEMA evolution across restart (T6 hardening, round-12 verdict
ask #3): ``test_checkpoint_recovery`` proves a SAME-CODE restart resumes
exactly; production streaming's hard case is restarting with CHANGED
state — e.g. adding an aggregate to the sessionizer's open-session
accumulator between deploys.

Spark's contract here (pinned by this test for BOTH state-store
providers, HDFS-backed and RocksDB): ``applyInPandasWithState`` state
schemas are FROZEN into the checkpoint, and a restart whose state struct
added a field fails LOUDLY at the first micro-batch — the
StateSchemaCompatibilityChecker (``spark.sql.streaming.stateStore.
stateSchemaCheck``, default on) compares the new schema against
``<ckpt>/state/0/_metadata/schema`` and raises, rather than
null-initializing the new column or (worse) misreading old fixed-width
rows positionally.  The operational playbook this pins is documented in
DIRTYDATA.md §10: evolve by draining (run old code with availableNow
until state empties), by new-checkpoint backfill, or by migrating to
``transformWithStateInPandas`` (whose value-state encoding supports
additive evolution; its twin here is env-gated on protobuf).

If a Spark upgrade ever makes this succeed instead, the test fails with
instructions to re-document the (then-supported) evolution semantics —
either behavior must be a pinned, written-down contract, never a silent
surprise.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from typing import Any, Iterator, Tuple

import pandas as pd
import pytest

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdatapipeline_steamreviews_spark.queries_streaming import (
    _stage_events_chunks,
)
from bigdatapipeline_steamreviews_spark.streaming.sessions import (
    SESSION_OUTPUT_SCHEMA,
    streaming_sessionize,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    ROCKSDB_PROVIDER,
    events_file_stream,
)

SF_DIR = "/root/testdata/sf0.001"

# V2 state: the V1 accumulator plus one new aggregate (max single-event
# value, quantized) — the "add a metric to the deploy" evolution.
_STATE_SCHEMA_V2 = T.StructType(
    [
        T.StructField("start_unix", T.LongType()),
        T.StructField("last_unix", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_q", T.LongType()),
        T.StructField("max_q", T.LongType()),
    ]
)


def _evolved_sessionize(events: DataFrame, gap_seconds: int = 1800,
                        watermark: str = "30 minutes") -> DataFrame:
    """The sessionizer as a NEW deploy would ship it: identical output
    schema, state struct grown by one field.  Its body never needs to be
    reached — the checkpoint's schema gate throws before the first group
    is fed — but it is a faithful V2 (new field maintained, output
    unchanged) so the test stays honest if evolution ever starts
    succeeding."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, tot, _mx = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_unix": [start],
                    "session_end_unix": [last],
                    "duration_s": [last - start],
                    "n_events": [n],
                    "total_value": [tot / 1e8],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        us = (rows["ts"].astype("int64") // 10**6).to_numpy()
        q = (rows["value"].fillna(0.0) * 1e8).round().astype("int64")
        prev = tuple(state.get) if state.exists else None
        start = prev[0] if prev else int(us.min())
        n = (prev[2] if prev else 0) + len(us)
        tot = (prev[3] if prev else 0) + int(q.sum())
        mx = max(prev[4] if prev else 0, int(q.max()))
        state.update((start, int(us.max()), n, tot, mx))
        state.setTimeoutTimestamp(
            max((int(us.max()) + gap_seconds) * 1000 + 1,
                state.getCurrentWatermarkMs() + 1)
        )
        return

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        _STATE_SCHEMA_V2,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _chunk_files(stage: str) -> list[str]:
    """The staged replay's part files in replay (mtime, then name) order."""
    parts = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet") and f.startswith("part-")
    ]
    return sorted(parts, key=lambda p: (os.path.getmtime(p), p))


def _copy_in(files: list[str], dest: str) -> None:
    for f in files:
        # plain copy (NOT copy2): mtime = copy time, so the sleep really
        # does space the files for the source's mtime-ordered replay —
        # copy2 would preserve the SOURCE mtimes and make the sleep a
        # no-op that merely inherits the stage's own spacing.
        shutil.copy(f, os.path.join(dest, os.path.basename(f)))
        time.sleep(0.05)


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_state_schema_widening_fails_loudly_on_restart(
    spark, tmp_path, provider
):
    staged = _chunk_files(_stage_events_chunks(spark, SF_DIR))
    assert len(staged) >= 3, "replay stage unexpectedly small"
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    ckpt = str(tmp_path / "ckpt")

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    if provider == "rocksdb":
        spark.conf.set(provider_key, ROCKSDB_PROVIDER)
    try:
        # ---- Run 1: V1 sessionizer over the first half of the replay.
        # availableNow drains it; every key's LAST session stays open in
        # the state store — a populated checkpoint, not a vacuous one.
        # File sink, not memory: the memory sink refuses append-mode
        # checkpoint recovery outright ("This query does not support
        # recovering from checkpoint location"), which would fail run 2
        # before the state store is even opened.
        outdir = str(tmp_path / "out")
        _copy_in(staged[: len(staged) // 2], indir)
        q1 = (
            streaming_sessionize(events_file_stream(spark, indir))
            .writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination()
        fed = sum(p.numInputRows for p in q1.recentProgress)
        assert fed > 0, "run 1 processed nothing; state would be empty"

        # ---- Run 2: V2 state struct (one added field), same checkpoint,
        # new input so a micro-batch actually starts.
        _copy_in(staged[len(staged) // 2 :], indir)
        q2 = (
            _evolved_sessionize(events_file_stream(spark, indir))
            .writeStream.format("parquet")
            .option("path", outdir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception) as exc_info:
            q2.awaitTermination()
            pytest.fail(
                "state-schema widening restart SUCCEEDED — Spark now "
                "supports applyInPandasWithState state evolution; "
                "re-document DIRTYDATA.md §10 and pin the null-init "
                "semantics of the new field here instead"
            )
        msg = str(exc_info.value).lower()
        assert "schema" in msg and (
            "compatible" in msg or "match" in msg or "differ" in msg
        ), f"restart failed, but not with the schema gate: {msg[:500]}"
    finally:
        if provider == "rocksdb":
            if prev_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev_provider)
