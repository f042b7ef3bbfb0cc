"""Round-9 displaced-replay disorder audit (r8 verdict Next #1): the two
remaining stateful streaming operators — first-order transitions
(last-event state) and the EWMA fold ((ewma, n) state) — have exactly the
in-order delivery contract the round-8 sessionizer audit exposed.  This
file does for them what test_streaming_sessions.py did for the
sessionizer:

* PIN the contract with a divergence-MUST-exist test: under cross-batch
  displacement the fixed-width operators produce output the batch oracle
  does not — if either test ever finds zero divergence, the operator
  became disorder-tolerant and the contract text should be revisited;
* prove the buffered ``_disordered`` twins exact under the same disorder
  (their registered queries are additionally DuckDB-oracle-gated in the
  driver sweeps — stream_transitions_disordered / stream_user_ewma_
  disordered; here we assert the batch-subset property directly).

The displaced stage is the shared registry staging
(queries_streaming._stage_events_chunks_displaced): 4 time chunks, a
content-hash-selected 10% of events arriving one chunk late with event
time UNCHANGED.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.queries_streaming import (
    _stage_events_chunks_displaced,
)
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from bigdatapipeline_steamreviews_spark.streaming.ewma import (
    streaming_ewma,
    streaming_ewma_disordered,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
    events_file_stream,
    run_to_memory_table,
)
from bigdatapipeline_steamreviews_spark.streaming.transitions import (
    streaming_transitions,
    streaming_transitions_disordered,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def displaced(spark):
    return _stage_events_chunks_displaced(spark, SF_DIR)


def _batch_pairs(spark):
    """Multiset of (user, from, to) per the batch lag() chain."""
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    rows = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_state"),
            F.col("event_type").alias("to_state"),
        )
        .filter(F.col("from_state").isNotNull())
        .groupBy("user_id", "from_state", "to_state")
        .count()
        .collect()
    )
    return {(r.user_id, r.from_state, r.to_state): r["count"] for r in rows}


def test_transitions_operator_requires_inorder_delivery(spark, displaced):
    """Contract pin: the last-event-state operator fabricates pairs under
    cross-batch displacement (a straggler lags against the wrong
    neighbor).  Divergence from the batch chain MUST exist."""
    stage, _ = displaced
    stream = events_file_stream(spark, stage, max_files_per_trigger=1).filter(
        F.col("event_type").isNotNull()
    )
    got = run_to_memory_table(
        streaming_transitions(stream),
        "trans_contract",
        tempfile.mkdtemp(prefix="ck_"),
        "append",
    ).collect()
    streamed: dict = {}
    for r in got:
        k = (r.user_id, r.from_state, r.to_state)
        streamed[k] = streamed.get(k, 0) + 1
    batch = _batch_pairs(spark)
    fabricated = sum(
        n - batch.get(k, 0) for k, n in streamed.items() if n > batch.get(k, 0)
    )
    assert fabricated > 0, (
        "displaced replay produced the exact batch pair multiset — the "
        "operator became disorder-tolerant; revisit the contract docs"
    )


def test_transitions_disordered_is_exact_under_displacement(spark, displaced):
    """The buffered twin under the same disorder: every emitted pair is a
    batch-chain pair (no fabrication), pairs are never over-counted, and
    the watermark-passed prefix is nonempty."""
    stage, wm_days = displaced
    stream = events_file_stream(spark, stage, max_files_per_trigger=1).filter(
        F.col("event_type").isNotNull()
    )
    got = run_to_memory_table(
        streaming_transitions_disordered(stream, watermark=f"{wm_days} days"),
        "trans_disordered",
        tempfile.mkdtemp(prefix="ck_"),
        "append",
    ).collect()
    streamed: dict = {}
    for r in got:
        k = (r.user_id, r.from_state, r.to_state)
        streamed[k] = streamed.get(k, 0) + 1
    batch = _batch_pairs(spark)
    assert len(got) > 0
    for k, n in streamed.items():
        assert k in batch, f"fabricated pair: {k}"
        assert n <= batch[k], f"over-counted pair: {k} ({n} > {batch[k]})"


def _batch_ewma(spark):
    """Final (ewma, n) per user via the batch closed fold: collect the
    (ts, event_id)-ordered values and fold 0.5*x + 0.5*acc in Python —
    the same IEEE sequence as the operator."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .collect()
    )
    out = {}
    for r in rows:
        acc = None
        for s in r.seq:
            v = float(s.value)
            acc = v if acc is None else 0.5 * v + 0.5 * acc
        out[r.user_id] = (acc, len(r.seq))
    return out


def test_ewma_operator_requires_inorder_delivery(spark, displaced):
    """Contract pin: the (ewma, n) fold cannot be rewound, so a straggler
    folds out of order and final per-user values diverge from the
    (ts, event_id)-ordered fold.  Divergence MUST exist."""
    stage, _ = displaced
    stream = events_file_stream(spark, stage, max_files_per_trigger=1).filter(
        F.col("value").isNotNull()
    )
    got = run_to_memory_table(
        streaming_ewma(stream),
        "ewma_contract",
        tempfile.mkdtemp(prefix="ck_"),
        "append",
    ).collect()
    final = {}
    for r in got:
        if r.user_id not in final or r.n_seen > final[r.user_id][1]:
            final[r.user_id] = (r.ewma, r.n_seen)
    batch = _batch_ewma(spark)
    diverged = sum(
        1
        for uid, (ewma, n) in final.items()
        if batch.get(uid) != (ewma, n)
    )
    assert diverged > 0, (
        "displaced replay reproduced the ordered fold bitwise — the "
        "operator became disorder-tolerant; revisit the contract docs"
    )


def test_ewma_disordered_is_exact_under_displacement(spark, displaced):
    """The buffered twin: every sealed trajectory value equals the
    ordered-prefix fold BITWISE (the per-user last sealed row is a prefix
    of the batch fold's intermediate states)."""
    stage, wm_days = displaced
    stream = events_file_stream(spark, stage, max_files_per_trigger=1).filter(
        F.col("value").isNotNull()
    )
    got = run_to_memory_table(
        streaming_ewma_disordered(stream, watermark=f"{wm_days} days"),
        "ewma_disordered",
        tempfile.mkdtemp(prefix="ck_"),
        "append",
    ).collect()
    # Recompute every intermediate fold state per user, then check each
    # emitted (event's position n_seen -> running value) against it.
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    rows = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .collect()
    )
    traj = {}
    for r in rows:
        acc = None
        states = []
        for s in r.seq:
            v = float(s.value)
            acc = v if acc is None else 0.5 * v + 0.5 * acc
            states.append((int(s.event_id), acc))
        traj[r.user_id] = states
    assert len(got) > 0
    for r in got:
        eid, expected = traj[r.user_id][r.n_seen - 1]
        assert r.event_id == eid, (
            f"user {r.user_id} step {r.n_seen}: sealed event {r.event_id}, "
            f"ordered fold has {eid}"
        )
        assert r.ewma == expected  # bitwise
