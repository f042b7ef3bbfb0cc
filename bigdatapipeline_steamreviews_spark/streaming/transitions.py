"""Custom stateful streaming operator #2: first-order event transitions
(``applyInPandasWithState``) — the streaming twin of
``operators.analytic.event_transitions``.

Each key's state is its single most recent event (fixed width: unix ts,
event id, event type); every arriving event emits exactly one
(from_state, to_state) step against the key's previous event — across
micro-batch boundaries via the state row — and a key's first-ever event
emits nothing, exactly like the batch lag() formulation.  No timeout is
needed: a transition is sealed by the NEXT event's arrival, so a key
going quiet simply leaves one pending event in state (the batch twin's
final lag partner), never an unemitted output.

Scale notes (100 TB): state is O(active keys) fixed-width rows; the
per-batch work is one vectorized pandas sort + shift per key group,
Arrow-batched.  The downstream count aggregation runs on the tiny
(from, to) state product, not the event volume.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "streaming_transitions",
    "streaming_transitions_disordered",
    "TRANSITION_OUTPUT_SCHEMA",
]

TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_state", T.StringType()),
        T.StructField("to_state", T.StringType()),
    ]
)

# Most recent event per key.  The event id rides along so a total
# (ts, id) order across batches stays available if replay ever delivers
# equal-timestamp events split across micro-batches.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_unix_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Per-key transition steps over a streaming events frame (append mode).

    ``events`` needs (user_id, event_id, ts, event_type).  Emits one row
    per consecutive event pair per key; aggregate the materialized output
    for the transition matrix (counts are exact regardless of micro-batch
    slicing, because the batch-boundary pair is reconstructed from state).

    ORDERING CONTRACT (round-9 displaced-replay audit, mirroring the
    sessionizer's): the state is the single most recent event, so this
    operator requires per-key EVENT-TIME-ORDERED delivery ACROSS
    micro-batches (the staged replay / a user-keyed Kafka partition).
    WITHIN a batch any order is fine (sorted here).  A cross-batch
    straggler is lagged against the WRONG neighbor — the pair it should
    have split survives and a fabricated pair appears (measured: 57
    fabricated of 985 batch pairs at 10% one-chunk displacement —
    ``tests/test_streaming_disorder.py::
    test_transitions_operator_requires_inorder_delivery``).  For
    disordered sources use :func:`streaming_transitions_disordered`.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "event_id"])
        types = rows["event_type"].tolist()
        froms = types[:-1]
        tos = types[1:]
        if state.exists:
            _, _, last_type = state.get
            froms = [last_type] + types[:-1]
            tos = types
        unix_us = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()
        state.update(
            (int(unix_us[-1]), int(rows["event_id"].iloc[-1]), types[-1])
        )
        if froms:
            yield pd.DataFrame(
                {
                    "user_id": pd.array([user_id] * len(froms), dtype="int64"),
                    "from_state": froms,
                    "to_state": tos,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        TRANSITION_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# Pending-event buffer for the disorder-tolerant variant: every event of
# the key whose transition pair the watermark has not yet sealed, sorted
# by (ts, event_id).  O(events within horizon) per key — the same
# state/disorder tradeoff as streaming_sessionize_disordered.
_BUFFER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("unix_us", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("types", T.ArrayType(T.StringType())),
    ]
)


def streaming_transitions_disordered(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Disorder-tolerant transition steps: correct for ANY arrival order
    within the watermark, at the cost of buffering pending events per key.

    ORDERING CONTRACT of the fixed-width twin (round-9 displaced-replay
    audit, mirroring the sessionizer's): :func:`streaming_transitions`
    compresses per-key history to the single most recent event, so a
    cross-batch straggler is lagged against the WRONG neighbor — both the
    pair it should have split and the pair it fabricates are corrupted
    (measured in ``tests/test_streaming_disorder.py``).  This variant
    buffers events instead and seals the pair ``(e_i, e_{i+1})`` only
    when the watermark passes ``e_{i+1}``'s event time — after which
    Spark drops any arrival that could still sort at or before
    ``e_{i+1}`` before the operator sees it.

    Emission rule (deterministic, oracle-expressible): a pair is emitted
    iff ``epoch_ms(to_event.ts) + 1 < final watermark`` — the ``+1``
    makes the armed timeout timestamp and the finalize predicate
    identical, so fire and emit never disagree (same convention as
    :func:`..sessions.streaming_sessionize_disordered`).  The last
    emitted "to" event stays in the buffer as the next pair's lag
    partner, exactly like the fixed-width twin's carried state row.
    """
    import numpy as np

    def finalize(us, ids, types, wm_ms):
        """Seal the ripe prefix of pairs; return (emit_from, emit_to,
        keep_slice_start, next_to_ms or None).  Pair i (1-based "to"
        index) is ripe iff us[i]//1000 + 1 < wm_ms; ripeness is a prefix
        property of the sorted buffer."""
        if len(us) < 2:
            return [], [], 0, None
        to_ms = us[1:] // 1000 + 1
        m = int(np.searchsorted(to_ms, wm_ms, side="left"))
        next_to_ms = int(to_ms[m]) if m < len(to_ms) else None
        if m == 0:
            return [], [], 0, next_to_ms
        return list(types[:m]), list(types[1 : m + 1]), m, next_to_ms

    def steps_df(user_id, froms, tos):
        return pd.DataFrame(
            {
                "user_id": pd.array([user_id] * len(froms), dtype="int64"),
                "from_state": froms,
                "to_state": tos,
            }
        )

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            us, ids, types = (np.asarray(a) for a in state.get)
            us = us.astype("int64")
            ids = ids.astype("int64")
            froms, tos, keep_from, next_to_ms = finalize(us, ids, types, wm_ms)
            state.update(
                (
                    us[keep_from:].tolist(),
                    ids[keep_from:].tolist(),
                    types[keep_from:].tolist(),
                )
            )
            if next_to_ms is not None:
                state.setTimeoutTimestamp(max(next_to_ms, wm_ms + 1))
            if froms:
                yield steps_df(user_id, froms, tos)
            return

        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        new_us = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()
        new_ids = rows["event_id"].to_numpy(dtype="int64")
        new_types = rows["event_type"].to_numpy(dtype=object)
        if state.exists:
            old_us, old_ids, old_types = state.get
            us = np.concatenate([np.asarray(old_us, dtype="int64"), new_us])
            ids = np.concatenate([np.asarray(old_ids, dtype="int64"), new_ids])
            types = np.concatenate(
                [np.asarray(old_types, dtype=object), new_types]
            )
        else:
            us, ids, types = new_us, new_ids, new_types
        order = np.lexsort((ids, us))
        us, ids, types = us[order], ids[order], types[order]
        froms, tos, keep_from, next_to_ms = finalize(us, ids, types, wm_ms)
        # The buffer is never fully drained: the last sealed "to" event
        # (or the sole event) remains as the next pair's lag partner —
        # the disordered analogue of the fixed-width twin keeping its
        # state row forever.
        state.update(
            (
                us[keep_from:].tolist(),
                ids[keep_from:].tolist(),
                types[keep_from:].tolist(),
            )
        )
        if next_to_ms is not None:
            state.setTimeoutTimestamp(max(next_to_ms, wm_ms + 1))
        if froms:
            yield steps_df(user_id, froms, tos)

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy("user_id").applyInPandasWithState(
        fn,
        TRANSITION_OUTPUT_SCHEMA,
        _BUFFER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
