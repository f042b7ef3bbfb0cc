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

__all__ = ["streaming_transitions", "TRANSITION_OUTPUT_SCHEMA"]

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
