"""Custom stateful streaming operator #3: per-key exponentially-weighted
moving average (``applyInPandasWithState``) — numeric state evolution,
complementing the sessionizer (interval state) and the transition
operator (categorical state).

Each key's state is its running EWMA and observation count; every
arriving event folds ``ewma = 0.5·value + 0.5·ewma`` (first observation
seeds the fold with the raw value) in (ts, event_id) order, emitting the
updated running value per event.  α = 0.5 is a power of two, so each
step is two exact halvings and one rounded addition — the SAME IEEE
double sequence in any engine that folds in the same order, which is
what lets the DuckDB oracle (``list_reduce`` over the identically-
ordered value list) hash-match the final state bitwise.

The per-key fold is a scalar loop in the Python worker — a linear
recurrence is inherently sequential, and this honesty is the operator's
point (the batch closed-form ``Σ 0.5^(n-i)·x_i`` sums in a different
order and is NOT bit-identical).  At scale the loop is O(events) scalar
ops Arrow-batched per key group; the C-loop production path
(``scipy.signal.lfilter``, same recurrence, same rounding) drops in
behind the identical state contract when the container has scipy.

Equal-timestamp events never split across micro-batches here (the
replay stages chunk on timestamp VALUE boundaries), so the in-batch
(ts, event_id) sort reproduces the global fold order without carrying
the last-seen key in state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_ewma", "EWMA_OUTPUT_SCHEMA"]

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_ewma(events: DataFrame) -> DataFrame:
    """Running per-key EWMA over a streaming events frame (append mode).

    ``events`` needs (user_id, event_id, ts, value); rows with NULL
    value must be filtered out upstream (a NULL cannot fold).  Emits one
    row per event with the post-update running value and count; the last
    row per key (max ``n_seen``) is the key's final state and equals the
    batch ``list_reduce`` fold over the same ordered values.
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
        if state.exists:
            ewma, n = state.get
            ewma, n = float(ewma), int(n)
        else:
            ewma, n = None, 0
        out_ids: list[int] = []
        out_ewma: list[float] = []
        out_n: list[int] = []
        for eid, v in zip(rows["event_id"], rows["value"]):
            v = float(v)
            ewma = v if ewma is None else 0.5 * v + 0.5 * ewma
            n += 1
            out_ids.append(int(eid))
            out_ewma.append(ewma)
            out_n.append(n)
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            {
                "user_id": pd.array([user_id] * len(out_ids), dtype="int64"),
                "event_id": pd.array(out_ids, dtype="int64"),
                "ewma": pd.array(out_ewma, dtype="float64"),
                "n_seen": pd.array(out_n, dtype="int64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        EWMA_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
