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

__all__ = ["streaming_ewma", "streaming_ewma_disordered", "EWMA_OUTPUT_SCHEMA"]

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

    ORDERING CONTRACT (round-9 displaced-replay audit): the ``(ewma, n)``
    state cannot be rewound, so this operator requires per-key
    EVENT-TIME-ORDERED delivery ACROSS micro-batches; a cross-batch
    straggler folds out of order and every later running value of the key
    diverges from the (ts, event_id)-ordered fold (measured: 15/15 users'
    final fold diverged at 10% one-chunk displacement —
    ``tests/test_streaming_disorder.py::
    test_ewma_operator_requires_inorder_delivery``).  For disordered
    sources use :func:`streaming_ewma_disordered`.
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


# Disorder-tolerant variant state: the fold result over the FINALIZED
# prefix (exact, order-settled) plus a sorted pending buffer the
# watermark has not yet sealed.
_BUFFER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("unix_us", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def streaming_ewma_disordered(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Disorder-tolerant running EWMA: correct for ANY arrival order
    within the watermark, at the cost of buffering unsealed events.

    ORDERING CONTRACT of the fixed-width twin (round-9 displaced-replay
    audit): :func:`streaming_ewma` folds a linear recurrence whose state
    ``(ewma, n)`` cannot be rewound, so a cross-batch straggler is folded
    AFTER values it should precede — every subsequent running value of
    that key diverges from the (ts, event_id)-ordered fold (measured in
    ``tests/test_streaming_disorder.py``).  This variant buffers events
    and folds an event into the carried accumulator only once the
    watermark passes its event time — after which Spark drops any arrival
    that could still sort at or before it.

    Emission rule (deterministic, oracle-expressible): an event's
    trajectory row is emitted iff ``epoch_ms(ts) + 1 < final watermark``;
    the ``+1`` makes the armed timeout and the finalize predicate the
    same (sessionizer convention).  Sealed rows carry the EXACT fold the
    batch ``list_reduce`` oracle produces — alpha = 1/2, two exact
    halvings + one rounded add per step, in settled global order, so the
    hash match is bitwise.
    """
    import numpy as np

    def out_df(user_id, ids, ewmas, ns):
        return pd.DataFrame(
            {
                "user_id": pd.array([user_id] * len(ids), dtype="int64"),
                "event_id": pd.array(ids, dtype="int64"),
                "ewma": pd.array(ewmas, dtype="float64"),
                "n_seen": pd.array(ns, dtype="int64"),
            }
        )

    def finalize(ewma, n, us, ids, vals, wm_ms):
        """Fold the ripe prefix (epoch_ms + 1 < wm_ms) into the carried
        accumulator; return (emit lists, new_scalar_state, kept arrays,
        next_ms or None)."""
        ev_ms = us // 1000 + 1
        m = int(np.searchsorted(ev_ms, wm_ms, side="left"))
        next_ms = int(ev_ms[m]) if m < len(ev_ms) else None
        if m == 0:
            return None, (ewma, n), (us, ids, vals), next_ms
        out_ids, out_ewma, out_n = [], [], []
        for eid, v in zip(ids[:m], vals[:m]):
            v = float(v)
            ewma = v if n == 0 else 0.5 * v + 0.5 * ewma
            n += 1
            out_ids.append(int(eid))
            out_ewma.append(ewma)
            out_n.append(n)
        return (
            (out_ids, out_ewma, out_n),
            (ewma, n),
            (us[m:], ids[m:], vals[m:]),
            next_ms,
        )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            ewma0, n0, us, ids, vals = state.get
            us = np.asarray(us, dtype="int64")
            ids = np.asarray(ids, dtype="int64")
            vals = np.asarray(vals, dtype="float64")
            emit, (ewma, n), (ku, ki, kv), next_ms = finalize(
                float(ewma0), int(n0), us, ids, vals, wm_ms
            )
            state.update((float(ewma), int(n), ku.tolist(), ki.tolist(), kv.tolist()))
            if next_ms is not None:
                state.setTimeoutTimestamp(max(next_ms, wm_ms + 1))
            if emit:
                yield out_df(user_id, *emit)
            return

        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        new_us = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()
        new_ids = rows["event_id"].to_numpy(dtype="int64")
        new_vals = rows["value"].to_numpy(dtype="float64")
        if state.exists:
            ewma0, n0, old_us, old_ids, old_vals = state.get
            ewma0, n0 = float(ewma0), int(n0)
            us = np.concatenate([np.asarray(old_us, dtype="int64"), new_us])
            ids = np.concatenate([np.asarray(old_ids, dtype="int64"), new_ids])
            vals = np.concatenate([np.asarray(old_vals, dtype="float64"), new_vals])
        else:
            ewma0, n0 = 0.0, 0
            us, ids, vals = new_us, new_ids, new_vals
        order = np.lexsort((ids, us))
        us, ids, vals = us[order], ids[order], vals[order]
        emit, (ewma, n), (ku, ki, kv), next_ms = finalize(
            ewma0, n0, us, ids, vals, wm_ms
        )
        state.update((float(ewma), int(n), ku.tolist(), ki.tolist(), kv.tolist()))
        if next_ms is not None:
            state.setTimeoutTimestamp(max(next_ms, wm_ms + 1))
        if emit:
            yield out_df(user_id, *emit)

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy("user_id").applyInPandasWithState(
        fn,
        EWMA_OUTPUT_SCHEMA,
        _BUFFER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
