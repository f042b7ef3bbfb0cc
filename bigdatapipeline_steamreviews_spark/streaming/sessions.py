"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the operator class Spark's built-in streaming
aggregates can't express (session windows with per-key custom state
transitions and event-time timeouts).

Semantics match the batch ``operators.analytic.sessionize`` exactly for
every session the watermark has closed: a session is a maximal run of a
key's events with inter-event gaps <= ``gap_seconds``; it closes (and is
emitted, once, append-mode) when event time advances past its last event
by more than the gap — via a later event (in-batch split) or via the
event-time timeout when the watermark passes ``last_event + gap``.
Sessions still open when the replay drains are never emitted, exactly as
on a live stream.

Scale notes (100 TB):
* State per key is ONE fixed-width row (open-session accumulator), not
  the session's events — state size is O(active keys), independent of
  event volume or session length.
* The per-key work is vectorized pandas (sort + diff + cumsum groupby),
  Arrow-batched across keys; no per-row Python loop.
* The watermark bounds both state retention and output latency: a key
  that goes quiet is flushed by timeout and its state removed.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_sessionize", "SESSION_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_unix", T.LongType()),
        T.StructField("session_end_unix", T.LongType()),
        T.StructField("duration_s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# Open-session accumulator: one fixed-width row per active key.
# total is held in integer 1e-8 units (half-up quantized) so cross-batch
# accumulation is exact and associative — the emitted double is then ONE
# correctly-rounded division, bitwise-reproducible by any engine that sums
# the same quantized integers (the DuckDB oracle does; same recipe as
# operators.similarity.label_centroids).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_unix", T.LongType()),
        T.StructField("last_unix", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_q", T.LongType()),
    ]
)

_Q = 10**8  # 1e-8 quantization unit for exact value accumulation


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sessionize a streaming events frame (append-mode closed sessions).

    ``events`` needs (user_id, event_id, ts, value); the watermark drives
    both late-data tolerance and session-timeout flushing, so it should be
    at least the expected disorder and is naturally ~= the session gap.
    """

    def sessions_df(
        user_id: int, starts: list, lasts: list, ns: list, tots_q: list
    ) -> pd.DataFrame:
        starts_a = np.asarray(starts, dtype="int64")
        lasts_a = np.asarray(lasts, dtype="int64")
        return pd.DataFrame(
            {
                "user_id": np.full(len(starts_a), user_id, dtype="int64"),
                "session_start_unix": starts_a,
                "session_end_unix": lasts_a,
                "duration_s": lasts_a - starts_a,
                "n_events": np.asarray(ns, dtype="int64"),
                # exact int total -> one correctly-rounded double division
                "total_value": np.asarray(tots_q, dtype="int64") / float(_Q),
            }
        )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if state.hasTimedOut:
            start, last, n, tot = state.get
            state.remove()
            yield sessions_df(user_id, [start], [last], [n], [tot])
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if rows.empty:
            if state.exists:
                _, last, _, _ = state.get
                wm0 = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max((last + gap_seconds) * 1000 + 1, wm0 + 1)
                )
            return
        # ns-normalize first: pandas may hand us datetime64[us] via Arrow.
        unix = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        # Half-up quantize each value to integer 1e-8 units: accumulation
        # below is exact int math (associative across batch boundaries).
        vals = np.floor(
            rows["value"].fillna(0.0).to_numpy(dtype="float64") * _Q + 0.5
        ).astype("int64")

        # Seed from the open session in state, if any.
        has_open = state.exists
        if has_open:
            start, last, n, tot = state.get
        else:
            start, last, n, tot = 0, 0, 0, 0

        # Vectorized run split: a session boundary sits wherever the gap
        # from the previous event (or from the carried-over open session)
        # exceeds gap_seconds.  All O(n) numpy, no per-row Python.
        is_new = np.empty(len(unix), dtype=bool)
        is_new[1:] = (unix[1:] - unix[:-1]) > gap_seconds
        is_new[0] = (not has_open) or (unix[0] - last > gap_seconds)

        run_starts = np.flatnonzero(is_new)
        if run_starts.size == 0 or run_starts[0] != 0:
            run_starts = np.insert(run_starts, 0, 0)  # continuation run
        run_last = np.append(run_starts[1:] - 1, len(unix) - 1)
        r_start = unix[run_starts].astype("int64")
        r_end = unix[run_last].astype("int64")
        r_cnt = np.diff(np.append(run_starts, len(unix))).astype("int64")
        r_sum = np.add.reduceat(vals, run_starts)

        c_starts: list = []
        c_lasts: list = []
        c_ns: list = []
        c_tots: list = []
        if has_open:
            if is_new[0]:
                # The batch's first event doesn't extend the open session.
                c_starts.append(start); c_lasts.append(last)
                c_ns.append(n); c_tots.append(tot)
            else:
                # First run continues the open session from state.
                r_start[0] = start
                r_cnt[0] += n
                r_sum[0] += tot

        # Every run but the last is closed by the run after it.
        if len(run_starts) > 1:
            c_starts.extend(r_start[:-1].tolist())
            c_lasts.extend(r_end[:-1].tolist())
            c_ns.extend(r_cnt[:-1].tolist())
            c_tots.extend(r_sum[:-1].tolist())

        # The final run stays open in state, flushed by event-time timeout
        # when the watermark passes last + gap.
        start, last = int(r_start[-1]), int(r_end[-1])
        n, tot = int(r_cnt[-1]), int(r_sum[-1])
        state.update((start, last, n, tot))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last + gap_seconds) * 1000 + 1, wm + 1))
        if c_starts:
            yield sessions_df(user_id, c_starts, c_lasts, c_ns, c_tots)

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
