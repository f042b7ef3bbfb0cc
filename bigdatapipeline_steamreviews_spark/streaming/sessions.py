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
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_unix", T.LongType()),
        T.StructField("last_unix", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


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

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def closed(start: int, last: int, n: int, tot: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_unix": [start],
                    "session_end_unix": [last],
                    "duration_s": [last - start],
                    "n_events": [n],
                    "total_value": [tot],
                }
            )

        if state.hasTimedOut:
            start, last, n, tot = state.get
            state.remove()
            yield closed(start, last, n, tot)
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if rows.empty:
            if state.exists:
                start, last, n, tot = state.get
                wm0 = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max((last + gap_seconds) * 1000 + 1, wm0 + 1)
                )
            return
        # ns-normalize first: pandas may hand us datetime64[us] via Arrow.
        unix = (
            rows["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        vals = rows["value"].fillna(0.0).to_numpy()

        # Seed from the open session in state, if any.
        has_open = state.exists
        if has_open:
            start, last, n, tot = state.get
        else:
            start, last, n, tot = 0, None, 0, 0.0

        # Vectorized split: a new session starts where the gap from the
        # previous event (or from the carried-over state) exceeds the gap.
        prev = pd.Series(unix).shift(1)
        if has_open:
            prev.iloc[0] = last
        is_new = (prev.isna() | ((unix - prev) > gap_seconds)).to_numpy()

        out = []
        if has_open and is_new[0]:
            # The batch's first event doesn't extend the open session.
            out.append(closed(start, last, n, tot))
            has_open = False

        sess_ids = is_new.cumsum()  # 1-based run ids within this batch
        n_runs = int(sess_ids[-1])
        for sid in range(1, n_runs + 1):
            m = sess_ids == sid
            s_unix, s_vals = unix[m], vals[m]
            if sid == 1 and has_open:
                # First run continues the open session from state.
                last = int(s_unix[-1])
                n += int(m.sum())
                tot += float(s_vals.sum())
            else:
                start, last = int(s_unix[0]), int(s_unix[-1])
                n, tot = int(m.sum()), float(s_vals.sum())
                has_open = True
            if sid < n_runs:
                # A later in-batch run exists -> this session is closed.
                out.append(closed(start, last, n, tot))
                has_open = False

        # The final run stays open in state, flushed by event-time timeout
        # when the watermark passes last + gap.
        state.update((start, last, n, tot))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max((last + gap_seconds) * 1000 + 1, wm + 1))
        for o in out:
            yield o

    marked = events.withWatermark("ts", watermark)
    return marked.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
