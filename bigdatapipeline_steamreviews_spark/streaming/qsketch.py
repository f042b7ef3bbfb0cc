"""Streaming quantile-sketch maintenance (round-14 verdict ask #3):
the a23 hash-ordered bottom-k pool (``operators/sketches.py``) kept
current as STREAMING STATE — quantiles' analogue of the HLL register
maintenance twin (``stream_hll_distinct_users``).

Why this is exact: the pool is bottom-k by the deterministic row hash
(hv, v), and bottom-k is a one-way-mergeable monotone summary —
``bottom_k(bottom_k(A) ∪ B) == bottom_k(A ∪ B)`` for ANY split of the
corpus into micro-batches, in any arrival order.  So the state after
the replay drains is the SAME k rows, bitwise, as the batch
``qsk_pool`` over the whole corpus, and the registered query
(``stream_quantile_sketch``) gates against the SAME DuckDB oracle as
the batch sketch (``a23``) — final state == batch sketch is the driver
hash match itself, not a separate assertion.

Unlike HLL (whose merge is a built-in ``max`` groupBy-agg), bottom-k
has no incremental built-in aggregate, so the state rides a custom
stateful operator (``applyInPandasWithState``, the transitions/
sessionization pattern): per group the state is the current pool —
FIXED WIDTH, <= k (hv, v) pairs plus a row counter — and each
micro-batch merges its arrivals with one vectorized lexsort-and-slice.
No timeout is needed: the pool is correct after every batch, not
sealed by time.

Emission protocol: every invocation emits the group's full current
pool stamped with ``n_seen`` (total rows absorbed — strictly monotone
per group, since empty invocations return early), so the memory-sink
trace is a history of pool versions and "the final state" is selected
as each group's max-``n_seen`` emission — deterministic, no
last-batch-id bookkeeping.

Scale (100 TB): state is O(groups * k) fixed-width — the same constant
budget as the batch sketch's WindowGroupLimit shuffle bound; per-batch
work is one O((k + b) log(k + b)) sort per ACTIVE group, Arrow-batched.
The emission is k rows per active group per trigger; a production sink
would subscribe to just the latest version, exactly what the final
selection here does.  The hash arrives JVM-computed (the select below
uses the shared md5 recipe), so the Python hop never re-hashes.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import QSK_K, qsk_hash

__all__ = ["streaming_qsk_pools", "QSK_POOL_OUTPUT_SCHEMA"]

QSK_POOL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("hv", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)

# The pool, columnar: <= k hashes + values, plus the absorbed-row count.
_QSK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hv", T.ArrayType(T.LongType())),
        T.StructField("v", T.ArrayType(T.DoubleType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_qsk_pools(events: DataFrame, k: int = QSK_K) -> DataFrame:
    """Per-``event_type`` bottom-k pools over a streaming events frame
    (update mode).  Input needs (event_type, event_id, value); NULL
    values/ids are excluded exactly as in the batch ``qsk_pool``
    (a NULL id cannot be hashed deterministically; a quantile over
    NULLs is undefined).  NULL event_type is a GROUP, as in batch."""
    src = events.filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    ).select(
        "event_type",
        qsk_hash(F.col("event_id")).alias("hv"),
        F.col("value").cast("double").alias("v"),
    )

    def merge_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        rows = pd.concat(list(pdfs))
        if rows.empty:
            return
        hv = rows["hv"].to_numpy(dtype="int64")
        v = rows["v"].to_numpy(dtype="float64")
        n_seen = len(rows)
        if state.exists:
            old_hv, old_v, old_n = state.get
            hv = np.concatenate([np.asarray(old_hv, dtype="int64"), hv])
            v = np.concatenate([np.asarray(old_v, dtype="float64"), v])
            n_seen += int(old_n)
        # bottom-k by (hv, v) — the batch pool's exact tie order, so the
        # kept VALUE multiset matches even under 60-bit hash collisions
        keep = np.lexsort((v, hv))[:k]
        hv, v = hv[keep], v[keep]
        state.update((hv.tolist(), v.tolist(), n_seen))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(hv),
                "n_seen": pd.array([n_seen] * len(hv), dtype="int64"),
                "hv": hv,
                "v": v,
            }
        )

    return src.groupBy("event_type").applyInPandasWithState(
        merge_fn,
        QSK_POOL_OUTPUT_SCHEMA,
        _QSK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
