"""Analytic-window and temporal-join operators.

The reference has **no** analytic window functions and no joins of any kind
(SURVEY.md §2.5) — but its serving layer's upsert/rollup queries are one
step away from them, and any production deployment of this pipeline needs
them (session analysis over the review stream, trailing-window metrics for
the dashboard, point-in-time enrichment of events with the latest known
entity state).  Each operator here is a pure DataFrame composition — no
UDFs, whole-stage codegen end-to-end.

Scale notes (100 TB):
* Every window function here partitions by a key (`user_id`, group key)
  before ordering — one shuffle on the key, then per-partition sort.  A
  global `ORDER BY` window (no partition) is only used over *already
  aggregated* inputs (daily rollups: thousands of rows, one task is fine).
* `as_of_join` is the union-tag algorithm: tag both sides, one shuffle on
  the key, one per-key sort, one `last(ignorenulls)` carry-forward.  This
  is O(n log n) per key and never materializes the O(events × orders)
  range-join product a naive `ts >= o_ts` join would.
* `range_join_count` keeps an equality key in the join so Spark plans a
  hash/sort-merge join on the key with the range as a cheap residual
  filter — never a broadcast-nested-loop over the cross product.
* Rolling frames accumulate in exact DECIMAL, so results are identical
  under any partitioning (see functions.columns.sum_exact rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..caching import persisted_intermediate

__all__ = [
    "event_deltas",
    "sessionize",
    "session_stats",
    "rolling_frame_avg",
    "nearest_rank_percentiles",
    "as_of_join",
    "range_join_count",
    "gap_fill_forward",
    "rolling_zscore",
    "event_transitions",
    "equi_width_histogram",
    "pareto_frontier_2d",
    "interval_peak_concurrency",
]

_ACC_DECIMAL = "decimal(28,10)"


def _dec_to_double(c: Column) -> Column:
    # Correctly-rounded decimal->double (see functions.columns._dec_to_double).
    return c.cast("string").cast("double")


def event_deltas(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """lag/lead over a per-key event timeline: previous-event gap in seconds
    and the next event's id.  The (ts, id) ordering is a total order, so
    results are deterministic under any partitioning.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    unix = F.unix_timestamp(F.col(ts_col))
    prev_unix = F.unix_timestamp(F.lag(ts_col).over(w))
    return events.select(
        key_col,
        id_col,
        unix.alias("event_unix"),
        prev_unix.alias("prev_unix"),
        (unix - prev_unix).alias("gap_s"),
        F.lead(id_col).over(w).alias("next_event_id"),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds`` (or there is none).
    Adds ``session_id`` = running count of session starts per key — the
    classic lag + cumulative-sum formulation, two window passes over one
    shuffle (both windows share the same partitioning and ordering, so
    Catalyst plans a single exchange + sort).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    unix = F.unix_timestamp(F.col(ts_col))
    prev_unix = F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(
        prev_unix.isNull() | ((unix - prev_unix) > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(running))


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates over the sessionized stream: bounds, length,
    event count, and an exact-decimal value sum."""
    s = sessionize(events, gap_seconds, key_col, ts_col, id_col)
    unix = F.unix_timestamp(F.col(ts_col))
    return s.groupBy(key_col, "session_id").agg(
        F.min(unix).alias("session_start_unix"),
        F.max(unix).alias("session_end_unix"),
        (F.max(unix) - F.min(unix)).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
        _dec_to_double(F.sum(F.col(value_col).cast(_ACC_DECIMAL))).alias(
            "total_value"
        ),
    )


def rolling_frame_avg(
    daily: DataFrame,
    order_col: str,
    value_col: str,
    preceding: int = 6,
    out_col: str = "rolling_avg",
) -> DataFrame:
    """Trailing-window mean over an ordered (already-aggregated) series:
    ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW.  Accumulates in
    exact DECIMAL so the frame sum is order-exact, then one double divide.

    Unpartitioned global window — correct only over small aggregated
    inputs (e.g. one row per day).  For per-key trailing metrics at scale,
    add ``partitionBy`` keys (same frame, sharded by key).
    """
    # A row with a NULL ordering key has no position in the series (and
    # its frame slot is engine-dependent: Spark sorts NULLS FIRST, DuckDB
    # NULLS LAST — which also shifts every neighboring frame).
    daily = daily.filter(F.col(order_col).isNotNull())
    w = (
        Window.orderBy(order_col)
        .rowsBetween(-preceding, Window.currentRow)
    )
    frame_sum = _dec_to_double(F.sum(F.col(value_col).cast(_ACC_DECIMAL)).over(w))
    frame_n = F.count(F.lit(1)).over(w)
    return daily.withColumn(out_col, frame_sum / frame_n)


def nearest_rank_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact nearest-rank percentiles per group: the value at
    ``row_number == ceil(p * n)`` under (value, tiebreak) order.

    Nearest-rank (no interpolation) keeps the result an actual data value —
    bit-exact in every engine, unlike interpolated percentile_cont whose
    float blend can differ in the last ulp.  One shuffle (the window) +
    one partial-aggregatable groupBy.

    NULL measures are EXCLUDED before ranking (the SQL aggregate
    convention — percentile_cont/disc ignore NULLs), so ``n`` counts
    scoreable rows only.  Without the filter, rank semantics silently
    depend on the engine's null sort order (Spark ascends NULLS FIRST,
    DuckDB NULLS LAST — the round-6 null-injection audit caught the
    divergence); groups that are entirely NULL vanish rather than
    reporting undefined percentiles.
    """
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_col, tiebreak_col)
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__rn") == F.ceil(F.lit(p) * F.col("__n")), F.col(value_col)
            )
        ).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    return ranked.groupBy(*group_cols).agg(
        *aggs, F.max("__n").alias("n_rows")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks up ``carry_cols`` from the right row
    with the greatest ``right_ts <= left_ts`` for the same key (point-in-
    time enrichment; Spark has no builtin for this).  With
    ``direction="forward"``, the SMALLEST ``right_ts >= left_ts`` instead
    (next-event lookup: first shipment after an order, next price tick).

    Union-tag algorithm: tag right rows 0 and left rows 1, sort each key's
    timeline by (ts, tag) — descending for forward — and carry the latest
    right ROW forward with ``last(struct(...), ignorenulls=True)``.  Right
    rows sort before left rows at equal timestamps in either direction, so
    an exactly-simultaneous right row IS visible to the left row (<= / >=
    semantics).  One shuffle on the key, one sort — never the O(|L|·|R|)
    product of a naive range join.

    NULL semantics match SQL ASOF JOIN (the null-injection audit's
    finding): a right row with a NULL ``right_ts`` OR a NULL ``key`` is
    excluded (neither temporally placeable nor equi-matchable — without
    the key filter the union-tag window would group NULL keys together
    and "match" them, which SQL join semantics never do); the carry is
    ROW-wise — the as-of row's values are taken even when some are NULL
    (per-COLUMN ``last(ignorenulls)`` would stitch values from different
    rows); a left row with NULL ``left_ts`` or NULL ``key`` matches
    nothing and keeps NULL carries (left rows are always emitted).

    The right side must be unique per (key, right_ts) — pre-compact it
    (e.g. keyed max-struct) or the carried values are nondeterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r_tagged = right.filter(
        F.col(right_ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in carry_cols]).alias("__carry"),
    )
    carry_type = r_tagged.schema["__carry"].dataType
    l_tagged = left.select(
        "*",
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(carry_type).alias("__carry"),
    )
    unioned = l_tagged.select(r_tagged.columns + left.columns).unionByName(
        r_tagged.select("*", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns])
    )
    order = (
        [F.col("__ts").asc(), F.col("__tag").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__tag").asc()]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left.columns,
        F.col("__tag"),
        F.col("__ts"),
        F.last("__carry", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col("__tag") == 1).select(
        *left.columns,
        *[
            F.when(F.col("__ts").isNotNull(), F.col("__c").getField(c)).alias(c)
            for c in carry_cols
        ],
    )


def gap_fill_forward(
    series: DataFrame,
    time_col: str,
    value_cols: list[str],
    step: str = "interval 1 day",
) -> DataFrame:
    """Densify a sparse time series onto a complete calendar spine and
    forward-fill missing values (classic time-series gap fill; Spark has
    no builtin).

    The spine is ``sequence(min(t), max(t), step)`` exploded — built from
    a 1-row aggregate, so the join back to the data is a broadcast.  Rows
    absent from the input get ``is_gap = 1`` and carry the last observed
    value forward via ``last(ignorenulls=True)`` over an unpartitioned
    ordered window.

    Scale note: the unpartitioned window is safe because a gap-fill input
    is an already-aggregated series (one row per period — thousands of
    rows for decades of days).  For per-key gap fill at scale, aggregate
    per key first and add the key to both the spine (cross join keys ×
    periods) and the window's ``partitionBy``.
    """
    bounds = series.agg(
        F.min(time_col).alias("__lo"), F.max(time_col).alias("__hi")
    )
    spine = bounds.select(
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(time_col)
    )
    filled = spine.join(series, time_col, "left")
    w = Window.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = filled.withColumn(
        "is_gap", F.when(F.col(value_cols[0]).isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling_zscore(
    series: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    preceding: int = 6,
    threshold: float = 2.0,
) -> DataFrame:
    """Trailing-frame z-score anomaly flag over an ordered per-group series.

    Moments are exact: each value is quantized to integer micro-units
    (``round(x * 1e6)`` — a fixed-shape double op, deterministic), and the
    frame accumulates Σv and Σv² in integer/DECIMAL arithmetic (the v²
    term widened to DECIMAL(38,0) BEFORE the multiply — int64 would wrap
    silently in Spark while DuckDB promotes, the w9 time-weighted-average
    lesson).  Casting the *raw* doubles (or their squares) to DECIMAL
    would NOT be portable: double→decimal rounding of arbitrary doubles
    is engine-dependent at the 10th digit, and the E[x²]−E[x]² subtraction
    amplifies that ulp into ~1e-13 z-score divergence (measured).  The
    z-score is scale-invariant, so it is computed entirely in micro-units;
    only ``frame_mean`` converts back.  A variance guard nulls the z-score
    for (near-)constant frames instead of emitting ±inf/NaN.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col).rowsBetween(
        -preceding, Window.currentRow
    )
    x = F.col(value_col)
    vq = F.round(x * F.lit(1e6)).cast("long")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(vq).over(w).cast("double")
    sq = (
        F.sum(vq.cast("decimal(38,0)") * vq)
        .over(w)
        .cast("string")
        .cast("double")
    )
    mean_q = s / n
    var_q = sq / n - mean_q * mean_q
    z = F.when(var_q > F.lit(0.5), (vq.cast("double") - mean_q) / F.sqrt(var_q))
    return series.select(
        *group_cols,
        order_col,
        x.alias(value_col),
        n.alias("frame_n"),
        (mean_q / F.lit(1e6)).alias("frame_mean"),
        z.alias("zscore"),
        F.when(F.abs(z) > F.lit(threshold), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_anomaly"
        ),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-key event sequences:
    for every observed (previous state → state) step, the count and the
    conditional probability P(to | from).

    One shuffle (the lag window on the key), then a partial-aggregatable
    groupBy on the tiny (from, to) state product.  The probability is a
    single double division of two exact BIGINT counts — deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    steps = events.select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_from = Window.partitionBy("from_state")
    return counts.select(
        "*",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_from).cast("double")
        ).alias("p_transition"),
    )


def equi_width_histogram(
    df: DataFrame, value_col: str, width: float
) -> DataFrame:
    """Equi-width histogram with cumulative counts: bucket id
    (``floor(x / width)``), bounds, count, exact value sum, share of total,
    and a running CDF over bucket order.

    The bucketing is a map-side projection feeding a partial-aggregatable
    groupBy on a small key space; the share/CDF windows run over the
    already-aggregated bucket rows (hundreds, one task).  All doubles
    come from exact BIGINT/DECIMAL accumulators through fixed-shape
    expressions.
    """
    # A histogram describes the non-null values: a NULL measure has no
    # bucket, and carrying a NULL bucket row makes the CDF's ORDER BY
    # engine-dependent (NULLS FIRST vs LAST — null-injection audit).
    df = df.filter(F.col(value_col).isNotNull())
    bucket = F.floor(F.col(value_col) / F.lit(width)).cast("bigint")
    agg = df.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_to_double(F.sum(F.col(value_col).cast(_ACC_DECIMAL))).alias("value_sum"),
    )
    w_all = Window.partitionBy()
    w_cdf = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "bucket",
        (F.col("bucket") * F.lit(width)).alias("lo"),
        ((F.col("bucket") + 1) * F.lit(width)).alias("hi"),
        "n",
        "value_sum",
        (F.col("n").cast("double") / F.sum("n").over(w_all).cast("double")).alias(
            "share"
        ),
        F.sum("n").over(w_cdf).alias("cum_n"),
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left_lo: Column,
    ts_left_hi: Column,
    ts_right: str,
) -> DataFrame:
    """Banded range join: right rows with ``ts in [lo, hi)`` per left row,
    counted.  The equality key keeps this a hash/sort-merge join with the
    range as a residual filter — check ``.explain``: no
    BroadcastNestedLoopJoin may appear.  At heavy skew, band the timestamp
    (join on (key, time_bucket)) to split hot keys.
    """
    cond = (
        (F.col(key_left) == F.col(key_right))
        & (F.col(ts_right) >= ts_left_lo)
        & (F.col(ts_right) < ts_left_hi)
    )
    return left.join(right, cond, "left")


def pareto_frontier_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    key_col: str,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Two-phase 2-D skyline: rows not dominated on (minimize ``cost_col``,
    maximize ``gain_col``).  ``q`` dominates ``p`` iff ``q.cost <= p.cost``
    and ``q.gain >= p.gain`` with at least one strict.

    The naive formulation is an O(n^2) theta-self-join — a CartesianProduct
    at any scale.  This is the distributed two-phase plan instead:

    1. **Bucket prune** (corpus-sized work, all map-side + one small agg):
       bucket rows by ``floor(cost / width)``, take per-bucket max gain
       (bucket table: ~|range/width| rows), and the running max over
       *strictly cheaper* buckets.  Any row whose gain does not exceed that
       running max is dominated by a strictly-cheaper row and is dropped.
       Every true frontier row provably survives.  The bucket table joins
       back broadcast — the corpus is scanned once, never shuffled.
    2. **Exact phase** (candidate-sized, tiny): among survivors, ``p`` is
       dominated iff max gain at strictly-lower cost >= ``p.gain``, or max
       gain at equal cost > ``p.gain``.  Both maxima come from a per-cost
       group table (|distinct candidate costs| rows) with a running-max
       window — single-task by design, over a table the prune phase has
       already shrunk to ~frontier size (the documented
       single-partition-window allowance).

    At 100 TB only phase 1 touches the corpus: a map-side bucket projection,
    a partial-aggregated groupBy on a ~100-key space, and one broadcast
    join.  Shuffle volume is O(buckets), not O(rows).
    """
    cost, gain = F.col(cost_col), F.col(gain_col)
    # Dominance is undefined for a row missing either dimension (every
    # comparison against it is three-valued NULL — the naive NOT EXISTS
    # would keep ALL such rows as vacuous frontier members); the skyline
    # is over fully-specified rows.
    df = df.filter(cost.isNotNull() & gain.isNotNull())
    bucket = F.floor(cost / F.lit(bucket_width)).cast("bigint").alias("bucket")

    bucket_max = df.select(bucket, gain.alias("g")).groupBy("bucket").agg(
        F.max("g").alias("bucket_max_gain")
    )
    w_cheaper = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_run = bucket_max.select(
        "bucket", F.max("bucket_max_gain").over(w_cheaper).alias("cheaper_max")
    )

    candidates = (
        df.withColumn("bucket", bucket)
        .join(F.broadcast(bucket_run), "bucket")
        .filter(F.col("cheaper_max").isNull() | (gain > F.col("cheaper_max")))
        .drop("bucket", "cheaper_max")
    )

    grp = candidates.groupBy(cost.alias("c")).agg(F.max(gain).alias("eq_max"))
    w_lower = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    grp = grp.select(
        "c", "eq_max", F.max("eq_max").over(w_lower).alias("lower_max")
    )

    return (
        candidates.join(F.broadcast(grp), cost == F.col("c"))
        .filter(
            (F.col("lower_max").isNull() | (gain > F.col("lower_max")))
            & (gain >= F.col("eq_max"))
        )
        .select(key_col, cost_col, gain_col)
        .orderBy(cost_col, key_col)
    )


def interval_peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    tiebreak_cols: tuple[str, ...],
) -> DataFrame:
    """Per-day peak number of simultaneously-active intervals — the
    sweep-line algorithm, distributed via two-level prefix-sum
    decomposition.

    Starts become +1 deltas, ends -1; the global running sum (the naive
    single-sort sweep) decomposes into a per-day carry-in (running sum
    over the ~|days| spine — tiny, single task by design) plus a
    within-day running sum PARTITIONED by day, so no corpus-sized ordered
    window exists anywhere in the plan.  Start/end columns are epoch
    seconds (bigint).  Ties: starts sort before ends at equal timestamps
    (``d DESC``), so back-to-back intervals overlap at the boundary
    instant.

    The peak is the TRUE sustained maximum, not just the post-delta
    values: each event contributes ``greatest(c, c - d)`` — its pre-delta
    level too — so a day whose first event is an END still reports the
    carry-in plateau it opened at (pre-delta of the first event of a day
    IS the carry-in; for any later event it equals the previous event's
    post-delta level, already in the max).  Days with NO deltas that sit
    inside a long open interval are emitted from the day spine with
    ``peak_concurrency = carry_in`` and ``n_changes = 0``; fully idle
    delta-free days (carry 0) stay absent.

    Caching contract: persists the 2-rows-per-interval delta set (two
    consumers whose shared lineage is the caller's full interval
    derivation — for w18, the sessionization shuffle+window) and the
    ~|days|-row delta rollup (three consumers), never unpersisting
    either (see comments at the persist sites).  One-shot callers own
    cleanup via ``spark.catalog.clearCache()``.

    NULL contract: an interval with a NULL start or end is DROPPED before
    the sweep.  A half-NULL interval would otherwise contribute an
    unbalanced +/-1 whose NULL-day group falls out of the spine and the
    carry join, silently corrupting ``carry_in`` for every later day.
    (w18's session_stats never emits NULL bounds, so its oracle needs no
    mirror; callers feeding raw intervals get drop-don't-corrupt.)
    """
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    starts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("d"), *tiebreak_cols
    )
    ends = intervals.select(
        F.col(end_col).alias("t"), F.lit(-1).alias("d"), *tiebreak_cols
    )
    # Two consumers (the day rollup below and the within-day sweep
    # ``with_c``) would each re-run the full interval lineage — for w18
    # that is the whole sessionization shuffle+window over events, and it
    # measurably ran TWICE per execution before r16.  The delta set is 2
    # rows per interval over an ALREADY-AGGREGATED interval table (this
    # operator's input contract), so the persist stays within the
    # caching.py bound discipline.
    deltas = persisted_intermediate(
        starts.unionByName(ends).withColumn(
            "day", F.expr("(t DIV 86400) * 86400")
        ),
        bound="2 rows per interval (input is an aggregated interval set)",
    )
    # Three consumers (spine bounds, spine join, carry) would each re-run
    # the delta rollup (cheap now that deltas is cached, but |days| rows
    # is still smaller to replay than |deltas|).
    day_sums = persisted_intermediate(
        deltas.groupBy("day").agg(F.sum("d").alias("day_delta")),
        bound="|days| rows",
    )
    spine = (
        day_sums.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            F.explode(F.sequence("mn", "mx", F.lit(86400))).alias("day")
        )
        .join(day_sums, "day", "left")
        .select(
            "day",
            F.col("day_delta").isNotNull().alias("has_deltas"),
            F.coalesce("day_delta", F.lit(0)).alias("day_delta"),
        )
    )
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = spine.select(
        "day",
        "has_deltas",
        F.coalesce(F.sum("day_delta").over(w_days), F.lit(0))
        .cast("long")
        .alias("carry_in"),
    )
    w_in = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("d").desc(), *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_c = deltas.join(
        F.broadcast(carry.select("day", "carry_in")), "day"
    ).withColumn("c", (F.col("carry_in") + F.sum("d").over(w_in)).cast("long"))
    delta_days = with_c.groupBy(F.col("day").alias("day_unix")).agg(
        F.max(F.greatest(F.col("c"), F.col("c") - F.col("d")))
        .cast("long")
        .alias("peak_concurrency"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    free_days = carry.filter(
        ~F.col("has_deltas") & (F.col("carry_in") > 0)
    ).select(
        F.col("day").alias("day_unix"),
        F.col("carry_in").alias("peak_concurrency"),
        F.lit(0).cast("long").alias("n_changes"),
    )
    return delta_days.unionByName(free_days).orderBy("day_unix")
