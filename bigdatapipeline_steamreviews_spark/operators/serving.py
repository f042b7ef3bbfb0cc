"""Serving-layer operators (SURVEY.md §2: P9-P14, A5-A8, O1-O2).

The reference's visualizer is a second, hidden query engine: a keyed upsert
store (``/root/reference/visualizer.py:61-79``) plus ad-hoc rollup / top-N
queries run in pandas on every UI interaction
(``visualizer.py:188-274``).  Here each of those becomes a declarative
DataFrame transformation, so Catalyst plans it and it scales past one
process's RAM (the reference's global pandas table grows without bound —
SURVEY.md §4 "spill-to-disk").

Scale notes:
* `upsert_compact` is the batch materialization of update-mode streaming
  output — `row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1`.
  One shuffle on the key; at 100 TB prefer writing the base table bucketed
  by the key so repeated compactions avoid the exchange.
* `top_n` compiles to TakeOrderedAndProject (per-partition heap + driver
  merge of N rows), never a full sort of the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "snapshot_diff",
    "upsert_compact",
    "hierarchical_time_filter",
    "distinct_values",
    "top_n",
    "with_date_parts",
    "scd2_history",
]


def scd2_history(
    events: DataFrame,
    key_col: str,
    attr_col: Column,
    attr_name: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a keyed change feed:
    collapse consecutive equal attribute values into validity intervals
    ``[valid_from, valid_to)`` with a per-key version number and an
    ``is_current`` flag on the open interval.

    Classic two-window formulation over ONE shuffle (both windows share
    the (key) partitioning and (ts, id) ordering, so Catalyst plans a
    single exchange + sort):

    1. change detection — keep a row iff ``lag(attr)`` differs (null-safe,
       so a key's first observation and genuine null values both work);
    2. interval stitching — ``valid_to = lead(valid_from)``, version =
       ``row_number`` over the surviving change rows.

    This is the dimension-history twin of ``upsert_compact`` (which keeps
    only the current row): the serving pattern for point-in-time joins
    (``as_of_join`` against this table reconstructs any key's attribute
    at any timestamp).  At 100 TB the change feed is bucketed by the key
    and the history table is overwritten per partition-of-keys —
    append-only state, no global rewrite.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    marked = events.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), attr_col.alias(attr_name)
    ).withColumn("__is_first", F.lag(id_col).over(w).isNull()).withColumn(
        "__prev", F.lag(attr_name).over(w)
    )
    changes = marked.filter(
        F.col("__is_first") | ~F.col(attr_name).eqNullSafe(F.col("__prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return changes.select(
        F.col(key_col),
        F.col(attr_name),
        F.unix_timestamp(F.col(ts_col)).alias("valid_from_unix"),
        F.unix_timestamp(F.lead(ts_col).over(w2)).alias("valid_to_unix"),
        F.row_number().over(w2).alias("version"),
        F.when(F.lead(ts_col).over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


def upsert_compact(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """A7 — keyed last-writer-wins compaction (ref visualizer.py:61-79).

    The reference replaces the existing ``(app_id, year, month, day)`` row
    with each newly-arrived summary row.  Batch equivalent: keep, per key,
    the single row that is latest in ``order_by`` (callers must pass a
    *total* order — include a unique id as the final tie-break so the
    result is deterministic under any partitioning).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hierarchical_time_filter(
    df: DataFrame,
    year: int | None = None,
    month: int | None = None,
    day: int | None = None,
    year_col: str = "time_year",
    month_col: str = "time_month",
    day_col: str = "time_day",
) -> DataFrame:
    """P11 — all / year / year+month / year+month+day drilldown
    (ref visualizer.py:241-252).

    The reference chains bare ``if`` statements where ``if/elif`` was meant,
    making the year-only branch unreachable (bug noted in SURVEY.md §2.2
    P11); this implementation is the intended proper drilldown: each finer
    grain only applies when every coarser grain is set.
    """
    if year is not None:
        df = df.filter(F.col(year_col) == year)
        if month is not None:
            df = df.filter(F.col(month_col) == month)
            if day is not None:
                df = df.filter(F.col(day_col) == day)
    return df


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A8 — the visualizer's append-if-new dictionary of seen keys
    (ref visualizer.py:81-82), as a proper distinct (partial-agg + shuffle
    on the value, so it scales with distinct-cardinality not row count)."""
    return df.select(col).distinct()


def top_n(df: DataFrame, order_by: list[Column], n: int) -> DataFrame:
    """O2 — ranking / top-N (ref visualizer.py:261 sort_values desc).

    orderBy+limit compiles to TakeOrderedAndProject: each task keeps an
    N-row heap and the driver merges — no global sort at any scale.
    """
    return df.orderBy(*order_by).limit(n)


def with_date_parts(df: DataFrame, ts_col: str = "time") -> DataFrame:
    """P12 — derive (time_year, time_month, time_day) from a timestamp
    (ref visualizer.py:85-88 parses the ISO string by hand; Spark has
    dedicated date-part expressions)."""
    c = F.col(ts_col)
    return (
        df.withColumn("time_year", F.year(c))
        .withColumn("time_month", F.month(c))
        .withColumn("time_day", F.dayofmonth(c))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data capture between two materializations of a keyed table:
    one full-outer hash join on the key, classifying every key as
    ``added`` (only in new), ``removed`` (only in old) or ``changed``
    (present in both with any compare column differing); unchanged keys
    are dropped.  Output carries ``old_<c>`` / ``new_<c>`` for each
    compare column.

    This is the serving layer's incremental-refresh primitive: the diff of
    two upsert-compacted snapshots IS the update-mode changelog the
    reference streams over Kafka (SURVEY.md A7/T4), recovered from state
    instead of from an emission trace.  One shuffle on the key for each
    side; at 100 TB both snapshots would be bucketed by the key so the
    join is exchange-free.  Null-safe equality (``eqNullSafe``) keeps
    null-valued columns from reading as perpetual changes.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        e = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = e if cond is None else cond & e
    joined = o.join(n, cond, "full_outer")

    any_change = None
    for c in compare_cols:
        e = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        any_change = e if any_change is None else any_change | e
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
