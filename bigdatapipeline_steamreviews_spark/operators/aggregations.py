"""Aggregation operators (SURVEY.md §2.3: A1-A8).

The core shape is the reference's streaming tumbling-window hash aggregate
(``/root/reference/summarizer.py:76-100``): groupBy(1-day event-time window,
key) -> avg / count / conditional-sum aggregates, then project
``window.end`` out as ``time``.  We implement it as one batch-or-streaming
DataFrame transformation (`daily_summary`): Structured Streaming
incrementalizes the identical plan when fed a streaming DataFrame, which is
exactly how Spark wants this expressed — one logical query, two runtimes.

Scale notes (100 TB):
* The groupBy shuffles on (window, key) — high cardinality, low skew, so a
  plain hash exchange is right; AQE coalesces small post-shuffle partitions.
* Partial aggregation (map-side combine) happens automatically: the
  HashAggregate(partial) -> Exchange -> HashAggregate(final) plan means each
  executor ships one row per (day,key), not per event.
* Averages use exact DECIMAL accumulation (see functions.columns) so results
  are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import avg_exact, count_if
from ..schemas import EVENT_PROPS_SCHEMA

__all__ = [
    "daily_summary",
    "review_daily_summary",
    "segment_daily_summary",
    "monthly_rollup",
    "global_rollup",
    "AGG_DISPATCH_PREFIXES",
]


def daily_summary(events: DataFrame, window_duration: str = "1 day") -> DataFrame:
    """A1-A4 + P2-P8 on the `events` table — the flagship query.

    Batch form of the reference's streaming summarizer
    (``summarizer.py:61-100``), mapped onto the driver's `events` schema per
    FIXTURES.md: `event_type` plays the app key, `value` the measure,
    `props` the JSON extras.

    Pipeline: parse JSON props with a declared schema (P2, ref
    summarizer.py:62) -> derive flags with comparisons / CASE WHEN (P5-P6,
    ref summarizer.py:68-72) -> groupBy(1-day tumbling window, event_type)
    (A1/T1, ref summarizer.py:76-78) -> avg/count/count-if aggregates
    (A2-A4, ref summarizer.py:83-88) -> pull `window.end` out as `time`
    (P8, ref summarizer.py:93).
    """
    parsed = events.withColumn(
        "props_s", F.from_json(F.col("props"), EVENT_PROPS_SCHEMA)
    )
    derived = (
        parsed
        # P4 (ref summarizer.py:67): arithmetic projection, minutes->hours.
        .withColumn("value_hours", F.col("value") / F.lit(60.0))
        # P6 (ref summarizer.py:71-72): comparison predicates -> flags.
        .withColumn("is_high", F.col("value") > F.lit(100.0))
        .withColumn("is_low", F.col("value") < F.lit(50.0))
        # P5 (ref summarizer.py:68-70): CASE WHEN derived boolean.
        .withColumn(
            "is_conversion",
            F.when(F.col("event_type") == "purchase", F.lit(True))
            .when(F.col("event_type") == "signup", F.lit(True))
            .otherwise(F.lit(False)),
        )
        .withColumn("k", F.col("props_s.k"))
    )
    agg = derived.groupBy(
        F.window(F.col("ts"), window_duration).alias("window"),
        F.col("event_type"),
    ).agg(
        avg_exact(F.col("value")).alias("A_value"),
        avg_exact(F.col("value_hours")).alias("A_value_hours"),
        avg_exact(F.col("k")).alias("A_k"),
        F.count(F.col("value")).alias("T_events"),
        count_if(F.col("is_high")).alias("T_high"),
        count_if(F.col("is_low")).alias("T_low"),
        count_if(F.col("is_conversion")).alias("T_conversions"),
    )
    return agg.select(
        F.col("event_type"),
        F.col("window.end").alias("time"),
        "A_value",
        "A_value_hours",
        "A_k",
        "T_events",
        "T_high",
        "T_low",
        "T_conversions",
    )


def review_daily_summary(reviews: DataFrame, window_duration: str = "1 day") -> DataFrame:
    """The reference summarizer query verbatim-in-semantics, on the native
    24-column review schema (``summarizer.py:61-100``).  Works on batch or
    streaming DataFrames alike.
    """
    from ..functions import epoch_seconds_to_ts, normalize_bool_string

    derived = (
        reviews.withColumn("timestamp_created", epoch_seconds_to_ts(F.col("timestamp_created")))
        .withColumn("author_playtime_at_review", F.col("author_playtime_at_review") / 60.0)
        .withColumn("recommended", normalize_bool_string(F.col("recommended")))
        .withColumn("is_positive", F.col("sentiment") > 0.0)
        .withColumn("is_negative", F.col("sentiment") < 0.0)
    )
    agg = derived.groupBy(
        F.window("timestamp_created", window_duration).alias("window"),
        "app_id",
        "app_name",
    ).agg(
        avg_exact("author_playtime_at_review").alias("A_playtime"),
        avg_exact("sentiment").alias("A_sentiment"),
        F.count("recommended").alias("T_reviews"),
        count_if(F.col("recommended")).alias("T_recommendations"),
        count_if(F.col("is_positive")).alias("T_pos_reviews"),
        count_if(F.col("is_negative")).alias("T_neg_reviews"),
    )
    return agg.select(
        "app_id",
        "app_name",
        F.col("window.end").alias("time"),
        "A_playtime",
        "A_sentiment",
        "T_reviews",
        "T_recommendations",
        "T_pos_reviews",
        "T_neg_reviews",
    )


def segment_daily_summary(
    events: DataFrame, customer_dim: DataFrame, window_duration: str = "1 day"
) -> DataFrame:
    """Stream-static enrichment (SURVEY.md §2.5's natural extension): join
    the event stream to a static customer dimension, then the tumbling-
    window aggregate per (day, market segment).

    One transformation, two runtimes: on a batch frame it is a broadcast
    join + hash aggregate; on a streaming frame Structured Streaming plans
    the same broadcast join per micro-batch (the static side is read once
    and reused) feeding the stateful windowed aggregate.  The explicit
    ``broadcast`` keeps the unbounded side shuffle-free — the only exchange
    is the aggregate's own (window, segment) hash partitioning.
    """
    from ..functions import sum_exact

    dim = customer_dim.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment")
    )
    enriched = events.join(F.broadcast(dim), "user_id", "left")
    agg = enriched.groupBy(
        F.window(F.col("ts"), window_duration).alias("window"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_exact("value").alias("total_value"),
    )
    return agg.select(
        "segment", F.col("window.end").alias("time"), "n_events", "total_value"
    )


# A5/A6 metric dispatch — the serving layer aggregates `A_*` columns with
# mean and `T_*` columns with sum (ref visualizer.py:197-200).
AGG_DISPATCH_PREFIXES = {"A_": "avg", "T_": "sum"}


def _dispatch_agg(metric: str) -> Column:
    """Reference's metric-dependent aggregate choice (visualizer.py:197-200)."""
    if metric.startswith("A_"):
        return avg_exact(metric).alias(metric)
    return F.sum(metric).alias(metric)


def monthly_rollup(
    daily: DataFrame,
    metrics: list[str],
    keys: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """A5 — day->month re-aggregation with metric dispatch
    (ref visualizer.py:204-207).

    Faithful semantics (default): `A_*` metrics take the **unweighted mean
    of daily means** — not the true monthly mean (SURVEY.md §2.3 A5 note);
    this reproduces the serving layer's behavior exactly.

    Correct semantics (``weight_col=`` e.g. the daily row count): `A_*`
    metrics become count-weighted means, sum(mean_d * n_d) / sum(n_d) —
    algebraically equal to re-aggregating the raw events, without touching
    them (the rollup stays a cheap second-stage aggregate at any scale).
    """
    if weight_col is None:
        return daily.groupBy(*keys).agg(*[_dispatch_agg(m) for m in metrics])

    from ..functions import sum_exact

    def agg_for(m: str) -> Column:
        if m.startswith("A_"):
            num = sum_exact(F.col(m) * F.col(weight_col))
            return (num / F.sum(weight_col)).alias(m)
        return F.sum(m).alias(m)

    return daily.groupBy(*keys).agg(*[agg_for(m) for m in metrics])


def global_rollup(daily: DataFrame, metrics: list[str], key: str = "event_type") -> DataFrame:
    """A6 — rollup of a (time-filtered) slice to one row per key
    (ref visualizer.py:258-262)."""
    return daily.groupBy(key).agg(*[_dispatch_agg(m) for m in metrics])
