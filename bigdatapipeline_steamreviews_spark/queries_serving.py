"""Registered queries for the serving layer (SURVEY.md §2: P9-P14, A5-A8,
O1-O2) — the visualizer's hidden query engine, re-expressed as Spark plans.

Each query re-derives the daily summary (the flagship) as its input where
the reference would read the upserted serving table; semantics follow
``/root/reference/visualizer.py`` with the two reference bugs fixed as
documented (SURVEY.md §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import avg_exact, sum_exact
from .operators.aggregations import daily_summary
from .operators.serving import (
    distinct_values,
    snapshot_diff,
    hierarchical_time_filter,
    top_n,
    upsert_compact,
    with_date_parts,
)
from .registry import FLAGSHIP_ORACLE, _avg_exact_sql, _sum_exact_sql, register
from .sources.tables import load_table

# Daily serving table with date parts — shared input for A5/A6 queries.
_DAILY_SQL = f"""
WITH daily AS ({FLAGSHIP_ORACLE}),
serving AS (
  SELECT *, year(time) AS time_year, month(time) AS time_month,
         day(time) AS time_day
  FROM daily
)
"""


def _serving_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_date_parts(daily_summary(load_table(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# A7 — keyed last-writer-wins upsert compaction
# ---------------------------------------------------------------------------


@register(
    "serving_upsert_compaction",
    """
SELECT user_id, day, event_id, event_type, value
FROM (
  SELECT user_id, date_trunc('day', ts) AS day, event_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""",
    ("A7", "P10"),
    "Last-writer-wins merge keyed by (user_id, day): the batch "
    "materialization of the reference's keyed upsert (visualizer.py:61-79).",
)
def serving_upsert_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    latest = upsert_compact(
        events,
        keys=["user_id", "day"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.select("user_id", "day", "event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# A5 — day->month rollup with metric dispatch (+ O1 sort, P14 labels)
# ---------------------------------------------------------------------------


@register(
    "serving_monthly_rollup",
    _DAILY_SQL
    + f"""
SELECT event_type, time_year, time_month,
       {_avg_exact_sql('"A_value"')} AS A_value,
       CAST(sum("T_events") AS BIGINT) AS T_events,
       CAST(sum("T_high") AS BIGINT) AS T_high,
       concat_ws('/', time_year, time_month) AS time_label,
       row_number() OVER (
         PARTITION BY event_type ORDER BY time_year, time_month
       ) AS seq
FROM serving
GROUP BY event_type, time_year, time_month
""",
    ("A5", "P12", "P14", "O1"),
    "Month rollup of the daily summary with the reference's metric dispatch "
    "(mean for A_*, sum for T_*; visualizer.py:197-207) — faithfully the "
    "unweighted mean-of-daily-means — plus the 'YYYY/M' label (P14) and the "
    "(year, month) ordering surfaced as a rank column (O1).",
)
def serving_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _serving_daily(spark, sf_dir)
    monthly = daily.groupBy("event_type", "time_year", "time_month").agg(
        avg_exact("A_value").alias("A_value"),
        F.sum("T_events").alias("T_events"),
        F.sum("T_high").alias("T_high"),
    )
    w = Window.partitionBy("event_type").orderBy("time_year", "time_month")
    return monthly.withColumn(
        "time_label", F.concat_ws("/", F.col("time_year"), F.col("time_month"))
    ).withColumn("seq", F.row_number().over(w))


@register(
    "serving_monthly_rollup_weighted",
    _DAILY_SQL
    + """
SELECT event_type, time_year, time_month,
       ((sum(CAST("A_value" * "T_events" AS DECIMAL(28,10)))::VARCHAR)::DOUBLE
         / sum("T_events")) AS A_value,
       CAST(sum("T_events") AS BIGINT) AS T_events
FROM serving
GROUP BY event_type, time_year, time_month
""",
    ("A5",),
    "The statistically-correct month rollup: count-weighted mean of daily "
    "means == re-aggregating raw events, computed without touching them. "
    "The faithful unweighted variant is serving_monthly_rollup.",
)
def serving_monthly_rollup_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _serving_daily(spark, sf_dir)
    from .operators.aggregations import monthly_rollup

    return monthly_rollup(
        daily,
        ["A_value", "T_events"],
        ["event_type", "time_year", "time_month"],
        weight_col="T_events",
    )


# ---------------------------------------------------------------------------
# A6 — global rollup of a time slice (+ P11 drilldown filter)
# ---------------------------------------------------------------------------


@register(
    "serving_global_rollup",
    _DAILY_SQL
    + f"""
SELECT event_type,
       {_avg_exact_sql('"A_value"')} AS A_value,
       {_avg_exact_sql('"A_k"')} AS A_k,
       CAST(sum("T_events") AS BIGINT) AS T_events,
       CAST(sum("T_conversions") AS BIGINT) AS T_conversions
FROM serving
WHERE time_year = 2024 AND time_month = 1
GROUP BY event_type
""",
    ("A6", "P11"),
    "Rollup of the year=2024, month=1 slice to one row per event_type "
    "(visualizer.py:241-262), with the proper if/elif drilldown replacing "
    "the reference's unreachable-branch bug.",
)
def serving_global_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _serving_daily(spark, sf_dir)
    sliced = hierarchical_time_filter(daily, year=2024, month=1)
    return sliced.groupBy("event_type").agg(
        avg_exact("A_value").alias("A_value"),
        avg_exact("A_k").alias("A_k"),
        F.sum("T_events").alias("T_events"),
        F.sum("T_conversions").alias("T_conversions"),
    )


# ---------------------------------------------------------------------------
# O2 — ranking / top-N
# ---------------------------------------------------------------------------


@register(
    "serving_topn_users",
    """
SELECT user_id, total_value,
       row_number() OVER (ORDER BY total_value DESC, user_id) AS rank
FROM (
  SELECT user_id,
         (sum(CAST(value AS DECIMAL(28,10)))::VARCHAR)::DOUBLE AS total_value
  FROM events GROUP BY user_id
)
ORDER BY total_value DESC, user_id
LIMIT 10
""",
    ("O2", "A4"),
    "Top-10 users by total event value with explicit rank "
    "(visualizer.py:258-261's sort-desc, bounded). Compiles to "
    "TakeOrderedAndProject — a per-partition heap, not a global sort.",
)
def serving_topn_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(sum_exact("value").alias("total_value"))
    )
    # Take the top 10 FIRST (TakeOrderedAndProject: per-partition heap, no
    # global sort/window over all users), then rank the 10 survivors — the
    # global row_number window only ever sees N rows.
    order = [F.col("total_value").desc(), F.col("user_id")]
    top = top_n(totals, order, 10)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


# ---------------------------------------------------------------------------
# A8 — distinct dictionary
# ---------------------------------------------------------------------------


@register(
    "serving_distinct_types",
    "SELECT DISTINCT event_type FROM events",
    ("A8",),
    "The visualizer's append-if-new seen-keys dictionary "
    "(visualizer.py:81-82) as a distributed distinct.",
)
def serving_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_values(load_table(spark, sf_dir, "events"), "event_type")


# ---------------------------------------------------------------------------
# P9 / P10 — filters
# ---------------------------------------------------------------------------


@register(
    "p09_filter_equality",
    """
SELECT event_id, user_id, value
FROM events WHERE event_type = 'purchase'
""",
    ("P9",),
    "Single-key equality filter + projection (visualizer.py:203). The "
    "predicate reaches the parquet scan as a pushed filter.",
)
def p09_filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@register(
    "p10_filter_conjunctive",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
  AND year(o_orderdate) = 1998
""",
    ("P10",),
    "Conjunctive multi-key filter (the upsert match predicate, "
    "visualizer.py:67-69).",
)
def p10_filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 200000.0)
        & (F.year("o_orderdate") == 1998)
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# ---------------------------------------------------------------------------
# P12 — date-part extraction
# ---------------------------------------------------------------------------


@register(
    "p12_date_parts",
    """
SELECT year(ts) AS time_year, month(ts) AS time_month, day(ts) AS time_day,
       count(*) AS n_events
FROM events GROUP BY 1, 2, 3
""",
    ("P12",),
    "Timestamp -> (year, month, day) via date-part expressions "
    "(visualizer.py:85-88 parses an ISO string by hand).",
)
def p12_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.year("ts").alias("time_year"),
            F.month("ts").alias("time_month"),
            F.dayofmonth("ts").alias("time_day"),
        )
        .groupBy("time_year", "time_month", "time_day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# P13 — null / missing-key defaulting
# ---------------------------------------------------------------------------


@register(
    "p13_null_defaulting",
    """
SELECT l.l_returnflag,
       (sum(CAST(coalesce(p.p_retailprice, 0.0) AS DECIMAL(28,10)))::VARCHAR)::DOUBLE
         AS sum_price_defaulted,
       CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_defaulted
FROM lineitem l
LEFT JOIN (SELECT * FROM part WHERE p_size >= 30) p
  ON l.l_partkey = p.p_partkey
GROUP BY l.l_returnflag
""",
    ("P13",),
    "coalesce(col, 0) defaulting for absent keys (visualizer.py:97-102's "
    "dict.get defaults), realized over a left join with misses.",
)
def p13_null_defaulting(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left")
    return joined.groupBy("l_returnflag").agg(
        sum_exact(F.coalesce(F.col("p_retailprice"), F.lit(0.0))).alias(
            "sum_price_defaulted"
        ),
        F.sum(F.col("p_partkey").isNull().cast("int").cast("long")).alias("n_defaulted"),
    )


# ---------------------------------------------------------------------------
# P14 — string concat / label derivation
# ---------------------------------------------------------------------------


@register(
    "p14_string_labels",
    """
SELECT p_partkey,
       concat_ws('/', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, ' ', '_', 'g') AS name_slug,
       upper(p_brand) AS brand_upper
FROM part
""",
    ("P14",),
    "Label derivation: concat_ws time-label + str.replace prettify "
    "(visualizer.py:208,264).",
)
def p14_string_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_slug"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff — change-data capture between two materializations
# ---------------------------------------------------------------------------


@register(
    "serving_snapshot_diff",
    f"""
WITH old AS (
  SELECT o_custkey, count(*) AS n_orders,
         {_sum_exact_sql('o_totalprice')} AS total_spent
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY o_custkey
), new AS (
  SELECT o_custkey, count(*) AS n_orders,
         {_sum_exact_sql('o_totalprice')} AS total_spent
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY o_custkey
)
SELECT coalesce(new.o_custkey, old.o_custkey) AS o_custkey,
       CASE WHEN old.o_custkey IS NULL THEN 'added'
            WHEN new.o_custkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       old.n_orders AS old_n_orders,
       old.total_spent AS old_total_spent,
       new.n_orders AS new_n_orders,
       new.total_spent AS new_total_spent
FROM old FULL JOIN new ON old.o_custkey = new.o_custkey
WHERE old.o_custkey IS NULL OR new.o_custkey IS NULL
   OR old.n_orders IS DISTINCT FROM new.n_orders
   OR old.total_spent IS DISTINCT FROM new.total_spent
""",
    ("A7", "T4", "J*"),
    "CDC between two snapshots of the per-customer serving aggregate "
    "(as-of 1997 vs as-of 1998): full-outer join on the key, keys "
    "classified added/removed/changed, unchanged keys dropped — the "
    "update-mode changelog (reference summarizer.py:107) recovered by "
    "diffing materialized state. operators/serving.py::snapshot_diff.",
)
def serving_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def snap(before: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderdate") < F.lit(before).cast("timestamp"))
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                sum_exact("o_totalprice").alias("total_spent"),
            )
        )

    return snapshot_diff(
        snap("1997-01-01"),
        snap("1998-01-01"),
        ["o_custkey"],
        ["n_orders", "total_spent"],
    )


# ---------------------------------------------------------------------------
# SCD2 — slowly-changing-dimension history from the event change feed
# ---------------------------------------------------------------------------


@register(
    "serving_scd2_history",
    """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value IS NULL THEN 'none'
              WHEN value >= 100.0 THEN 'high'
              WHEN value >= 50.0 THEN 'mid'
              ELSE 'low' END AS tier
  FROM events
),
m AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER w AS prev_tier,
         lag(event_id) OVER w AS prev_id
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
  SELECT user_id, ts, event_id, tier FROM m
  WHERE prev_id IS NULL OR tier IS DISTINCT FROM prev_tier
)
SELECT user_id, tier,
       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_unix,
       CAST(floor(epoch(lead(ts) OVER w2)) AS BIGINT) AS valid_to_unix,
       CAST(row_number() OVER w2 AS BIGINT) AS version,
       CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    ("A7", "W*"),
    "SCD type-2 dimension history: per-user value-tier change detection "
    "(null-safe lag compare) collapsed into [valid_from, valid_to) "
    "intervals with version numbers and an is_current flag — the "
    "dimension-history twin of upsert_compact, feeding point-in-time "
    "as-of joins. Both windows share one exchange.",
)
def serving_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.serving import scd2_history

    events = load_table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value").isNull(), F.lit("none"))
        .when(F.col("value") >= 100.0, F.lit("high"))
        .when(F.col("value") >= 50.0, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    return scd2_history(events, "user_id", tier, "tier")


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (mergeable partial aggregates)
# ---------------------------------------------------------------------------


@register(
    "serving_incremental_mv",
    f"""
SELECT event_type,
       date_trunc('day', ts) AS day,
       count(*) AS n_events,
       {_sum_exact_sql('value')} AS total_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
""",
    ("A1", "A5", "A7"),
    "Incremental materialized-view maintenance: the events table is split "
    "into a 'base' (~90%) and a 'delta' (~10%) by content hash — the "
    "standing MV and a new ingest batch — each aggregated to PARTIAL "
    "state (count + DECIMAL sum per key), then merged by re-aggregating "
    "the union of partials.  The oracle is the full recompute: the gate "
    "proves merge(partial(base), partial(delta)) == aggregate(base u "
    "delta) BITWISE, the algebraic property that lets a 100 TB daily "
    "rollup absorb an ingest batch by touching only |keys| rows of MV "
    "state instead of rescanning the corpus.  (Count and DECIMAL sum "
    "are the mergeable forms; avg is derived at read time — never "
    "stored, since mean-of-means is not mergeable.)",
)
def serving_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 10
    )
    day = F.date_trunc("day", F.col("ts")).alias("day")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("event_type"), day).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("pv"),
        )

    base = partial(events.filter(bucket < 9))
    delta = partial(events.filter(bucket >= 9))
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("pv").cast("string").cast("double").alias("total_value"),
        )
    )


@register(
    "serving_incremental_join_mv",
    f"""
SELECT c.c_nationkey, count(*) AS n_orders,
       {_sum_exact_sql('o.o_totalprice')} AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_nationkey
""",
    ("A7", "J*"),
    "Incremental maintenance of a JOIN view (delta-join algebra): both "
    "sides split into standing base (~90%) and ingest delta (~10%) by "
    "content hash, and the enriched-orders view is maintained as "
    "base><base (the standing MV, untouched in production) + the three "
    "delta terms base><dC + dO><base + dO><dC — each bounded by a "
    "delta-sized side that BROADCASTS, so absorbing an ingest batch "
    "costs O(|delta|) not O(|base|).  The gate proves the union of the "
    "four disjoint terms aggregates bitwise-identically to the full "
    "recompute (count + DECIMAL-exact sum).",
)
def serving_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import sum_exact

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def bucket(col: str):
        return (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
            .cast("long") % 10
        )

    o_base = orders.filter(bucket("o_orderkey") < 9)
    o_delta = orders.filter(bucket("o_orderkey") >= 9)
    c_base = cust.filter(bucket("c_custkey") < 9)
    c_delta = cust.filter(bucket("c_custkey") >= 9)

    cols = [
        F.col("c_nationkey"),
        F.col("o_totalprice"),
    ]
    on = F.col("o_custkey") == F.col("c_custkey")
    standing = o_base.join(c_base, on).select(*cols)
    # The three maintenance terms: each joins against a DELTA side small
    # enough to broadcast — the O(|delta|) property the docstring claims.
    t1 = o_base.join(F.broadcast(c_delta), on).select(*cols)
    t2 = o_delta.join(c_base, on).select(*cols)
    t3 = o_delta.join(F.broadcast(c_delta), on).select(*cols)
    enriched = standing.unionByName(t1).unionByName(t2).unionByName(t3)
    return enriched.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_exact("o_totalprice").alias("total_price"),
    )


@register(
    "serving_scd2_asof_snapshot",
    """
WITH t AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value IS NULL THEN 'none'
              WHEN value >= 100.0 THEN 'high'
              WHEN value >= 50.0 THEN 'mid'
              ELSE 'low' END AS tier
  FROM events
),
m AS (
  SELECT user_id, ts, event_id, tier,
         lag(tier) OVER w AS prev_tier,
         lag(event_id) OVER w AS prev_id
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
  SELECT user_id, ts, event_id, tier FROM m
  WHERE prev_id IS NULL OR tier IS DISTINCT FROM prev_tier
),
hist AS (
  SELECT user_id, tier,
         CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_unix,
         CAST(floor(epoch(lead(ts) OVER w2)) AS BIGINT) AS valid_to_unix,
         CAST(row_number() OVER w2 AS BIGINT) AS version
  FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
snap_at AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS at_unix
  FROM events
)
SELECT h.user_id, h.tier, h.version, a.at_unix AS as_of_unix
FROM hist h, snap_at a
WHERE h.valid_from_unix <= a.at_unix
  AND (h.valid_to_unix IS NULL OR a.at_unix < h.valid_to_unix)
ORDER BY h.user_id
""",
    ("A7", "W*", "T*"),
    "Point-in-time (AS OF) read over the SCD2 dimension history: "
    "reconstruct every user's tier as it stood at the corpus midpoint "
    "instant — the time-travel query the history table exists to serve "
    "(intervals tile per user, so exactly one version matches each user "
    "active by then).  The as-of instant derives deterministically from "
    "the data (midpoint of floored event-second range) and joins in as "
    "a broadcast scalar, so the snapshot is one filter over the history, "
    "no per-row subquery.",
)
def serving_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.serving import scd2_history

    events = load_table(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value").isNull(), F.lit("none"))
        .when(F.col("value") >= 100.0, F.lit("high"))
        .when(F.col("value") >= 50.0, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    hist = scd2_history(events, "user_id", tier, "tier")
    bounds = events.agg(
        (
            (
                F.floor(F.unix_micros(F.min("ts")) / 1_000_000).cast("long")
                + F.floor(F.unix_micros(F.max("ts")) / 1_000_000).cast("long")
            )
            / 2
        )
        .cast("long")
        .alias("at_unix")
    )
    return (
        hist.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("valid_from_unix") <= F.col("at_unix"))
            & (
                F.col("valid_to_unix").isNull()
                | (F.col("at_unix") < F.col("valid_to_unix"))
            )
        )
        .select(
            "user_id", "tier", "version", F.col("at_unix").alias("as_of_unix")
        )
        .orderBy("user_id")
    )
