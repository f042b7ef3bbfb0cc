"""Registered analytic-window, temporal-join, and relational-algebra
queries — the operator families the reference never had (SURVEY.md §2.5
lists "none implemented") but that complete the engine: lag/lead deltas,
sessionization, rolling frames, ROLLUP drilldown, set operations,
semi/anti joins, exact percentiles, as-of joins, and range joins.

Every query carries a bit-exact DuckDB oracle; determinism comes from
total-order tie-breaks on every window and exact-decimal accumulation for
every double aggregate (see functions.columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .caching import persisted_intermediate
from .functions import avg_exact, sum_exact
from .operators.analytic import (
    as_of_join,
    equi_width_histogram,
    event_deltas,
    event_transitions,
    gap_fill_forward,
    interval_peak_concurrency,
    nearest_rank_percentiles,
    pareto_frontier_2d,
    range_join_count,
    rolling_frame_avg,
    rolling_zscore,
    session_stats,
)
from .operators.partitioning import salted_join
from .registry import _avg_exact_sql, _count_if_sql, _sum_exact_sql, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# W1 — lag/lead event deltas (analytic window functions)
# ---------------------------------------------------------------------------


@register(
    "w1_event_deltas",
    """
SELECT user_id, event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS event_unix,
       CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS prev_unix,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
       lead(event_id) OVER w AS next_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    ("W*",),
    "lag/lead over per-user event timelines: previous-event gap and next "
    "event id. One shuffle on user_id, per-partition sort, total-order "
    "tie-break (ts, event_id).",
)
def w1_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_deltas(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# W2 — gap-based sessionization (lag + running sum)
# ---------------------------------------------------------------------------


@register(
    "w2_session_stats",
    f"""
WITH marked AS (
  SELECT user_id, event_id, value, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, unix_ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id, session_id,
       min(unix_ts) AS session_start_unix,
       max(unix_ts) AS session_end_unix,
       max(unix_ts) - min(unix_ts) AS duration_s,
       count(*) AS n_events,
       {_sum_exact_sql('value')} AS total_value
FROM sessions GROUP BY user_id, session_id
""",
    ("W*", "A1"),
    "Gap-based sessionization (30-min inactivity): lag + running-sum "
    "session ids, then per-session bounds/count/exact value sum. The two "
    "windows share partitioning+ordering, so Catalyst plans one exchange.",
)
def w2_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(load_table(spark, sf_dir, "events"), gap_seconds=1800)


# ---------------------------------------------------------------------------
# W3 — trailing 7-row rolling average over the daily revenue series
# ---------------------------------------------------------------------------


@register(
    "w3_rolling_revenue",
    """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10)))
           AS rev_dec
  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
)
SELECT day,
       ((rev_dec::VARCHAR)::DOUBLE) AS revenue,
       (((sum(rev_dec) OVER w)::VARCHAR)::DOUBLE / count(*) OVER w)
         AS rolling7_avg
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    ("W*", "A5"),
    "Trailing-7-day mean of daily revenue: aggregate first (fact scan -> "
    "~2.5k rows), then an ordered rolling frame in exact decimal. The "
    "global window runs over the tiny aggregated series, never the fact.",
)
def w3_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    daily = l.groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("day")).agg(
        F.sum(rev.cast("decimal(28,10)")).alias("rev_dec")
    )
    rolled = rolling_frame_avg(
        daily, "day", "rev_dec", preceding=6, out_col="rolling7_avg"
    )
    return rolled.select(
        "day",
        F.col("rev_dec").cast("string").cast("double").alias("revenue"),
        "rolling7_avg",
    )


# ---------------------------------------------------------------------------
# G1 — ROLLUP drilldown (grouping sets)
# ---------------------------------------------------------------------------


@register(
    "g1_priority_rollup",
    f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(oyear, -1) AS oyear,
       count(*) AS n_orders,
       {_sum_exact_sql('o_totalprice')} AS total_price
FROM (SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS oyear,
             o_totalprice
      FROM orders)
GROUP BY ROLLUP (o_orderpriority, oyear)
HAVING count(*) > 0
""",
    ("P11", "A5"),
    "ROLLUP over (priority, year): the serving drilldown (P11) as grouping "
    "sets — every grain computed in one pass with partial aggregation, "
    "instead of one query per drilldown level.  Empty-input contract: "
    "Spark's ROLLUP emits NO rows on an empty table (its grouping-set "
    "expansion feeds a hash agg that produces no groups) where ANSI/DuckDB "
    "emit a count-0 grand-total row; the engine adopts Spark's "
    "no-data-no-report behavior and the oracle mirrors it with HAVING "
    "count(*) > 0 — a no-op on non-empty input, where every emitted "
    "grouping-set row covers at least one source row.",
)
def g1_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("oyear"),
        "o_totalprice",
    )
    return (
        o.rollup("o_orderpriority", "oyear")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_exact("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("oyear"), F.lit(-1)).alias("oyear"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# G2 — pivot (long -> wide reporting table)
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_ALIASES = ["p_urgent", "p_high", "p_medium", "p_not_specified", "p_low"]


@register(
    "g2_priority_pivot",
    f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS oyear,
       {', '.join(
           _count_if_sql(f"o_orderpriority = '{v}'") + f' AS {a}'
           for v, a in zip(_PRIORITIES, _PIVOT_ALIASES)
       )}
FROM orders GROUP BY 1
""",
    ("A*", "P14"),
    "Pivot: order counts per year spread across one column per priority "
    "(long->wide). The pivot values are declared, so Spark skips the "
    "extra distinct-values pass and plans a single aggregate.",
)
def g2_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("oyear"), "o_orderpriority"
    )
    wide = (
        o.groupBy("oyear")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "oyear",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(_PRIORITIES, _PIVOT_ALIASES)
        ],
    )


@register(
    "g3_priority_unpivot",
    f"""
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS oyear,
         {', '.join(
             _count_if_sql(f"o_orderpriority = '{v}'") + f' AS {a}'
             for v, a in zip(_PRIORITIES, _PIVOT_ALIASES)
         )}
  FROM orders GROUP BY 1
)
SELECT oyear, priority, n_orders FROM (
  {' UNION ALL '.join(
      f"SELECT oyear, '{a}' AS priority, {a} AS n_orders FROM wide"
      for a in _PIVOT_ALIASES
  )}
)
""",
    ("A*",),
    "Unpivot (wide->long): the pivoted priority counts melted back to one "
    "row per (year, priority) via stack() — a single generator projection, "
    "no shuffle beyond the pivot's own aggregate.",
)
def g3_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = g2_priority_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{a}', {a}" for a in _PIVOT_ALIASES)
    return wide.select(
        "oyear",
        F.expr(
            f"stack({len(_PIVOT_ALIASES)}, {stack_args}) AS (priority, n_orders)"
        ),
    )


# ---------------------------------------------------------------------------
# S1 — set operations (INTERSECT / EXCEPT / UNION)
# ---------------------------------------------------------------------------


@register(
    "s1_nation_set_ops",
    """
SELECT 'both' AS membership, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'customer_only', nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'supplier_only', nationkey FROM (
  SELECT s_nationkey AS nationkey FROM supplier
  EXCEPT SELECT c_nationkey FROM customer)
""",
    ("SET*",),
    "INTERSECT / EXCEPT / UNION ALL over customer vs supplier nation keys "
    "— the relational set algebra the reference lacks, one tagged result.",
)
def s1_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    def tag(df: DataFrame, label: str) -> DataFrame:
        return df.select(F.lit(label).alias("membership"), "nationkey")

    return (
        tag(c.intersect(s), "both")
        .unionAll(tag(c.subtract(s), "customer_only"))
        .unionAll(tag(s.subtract(c), "supplier_only"))
    )


@register(
    "s2_nation_bag_set_ops",
    """
SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL SELECT s_nationkey FROM supplier) GROUP BY 1, 2
UNION ALL
SELECT 'except_all', nationkey, count(*) FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL SELECT s_nationkey FROM supplier) GROUP BY 1, 2
""",
    ("SET*",),
    "BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicities "
    "are min(m, n) and m - n per key rather than the 0/1 of s1's DISTINCT "
    "forms — the multiset algebra (aggregated per key so the compare is "
    "order-free).  Spark's intersectAll/exceptAll plan as aggregate-and-"
    "join, never a row-by-row loop.",
)
def s2_nation_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    def counted(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(label).alias("op"), "nationkey", "n"
        )

    return counted(c.intersectAll(s), "intersect_all").unionAll(
        counted(c.exceptAll(s), "except_all")
    )


# ---------------------------------------------------------------------------
# J2 — semi / anti join cohorts
# ---------------------------------------------------------------------------


@register(
    "j2_customer_order_cohorts",
    f"""
SELECT 'with_orders' AS cohort, count(*) AS n_customers,
       {_avg_exact_sql('c_acctbal')} AS avg_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders', count(*), {_avg_exact_sql('c_acctbal')}
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    ("J*",),
    "LEFT SEMI / LEFT ANTI join cohorts (EXISTS / NOT EXISTS): customers "
    "with vs without orders. The semi join never materializes order "
    "columns — only the key reaches the join.",
)
def j2_customer_order_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = c.c_custkey == o.o_custkey

    def cohort(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_customers"),
            avg_exact("c_acctbal").alias("avg_acctbal"),
        ).select(F.lit(label).alias("cohort"), "n_customers", "avg_acctbal")

    return cohort(c.join(o, cond, "left_semi"), "with_orders").unionAll(
        cohort(c.join(o, cond, "left_anti"), "without_orders")
    )


# ---------------------------------------------------------------------------
# J3 — salted skew join
# ---------------------------------------------------------------------------


@register(
    "j3_salted_segment_stats",
    f"""
SELECT c.c_mktsegment AS segment,
       count(*) AS n_events,
       {_sum_exact_sql('e.value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
    ("J*",),
    "Skew-safe salted join: the hot-keyed event side routes by (key, "
    "salt), the dimension side replicates once per salt, so each hot "
    "key's volume spreads over n_salts reducers. Result is identical to "
    "the plain join (salting is pure routing) — which is exactly what "
    "the oracle checks.",
)
def j3_salted_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, "user_id", n_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_exact("value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# A9 — exact nearest-rank percentiles
# ---------------------------------------------------------------------------


@register(
    "a9_order_percentiles",
    """
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT o_orderstatus,
       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                THEN o_totalprice END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                THEN o_totalprice END) AS p90,
       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                THEN o_totalprice END) AS p99,
       max(n) AS n_rows
FROM ranked GROUP BY o_orderstatus
""",
    ("A*",),
    "Exact nearest-rank p50/p90/p99 of order value per status: the value "
    "at row ceil(p*n) — an actual data point, bit-exact in every engine "
    "(interpolated percentile_cont is not).",
)
def a9_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_rank_percentiles(
        load_table(spark, sf_dir, "orders"),
        ["o_orderstatus"],
        "o_totalprice",
        "o_orderkey",
        (0.5, 0.9, 0.99),
    )


# ---------------------------------------------------------------------------
# T1 — as-of join (point-in-time enrichment)
# ---------------------------------------------------------------------------


@register(
    "t1_asof_latest_order",
    """
WITH ocompact AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1
)
SELECT e.event_id, e.user_id,
       CAST(floor(epoch(e.ts)) AS BIGINT) AS event_unix,
       o.o_orderkey AS last_orderkey,
       o.o_totalprice AS last_totalprice
FROM events e
ASOF LEFT JOIN ocompact o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    ("T*", "J*"),
    "As-of join: each event picks up the user's most recent order at-or-"
    "before the event time. Spark has no builtin; implemented as the "
    "union-tag + last(ignorenulls) carry-forward — one shuffle, one sort, "
    "never the O(events x orders) range product. Right side pre-compacted "
    "to one row per (custkey, orderdate) for determinism.",
)
def t1_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders")
    # Deterministic compaction: per (custkey, orderdate) keep the max-
    # orderkey row (struct max orders by the first field; orderkey unique).
    ocompact = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("s"))
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("s.o_orderkey").alias("last_orderkey"),
            F.col("s.o_totalprice").alias("last_totalprice"),
        )
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = as_of_join(
        e,
        ocompact,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        carry_cols=["last_orderkey", "last_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("event_unix"),
        "last_orderkey",
        "last_totalprice",
    )


# ---------------------------------------------------------------------------
# T2 — range join (equality key + time band)
# ---------------------------------------------------------------------------


@register(
    "t2_shipments_within_30d",
    """
SELECT o.o_orderkey,
       count(l.l_orderkey) AS n_shipped_30d
FROM orders o
LEFT JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
""",
    ("T*", "J*"),
    "Range join with an equality key: per order, lineitems shipped within "
    "30 days. The orderkey equality keeps this a shuffled hash join with "
    "the time band as a residual filter — .explain must show no "
    "BroadcastNestedLoopJoin.",
)
def t2_shipments_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = range_join_count(
        o,
        l,
        key_left="o_orderkey",
        key_right="l_orderkey",
        ts_left_lo=F.col("o_orderdate"),
        ts_left_hi=F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
        ts_right="l_shipdate",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("l_orderkey").alias("n_shipped_30d")
    )


# ---------------------------------------------------------------------------
# W4 — per-group top-k (rank inside partition, not a global sort)
# ---------------------------------------------------------------------------


@register(
    "w4_topk_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rk
  FROM orders
)
WHERE rk <= 3
""",
    ("W*", "O2"),
    "Top-3 orders per customer: row_number inside a per-key window, then a "
    "rank filter. The scale-out dual of global top-N — one shuffle on the "
    "group key, per-partition sort, no global ordering ever materialized; "
    "the rank predicate prunes before anything leaves the exchange "
    "(Spark's WindowGroupLimit pushes rk<=3 into the sort).",
)
def w4_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# A10 — portable HyperLogLog distinct sketch (approximate, still hash-gated)
# ---------------------------------------------------------------------------


# Shared with the streaming HLL query (queries_streaming): a streaming
# groupBy(group, bucket) max(rho) maintains exactly the batch register
# table (max is monotone), so both finalize against this same oracle.
HLL_USERS_ORACLE = """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events
), r AS (
  SELECT event_type, hv % 64 AS bucket,
         CAST(55 - CASE WHEN hv // 64 = 0 THEN 0
                        ELSE length(bin(hv // 64)) END AS BIGINT) AS rho
  FROM h
), regs AS (
  SELECT event_type, bucket, max(rho) AS m_rho FROM r GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(sum(CAST(power(2.0, 55 - m_rho) AS BIGINT)) AS BIGINT)
           AS s_present,
         count(*) AS n_buckets
  FROM regs GROUP BY 1
)
SELECT event_type,
       1.046802484394006e+20
         / CAST(s_present
                + (64 - n_buckets) * CAST(power(2.0, 55) AS BIGINT)
                AS DOUBLE) AS hll_raw,
       CAST(64 - n_buckets AS BIGINT) AS empty_buckets,
       CAST(n_buckets AS BIGINT) AS n_buckets
FROM agg
"""


@register(
    "a10_hll_distinct_users",
    HLL_USERS_ORACLE,
    ("A8", "X*"),
    "Distinct-user sketch per event type via a PORTABLE HyperLogLog: "
    "md5-derived 60-bit hash, 64 buckets, max-rank registers, exact-integer "
    "harmonic mean — every step an engine-agnostic builtin, so the DuckDB "
    "oracle runs the same algorithm and the approximate estimate "
    "hash-matches bitwise. Register state is 64 longs per group however "
    "large the input: the sublinear scale path for the serving layer's "
    "distinct-key dictionary (A8). operators/sketches.py.",
)
def a10_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import hll_distinct

    return hll_distinct(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"]
    )


@register(
    "a11_hll_mergeable_rollup",
    """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events
), r AS (
  SELECT event_type, hv % 64 AS bucket,
         CAST(55 - CASE WHEN hv // 64 = 0 THEN 0
                        ELSE length(bin(hv // 64)) END AS BIGINT) AS rho
  FROM h
), regs AS (          -- per-group register tables
  SELECT event_type, bucket, max(rho) AS m_rho FROM r GROUP BY 1, 2
), merged AS (        -- MERGE of all group sketches: bucketwise max
  SELECT bucket, max(m_rho) AS m_rho FROM regs GROUP BY bucket
), agg AS (
  SELECT CAST(sum(CAST(power(2.0, 55 - m_rho) AS BIGINT)) AS BIGINT)
           AS s_present,
         count(*) AS n_buckets
  FROM merged
)
SELECT 'all_types' AS scope,
       1.046802484394006e+20
         / CAST(s_present
                + (64 - n_buckets) * CAST(power(2.0, 55) AS BIGINT)
                AS DOUBLE) AS hll_raw,
       CAST(64 - n_buckets AS BIGINT) AS empty_buckets
FROM agg
""",
    ("A8", "X*"),
    "HLL register MERGE: the per-event-type sketches from a10 are merged "
    "(bucketwise max — associative, commutative, idempotent) into one "
    "global distinct-user estimate WITHOUT rescanning the input. This is "
    "the property that makes sketches the scale path: partial sketches "
    "merge across partitions, days, or datacenters like partial sums, so "
    "a 100 TB distinct-count rollup reads sketch tables, not events. "
    "Merging per-group registers is bitwise-identical to sketching the "
    "union directly (max is associative), which is what the oracle "
    "computes. operators/sketches.py.",
)
def a11_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import hll_alpha_numerator, hll_register_table

    regs = hll_register_table(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"]
    )
    merged = regs.groupBy("bucket").agg(F.max("m_rho").alias("m_rho"))
    term = F.pow(F.lit(2.0), F.lit(55) - F.col("m_rho")).cast("long")
    agg = merged.agg(
        F.sum(term).alias("s_present"), F.count(F.lit(1)).alias("n_buckets")
    )
    s_total = F.col("s_present") + (F.lit(64) - F.col("n_buckets")) * F.lit(
        1 << 55
    ).cast("long")
    return agg.select(
        F.lit("all_types").alias("scope"),
        (F.lit(hll_alpha_numerator()) / s_total.cast("double")).alias("hll_raw"),
        (F.lit(64) - F.col("n_buckets")).cast("long").alias("empty_buckets"),
    )


# ---------------------------------------------------------------------------
# G4 — CUBE grouping sets (every grain of a two-dim report in one pass)
# ---------------------------------------------------------------------------


@register(
    "g4_status_priority_cube",
    f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       {_sum_exact_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
HAVING count(*) > 0
""",
    ("P11", "A5"),
    "CUBE over (status, priority): all four grains — (s,p), (s,·), (·,p), "
    "grand total — in ONE aggregation pass with map-side partials, where "
    "ROLLUP (g1) only produces the hierarchy's prefixes.  The dashboard "
    "shape for two independent drilldown axes; at 100 TB one cube pass "
    "replaces four separate scans.  Empty-input contract: as g1 — Spark "
    "emits no rows on an empty table, the oracle mirrors via HAVING "
    "count(*) > 0 (a no-op on non-empty input).",
)
def g4_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_exact("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "g5_custom_grouping_sets",
    f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS oyear,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(year(o_orderdate))
            AS BIGINT) AS gid,
       count(*) AS n_orders,
       {_sum_exact_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)),
                        (o_orderstatus), (year(o_orderdate)))
""",
    ("P11", "A5"),
    "Arbitrary GROUPING SETS — the general grain-list form that ROLLUP "
    "(g1, hierarchy prefixes) and CUBE (g4, full lattice) are special "
    "cases of: exactly the grains a report needs ((status,year), "
    "(status), (year)) and nothing else, one aggregation pass, with "
    "GROUPING() flags disambiguating produced-by-grouping nulls from "
    "data nulls (bit order pinned status*2+year on both engines).",
)
def g5_custom_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "__oyear", F.year("o_orderdate").cast("long")
    )
    return (
        o.groupingSets(
            [["o_orderstatus", "__oyear"], ["o_orderstatus"], ["__oyear"]],
            "o_orderstatus",
            "__oyear",
        )
        .agg(
            # grouping() is only resolvable INSIDE the grouping-sets agg.
            (F.grouping("o_orderstatus") * F.lit(2) + F.grouping("__oyear"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            sum_exact("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("__oyear"), F.lit(-1)).alias("oyear"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# W5 — ranking-function family (ntile / rank / percent_rank / cume_dist)
# ---------------------------------------------------------------------------


@register(
    "w5_user_value_quartiles",
    f"""
WITH spend AS (
  SELECT e.user_id,
         coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
         {_sum_exact_sql('e.value')} AS total_value
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
  GROUP BY 1, 2
)
SELECT user_id, segment, total_value,
       ntile(4)       OVER w AS quartile,
       rank()         OVER w AS rnk,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM spend
WINDOW w AS (PARTITION BY segment ORDER BY total_value DESC, user_id)
""",
    ("W*", "O1", "J*"),
    "The ranking-function family — ntile quartiles, rank, percent_rank, "
    "cume_dist — over per-user exact-decimal spend, PARTITIONED by the "
    "user's market segment (broadcast customer enrichment).  The order is "
    "totally tie-broken (total, then user_id), so every rank and the "
    "(rank-1)/(n-1) double arithmetic is engine-independent.  The window "
    "partitions on segment, so ranking distributes — a global ORDER BY "
    "window would funnel every user through one task, which this repo's "
    "own plan lint rejects (single-partition-window).",
)
def w5_user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        e.join(F.broadcast(c), e.user_id == c.c_custkey, "left")
        .groupBy(
            "user_id",
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(sum_exact("value").alias("total_value"))
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return spend.select(
        "user_id",
        "segment",
        "total_value",
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "w6_trailing_hour_range_frame",
    """
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS event_unix,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       ((sum(CAST(coalesce(value, 0.0) AS DECIMAL(28,10))) OVER w)::VARCHAR)::DOUBLE
         AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
    ("W*",),
    "VALUE-based (RANGE) window frame — the frame class w3's ROWS frame "
    "is not: each event sees every same-user event within the trailing "
    "3600 SECONDS, however many rows that is, including all peers at the "
    "current timestamp (RANGE peer semantics, identical in both engines). "
    "Count and decimal-exact sum per frame; the frame bound is data-value "
    "arithmetic, so ordering ties need no tie-break column.",
)
def w6_trailing_hour_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    unix = F.floor(F.unix_timestamp(F.col("ts"))).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_unix"))
        .rangeBetween(-3600, Window.currentRow)
    )
    # Both frame aggregates in ONE projection so CollapseWindow plans a
    # single Window exec (a withColumn chain interposes projections that
    # keep them apart -- 2 Window nodes measured, 1 after).
    return e.select("event_id", "user_id", unix.alias("event_unix"), "value").select(
        "event_id",
        "user_id",
        "event_unix",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(28,10)"))
        .over(w)
        .cast("string")
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    "w7_first_last_nth",
    """
SELECT user_id, event_id,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER w AS last_val,
       nth_value(value, 2) OVER w AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    ("W*",),
    "The positional window family w1's lag/lead leaves out: first_value /"
    " last_value / nth_value over the full partition (frame pinned "
    "UNBOUNDED..UNBOUNDED — the default growing frame makes last_value "
    "just the current row, a classic correctness trap).  NULL values are "
    "respected positionally on both engines; ordering ties broken by "
    "event_id so the positions are deterministic.",
)
def w7_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "p17_props_map_stats",
    """
SELECT key, count(*) AS n_events,
       CAST(sum(val::BIGINT) AS BIGINT) AS total,
       count(DISTINCT user_id) AS n_users
FROM (
  SELECT e.user_id, t.key,
         json_extract_string(e.props, '$."' || t.key || '"') AS val
  FROM events e
  JOIN (SELECT event_id, unnest(json_keys(props)) AS key FROM events) t
    USING (event_id)
  WHERE strpos(t.key, '"') = 0 AND strpos(t.key, '\\') = 0
)
WHERE val IS NOT NULL AND regexp_matches(val, '\\A-?[0-9]{1,18}\\z')
GROUP BY key
""",
    ("P2", "A*"),
    "MapType end-to-end: props parsed as map<string,bigint> (from_json), "
    "exploded to (key, value) rows, aggregated per key — the dynamic-"
    "schema path for semi-structured payloads whose keys are NOT known "
    "at plan time (the flagship's from_json-to-struct requires them "
    "known).  The oracle walks the same JSON with json_each.",
)
def p17_props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # map<string,string> + explicit integer filter, NOT map<string,bigint>:
    # PERMISSIVE from_json nulls the ENTIRE map when any one value fails
    # the type, silently dropping the row from every key's counts.  Both
    # sides count only integer-valued entries; the oracle quotes the key
    # inside the JSON path so '.'/'[' in key names cannot reroute it.
    # Symmetric restrictions, probed on both engines: keys containing a
    # double quote or backslash are excluded (the oracle's runtime JSON
    # path cannot express them); values must match \A-?[0-9]{1,18}\z —
    # \A/\z anchors behave identically in Java regex and RE2 (a plain $
    # does NOT: Java matches before a trailing newline), and 18 digits
    # can never overflow int64 (DuckDB ::BIGINT raises where Spark's
    # cast returns NULL, so overflow must be unreachable on both).
    kv = e.select(
        "user_id",
        F.explode(F.from_json(F.col("props"), "map<string,string>")).alias(
            "key", "value"
        ),
    ).filter(
        (F.instr(F.col("key"), '"') == 0)
        & (F.instr(F.col("key"), "\\") == 0)
        & F.col("value").rlike("\\A-?[0-9]{1,18}\\z")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("long")).alias("total"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "w8_conversion_funnel",
    """
WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
SELECT 'view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT 'view>click', count(*) FROM c
UNION ALL SELECT 'view>click>purchase', count(*) FROM p
""",
    ("W*", "J*", "A*"),
    "Ordered conversion funnel (view -> click -> purchase): each stage "
    "counts users whose first qualifying event occurs AT-OR-AFTER their "
    "previous stage's first event — the product-analytics sequence query. "
    "Expressed as three conditional-min aggregations chained by equi-joins "
    "(each stage's table shrinks monotonically), never a per-user "
    "collect+scan; every stage is partial-aggregatable and the joins key "
    "on user_id only.",
)
def w8_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def first_after(etype: str, prior: DataFrame | None, prior_ts: str, out: str):
        s = e.filter(F.col("event_type") == etype)
        if prior is not None:
            s = s.join(prior, "user_id").filter(F.col("ts") >= F.col(prior_ts))
        return s.groupBy("user_id").agg(F.min("ts").alias(out))

    # Each stage table is used twice (next stage's build + its own count)
    # and stages nest, so without a materialization barrier the events
    # scan count grows combinatorially (1+2+3 plus the count side -- 12
    # scans measured).  localCheckpoint each tiny per-user stage: 3 scans
    # total.  At 100 TB the same seam is "write each funnel stage to
    # storage" (they shrink monotonically).
    v = first_after("view", None, "", "v_ts").localCheckpoint()
    c = first_after("click", v, "v_ts", "c_ts").localCheckpoint()
    p = first_after("purchase", c, "c_ts", "p_ts")

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage(v, "view")
        .unionAll(stage(c, "view>click"))
        .unionAll(stage(p, "view>click>purchase"))
    )


@register(
    "w9_time_weighted_value",
    """
WITH spans AS (
  SELECT user_id,
         CAST(floor(coalesce(value, 0.0) * 100000000.0 + 0.5) AS BIGINT) AS vq,
         CAST(floor(epoch(ts)) AS BIGINT) AS t0,
         CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(sum(t1 - t0) AS BIGINT) AS observed_s,
       ((sum(CAST(vq AS DECIMAL(38,0)) * (t1 - t0))::VARCHAR)::DOUBLE / 100000000.0
         / CAST(sum(t1 - t0) AS DOUBLE)) AS tw_avg
FROM spans
WHERE t1 IS NOT NULL AND t1 > t0
GROUP BY user_id
""",
    ("W*", "A*"),
    "Time-weighted average (the monitoring/metrics semantics a plain AVG "
    "gets wrong when samples are irregular): each reading holds until the "
    "next one, so it weighs by its holding duration — lead() spans per "
    "user, zero-length spans dropped, decimal-exact weighted sum divided "
    "once.  One shuffle (the user window), then a partial-aggregatable "
    "groupBy.",
)
def w9_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    unix = F.floor(F.unix_timestamp(F.col("ts"))).cast("long")
    vq = F.floor(
        F.coalesce(F.col("value"), F.lit(0.0)) * F.lit(1e8) + F.lit(0.5)
    ).cast("long")
    spans = e.select(
        "user_id",
        vq.alias("vq"),
        unix.alias("t0"),
        F.floor(F.unix_timestamp(F.lead("ts").over(w))).cast("long").alias("t1"),
    ).filter(F.col("t1").isNotNull() & (F.col("t1") > F.col("t0")))
    gap = F.col("t1") - F.col("t0")
    # Weighted sum in exact integer 1e-8 units (the sessionizer's recipe):
    # double->decimal casts of arbitrary doubles round engine-dependently,
    # integer math cannot.  The per-span term vq*gap can overflow int64
    # (vq ~ value*1e8, gap in seconds), and Spark's non-ANSI long multiply
    # WRAPS silently while DuckDB promotes to INT128 — so the term is
    # widened to DECIMAL(38,0) BEFORE the multiply on both sides; the
    # exact integer decimal then converts to double through one string
    # round-trip, correctly rounded everywhere.
    return spans.groupBy("user_id").agg(
        F.sum(gap).cast("long").alias("observed_s"),
        (
            F.sum(F.col("vq").cast("decimal(38,0)") * gap)
            .cast("string")
            .cast("double")
            / F.lit(1e8)
            / F.sum(gap).cast("double")
        ).alias("tw_avg"),
    )


# ---------------------------------------------------------------------------
# T3 — time-series gap fill (calendar spine + forward fill)
# ---------------------------------------------------------------------------


@register(
    "t3_gap_fill_revenue",
    """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(CAST(o_totalprice AS DECIMAL(28,10))) AS rev_dec,
         count(*) AS n_orders
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT s.day,
       ((last_value(d.rev_dec IGNORE NULLS) OVER w)::VARCHAR)::DOUBLE AS revenue,
       coalesce(d.n_orders, 0) AS n_orders,
       CASE WHEN d.rev_dec IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine s LEFT JOIN daily d USING (day)
WINDOW w AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    ("W*", "T*", "A5"),
    "Time-series gap fill: densify the daily revenue series onto a complete "
    "sequence() calendar spine (broadcast 1-row bounds), left-join the real "
    "aggregates, and forward-fill missing days with last(ignorenulls) — "
    "gap days flagged, order counts zero-filled. The unpartitioned fill "
    "window is safe over the pre-aggregated series (one row per day).",
)
def t3_gap_fill_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        sum_exact("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    filled = gap_fill_forward(daily, "day", ["revenue"])
    return filled.select(
        "day",
        "revenue",
        F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("n_orders"),
        "is_gap",
    )


# ---------------------------------------------------------------------------
# A12 — equi-width histogram with CDF
# ---------------------------------------------------------------------------


@register(
    "a12_price_histogram",
    f"""
WITH h AS (
  SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
         count(*) AS n,
         {_sum_exact_sql('o_totalprice')} AS value_sum
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
)
SELECT bucket,
       bucket * 25000.0 AS lo,
       (bucket + 1) * 25000.0 AS hi,
       n,
       value_sum,
       CAST(n AS DOUBLE) / CAST(CAST(sum(n) OVER () AS BIGINT) AS DOUBLE) AS share,
       CAST(sum(n) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
FROM h
""",
    ("A*", "W*"),
    "Equi-width histogram of order totals with per-bucket share and a "
    "running CDF: map-side floor-bucketing into a partial-aggregatable "
    "groupBy on a tiny key space; the share/CDF windows run over the "
    "already-aggregated bucket rows.",
)
def a12_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return equi_width_histogram(
        load_table(spark, sf_dir, "orders"), "o_totalprice", 25000.0
    )


# ---------------------------------------------------------------------------
# W10 — trailing-frame z-score anomaly detection
# ---------------------------------------------------------------------------


@register(
    "w10_rolling_zscore",
    f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         {_sum_exact_sql('value')} AS daily_value
  FROM events GROUP BY 1, 2
),
q AS (
  SELECT event_type, day, daily_value,
         CAST(round(daily_value * 1000000.0) AS BIGINT) AS vq
  FROM daily
),
fr AS (
  SELECT event_type, day, daily_value, vq,
         CAST(count(*) OVER w AS BIGINT) AS frame_n,
         CAST(CAST(sum(vq) OVER w AS BIGINT) AS DOUBLE) AS s,
         ((sum(CAST(vq AS DECIMAL(38,0)) * vq) OVER w)::VARCHAR)::DOUBLE AS sq
  FROM q
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, daily_value, frame_n,
       s / frame_n / 1000000.0 AS frame_mean,
       CASE WHEN (sq / frame_n - (s / frame_n) * (s / frame_n)) > 0.5
            THEN (CAST(vq AS DOUBLE) - s / frame_n)
                 / sqrt(sq / frame_n - (s / frame_n) * (s / frame_n))
            END AS zscore,
       CASE WHEN abs(CASE WHEN (sq / frame_n - (s / frame_n) * (s / frame_n)) > 0.5
                          THEN (CAST(vq AS DOUBLE) - s / frame_n)
                               / sqrt(sq / frame_n - (s / frame_n) * (s / frame_n))
                          END) > 2.0
            THEN 1 ELSE 0 END AS is_anomaly
FROM fr
""",
    ("W*", "A*"),
    "Rolling z-score anomaly flags over per-event-type daily value series: "
    "trailing-7-row mean/variance in exact integer micro-units (round(x*1e6) "
    "quantization; the v**2 term widened to DECIMAL(38,0) before the multiply "
    "so it cannot wrap) — bit-identical under any partitioning AND any "
    "engine; a variance guard nulls near-constant frames instead of "
    "emitting NaN.",
)
def w10_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(sum_exact("value").alias("daily_value"))
    return rolling_zscore(
        daily, ["event_type"], "day", "daily_value", preceding=6, threshold=2.0
    )


# ---------------------------------------------------------------------------
# W11 — first-order Markov transition matrix over event sequences
# ---------------------------------------------------------------------------


@register(
    "w11_event_transitions",
    """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_state,
         event_type AS to_state
  FROM events
),
c AS (
  SELECT from_state, to_state, count(*) AS n_transitions
  FROM steps WHERE from_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(CAST(sum(n_transitions) OVER (PARTITION BY from_state)
                AS BIGINT) AS DOUBLE) AS p_transition
FROM c
""",
    ("W*", "A*"),
    "First-order Markov transition counts and conditional probabilities "
    "P(to|from) over per-user event sequences: one lag window on the user "
    "key, then a partial-aggregatable groupBy on the tiny state product.",
)
def w11_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# W14 — batch per-user EWMA via a pure-Catalyst sequential fold
# ---------------------------------------------------------------------------


@register(
    "w14_user_ewma_batch",
    """
SELECT user_id,
       list_reduce(list(value ORDER BY ts, event_id),
                   (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma,
       count(*) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
    ("W*", "A*"),
    "Batch twin of stream_user_ewma: the same sequential EWMA recurrence "
    "(alpha = 1/2) as a PURE CATALYST higher-order fold — collect_list "
    "sorted by (ts, event_id) then F.aggregate seeded with the first "
    "element — no UDF, no Python, and bitwise equal to both the DuckDB "
    "list_reduce oracle and the streaming stateful operator (same IEEE "
    "ops in the same order).  Sequential recurrences are the textbook "
    "'SQL can't do this' case; array higher-order functions can, with "
    "per-group memory bounded by that key's history (fine for per-user "
    "histories; the streaming op is the path when a single key's history "
    "outgrows a task).",
)
def w14_user_ewma_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    vals = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "value"))
    )
    grouped = e.groupBy("user_id").agg(
        vals.alias("h"), F.count(F.lit(1)).alias("n_events")
    )
    rest = F.slice(F.col("h"), 2, F.greatest(F.size("h") - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.get(F.col("h"), 0)["value"],
        lambda acc, x: F.lit(0.5) * x["value"] + F.lit(0.5) * acc,
    )
    return grouped.select("user_id", ewma.alias("ewma"), "n_events")


# ---------------------------------------------------------------------------
# A14 — OHLC downsampling bars
# ---------------------------------------------------------------------------


@register(
    "a14_ohlc_bars",
    """
SELECT event_type, date_trunc('day', ts) AS day,
       min(struct_pack(ts := ts, event_id := event_id, v := value)).v AS open,
       max(value) AS high, min(value) AS low,
       max(struct_pack(ts := ts, event_id := event_id, v := value)).v AS close,
       count(*) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
""",
    ("A*", "W*"),
    "Time-series downsampling to daily OHLC bars per event type: open/"
    "close are the first/last value under (ts, event_id) order, fetched "
    "with the struct-min/max idiom (struct comparison is field-by-field, "
    "so min(struct(ts, id, v)).v IS the first value) — one partial-"
    "aggregatable pass, no window, no sort: the irregular-series "
    "downsampling a metrics pipeline runs before charting or modeling.",
)
def a14_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = F.struct(F.col("ts"), F.col("event_id"), F.col("value").alias("v"))
    return (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.min(s).getField("v").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(s).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# A15 — exact weighted median
# ---------------------------------------------------------------------------


@register(
    "a15_weighted_median",
    """
WITH w AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(l_quantity) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS cum,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
)
SELECT l_returnflag, min(v) AS weighted_median,
       CAST(max(tot) AS BIGINT) AS total_weight
FROM w WHERE cum >= tot / 2 GROUP BY l_returnflag
""",
    ("A*", "W*"),
    "Exact quantity-weighted median price per return flag: the smallest "
    "value whose running weight reaches half the total — a cumulative-"
    "sum window + filter + min, the weighted generalization nearest-rank "
    "percentiles can't express.  Weights are integral quantities, so "
    "every double sum here is exact regardless of accumulation order "
    "(integers < 2^53) — no decimal accumulator needed, and the oracle "
    "is bitwise safe by construction.",
)
def a15_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # Weighted median over scoreable rows: a NULL value has no rank
    # position (its sort slot is engine-dependent) and a NULL weight
    # contributes nothing — both are excluded, mirrored in the oracle.
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull() & F.col("l_quantity").isNotNull()
    )
    cum_w = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(cum_w).alias("cum"),
        F.sum("l_quantity").over(tot_w).alias("tot"),
    )
    return (
        ranked.filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tot").cast("long").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# A19 — Pareto frontier (2-D skyline) via bucket-pruned two-phase plan
# ---------------------------------------------------------------------------


@register(
    "a19_pareto_frontier",
    """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
  AND NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p_retailprice, p_partkey
""",
    ("W*", "J*"),
    "2-D skyline: parts not dominated on (cheaper price, larger size). "
    "The oracle is the O(n^2) NOT EXISTS definition; the Spark plan is "
    "the two-phase bucket-pruned algorithm (operators/analytic.py::"
    "pareto_frontier_2d): a ~100-key bucket aggregate prunes everything "
    "dominated by a strictly-cheaper bucket's max, then the exact "
    "dominance test runs over the surviving ~frontier-sized candidate "
    "set.  Corpus work is one scan + one broadcast join; the only "
    "single-task windows run over the bucket table and the candidate "
    "cost-group table (both tiny, the documented allowance).",
)
def a19_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return pareto_frontier_2d(
        part,
        cost_col="p_retailprice",
        gain_col="p_size",
        key_col="p_partkey",
        bucket_width=1.0,
    )


# ---------------------------------------------------------------------------
# W16 — last-touch attribution (purchase value -> latest preceding touch)
# ---------------------------------------------------------------------------


@register(
    "w16_last_touch_attribution",
    f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events
)
SELECT coalesce(touch_type, 'none') AS touch_type,
       count(*) AS n_purchases,
       {_sum_exact_sql('value')} AS attributed_value
FROM tagged
WHERE event_type = 'purchase'
GROUP BY touch_type
ORDER BY touch_type
""",
    ("W*", "A*"),
    "Last-touch attribution: every purchase's value is credited to the "
    "user's most recent preceding marketing touch (view or click), or "
    "'none' if the purchase had no prior touch.  last_value(IGNORE "
    "NULLS) over a ROWS ... 1 PRECEDING frame per user — one shuffle on "
    "user_id, per-partition sort, then a partial-aggregatable groupBy "
    "on a 3-key space.  Exact-decimal value accumulation.",
)
def w16_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("touch_type", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            sum_exact("value").alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# T4 — forward as-of join (next-event lookup)
# ---------------------------------------------------------------------------


@register(
    "t4_next_shipment_asof",
    """
WITH lcompact AS (
  SELECT l_orderkey, l_shipdate, min(l_linenumber) AS first_linenumber
  FROM lineitem GROUP BY l_orderkey, l_shipdate
)
SELECT o.o_orderkey,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS order_unix,
       CAST(floor(epoch(l.l_shipdate)) AS BIGINT) AS first_ship_unix,
       (CAST(floor(epoch(l.l_shipdate)) AS BIGINT)
        - CAST(floor(epoch(o.o_orderdate)) AS BIGINT)) // 86400 AS lag_days,
       l.first_linenumber
FROM (SELECT * FROM orders WHERE o_orderdate IS NOT NULL) o
ASOF LEFT JOIN lcompact l
  ON o.o_orderkey = l.l_orderkey AND o.o_orderdate <= l.l_shipdate
""",
    ("T*", "J*"),
    "FORWARD as-of join: each order picks up its first shipment at-or-"
    "after the order date (next-event lookup — the mirror of t1's "
    "point-in-time enrichment).  Same union-tag single-shuffle algorithm "
    "with the per-key sort reversed (operators/analytic.py::as_of_join "
    "direction='forward'); right side pre-compacted to one row per "
    "(orderkey, shipdate) for determinism.  The oracle is DuckDB's "
    "native ASOF JOIN with the inequality flipped.",
)
def t4_next_shipment_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contract: orders with a known order date (a ship lag from an
    # unknown date is undefined).  Also dodges a DuckDB ASOF quirk where
    # a NULL probe timestamp matches the smallest right row instead of
    # nothing.
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem")
    lcompact = (
        li.groupBy("l_orderkey", "l_shipdate")
        .agg(F.min("l_linenumber").alias("first_linenumber"))
        .withColumn("first_ship_unix", F.unix_timestamp("l_shipdate"))
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_shipdate",
            "first_ship_unix",
            "first_linenumber",
        )
    )
    joined = as_of_join(
        o,
        lcompact,
        key="o_orderkey",
        left_ts="o_orderdate",
        right_ts="l_shipdate",
        carry_cols=["first_ship_unix", "first_linenumber"],
        direction="forward",
    )
    order_unix = F.unix_timestamp("o_orderdate")
    return joined.select(
        "o_orderkey",
        order_unix.alias("order_unix"),
        "first_ship_unix",
        F.expr("(first_ship_unix - unix_timestamp(o_orderdate)) DIV 86400").alias(
            "lag_days"
        ),
        "first_linenumber",
    )


# ---------------------------------------------------------------------------
# W17 — ratio-to-report (share of parent total, integer-exact)
# ---------------------------------------------------------------------------


@register(
    "w17_nation_revenue_share",
    """
WITH nat AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region_name, nation_name, rev_cents,
       CAST((1000000 * rev_cents)
         // sum(rev_cents) OVER (PARTITION BY region_name) AS BIGINT)
         AS share_ppm
FROM nat
ORDER BY region_name, nation_name
""",
    ("W*", "A*", "J*"),
    "Ratio-to-report: each nation's order revenue as an integer-exact ppm "
    "share of its region's total.  Revenue enters as floor(price*100) "
    "cents so every sum and the share division stay in exact integer "
    "arithmetic.  One fact shuffle (orders->customer), two broadcast dim "
    "joins, then a window partitioned by region over the 25-row nation "
    "rollup — partitioned, never single-task.",
)
def w17_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    nat = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("region_name")
    return nat.select(
        "region_name",
        "nation_name",
        "rev_cents",
        F.expr(
            "1000000 * rev_cents DIV sum(rev_cents)"
            " OVER (PARTITION BY region_name)"
        ).alias("share_ppm"),
    ).orderBy("region_name", "nation_name")


# ---------------------------------------------------------------------------
# W18 — peak concurrent sessions (distributed sweep-line / prefix sum)
# ---------------------------------------------------------------------------


@register(
    "w18_peak_concurrency",
    """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, session_id,
         min(CAST(floor(epoch(ts)) AS BIGINT)) AS s,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS e
  FROM (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM marked
  ) GROUP BY user_id, session_id
),
deltas AS (
  SELECT s AS t, 1 AS d, user_id, session_id FROM sess
  UNION ALL
  SELECT e AS t, -1 AS d, user_id, session_id FROM sess
),
run AS (
  SELECT t, d,
         CAST(sum(d) OVER (ORDER BY t, d DESC, user_id, session_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS c
  FROM deltas
),
by_day AS (
  SELECT (t // 86400) * 86400 AS day_unix,
         CAST(max(greatest(c, c - d)) AS BIGINT) AS peak_concurrency,
         count(*) AS n_changes
  FROM run GROUP BY (t // 86400) * 86400
),
day_net AS (
  SELECT (t // 86400) * 86400 AS day_unix, CAST(sum(d) AS BIGINT) AS net
  FROM deltas GROUP BY (t // 86400) * 86400
),
spine AS (
  SELECT unnest(generate_series(mn, mx, 86400)) AS day_unix
  FROM (SELECT min(day_unix) AS mn, max(day_unix) AS mx FROM day_net)
),
carry AS (
  SELECT s.day_unix, n.net IS NOT NULL AS has_deltas,
         CAST(coalesce(sum(coalesce(n.net, 0)) OVER (ORDER BY s.day_unix
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS carry_in
  FROM spine s LEFT JOIN day_net n ON n.day_unix = s.day_unix
)
SELECT day_unix, peak_concurrency, n_changes FROM by_day
UNION ALL
SELECT day_unix, carry_in AS peak_concurrency, CAST(0 AS BIGINT) AS n_changes
FROM carry WHERE NOT has_deltas AND carry_in > 0
ORDER BY day_unix
""",
    ("W*", "A*"),
    "Peak concurrent sessions per day — the sweep-line algorithm, "
    "DISTRIBUTED: session starts are +1 deltas and ends are -1, and the "
    "global running sum decomposes into (a) per-day delta totals with a "
    "running carry-in over the ~|days| spine (tiny single-task window, "
    "the documented allowance) plus (b) a within-day running sum "
    "PARTITIONED by day — the textbook two-level prefix-sum "
    "decomposition, so no corpus-sized ordered window exists anywhere "
    "in the plan.  The oracle is the single global running sum the "
    "naive formulation would use.  Ties: starts sort before ends at "
    "equal timestamps (d DESC), so back-to-back sessions overlap at "
    "the boundary instant.  Peak is the SUSTAINED max: each event "
    "contributes greatest(c, c - d) so a day opening on an end still "
    "reports its carry-in plateau, and delta-free days inside a long "
    "open session are emitted from the day spine (peak = carry_in, "
    "n_changes = 0).",
)
def w18_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = session_stats(load_table(spark, sf_dir, "events"), gap_seconds=1800)
    return interval_peak_concurrency(
        sessions,
        start_col="session_start_unix",
        end_col="session_end_unix",
        tiebreak_cols=("user_id", "session_id"),
    )


# ---------------------------------------------------------------------------
# A21 — per-group mode / argmax (deterministic tie-breaks)
# ---------------------------------------------------------------------------


@register(
    "a21_modal_order_month",
    """
WITH m AS (
  SELECT o_orderpriority,
         date_trunc('month', o_orderdate) AS month,
         count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month AS modal_month, n_orders FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY n_orders DESC, month) AS rn
  FROM m
) WHERE rn = 1
ORDER BY o_orderpriority
""",
    ("A*", "W*"),
    "Per-group mode (argmax): the busiest order month per priority, ties "
    "broken toward the earliest month.  Expressed as max(struct(n, "
    "-epoch, month)) — a pure partial-aggregatable aggregate, NO window "
    "over the detail rows: the shuffle carries one struct per (priority, "
    "month), and the mode falls out of the final max.  The oracle uses "
    "the textbook row_number formulation to prove the struct-max trick "
    "picks the identical row.",
)
def a21_modal_order_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    # argmax via struct ordering: (n_orders asc, neg_epoch asc) maxed ==
    # (n_orders desc, month asc) first — earliest month wins ties.
    s = F.struct(
        F.col("n_orders"),
        (-F.unix_timestamp("month")).alias("neg"),
        F.col("month"),
    )
    return (
        m.groupBy("o_orderpriority")
        .agg(F.max(s).alias("m"))
        .select(
            "o_orderpriority",
            F.col("m.month").alias("modal_month"),
            F.col("m.n_orders").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# W19 — gaps and islands (longest consecutive-active-day streak)
# ---------------------------------------------------------------------------


@register(
    "w19_activity_streaks",
    """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, count(*) AS len,
         min(d) * 86400 AS start_unix
  FROM islands GROUP BY user_id, grp
)
SELECT user_id,
       max(len) AS longest_streak,
       count(*) AS n_streaks,
       min(start_unix) AS first_active_unix
FROM streaks GROUP BY user_id
ORDER BY user_id
""",
    ("W*", "A*"),
    "Gaps-and-islands: per user, the longest run of CONSECUTIVE active "
    "days, the number of distinct runs, and first activity.  The classic "
    "day_number - row_number() island key — constant within a "
    "consecutive run, breaks at every gap — over the (user, day) dedup. "
    "One shuffle for the dedup, one user-partitioned window, two "
    "partial-aggregatable groupBys; nothing corpus-ordered.",
)
def w19_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id",
        F.expr(
            "CAST(floor(unix_timestamp(date_trunc('day', ts))) AS BIGINT)"
            " DIV 86400"
        ).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        (F.min("d") * 86400).alias("start_unix"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.min("start_unix").alias("first_active_unix"),
        )
        .orderBy("user_id")
    )


@register(
    "a22_kmv_distinct_users",
    """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
kept AS (SELECT event_type, hv FROM r WHERE rn <= 64),
per_type AS (
  SELECT event_type, count(*)::BIGINT AS n_kept, max(hv) AS hk
  FROM kept GROUP BY event_type
),
pool AS (SELECT DISTINCT hv FROM kept),
pr AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM pool),
merged AS (
  SELECT '__all__' AS event_type, count(*)::BIGINT AS n_kept, max(hv) AS hk
  FROM pr WHERE rn <= 64
),
sketches AS (SELECT * FROM per_type UNION ALL SELECT * FROM merged)
SELECT event_type, n_kept, hk,
       CASE WHEN n_kept < 64 THEN n_kept
            ELSE floor(63.0 * (1152921504606846976.0 / hk))::BIGINT
       END AS kmv_est
FROM sketches
ORDER BY event_type
""",
    ("A8", "X*"),
    "KMV (k-minimum-values) distinct sketch, k=64: hash user_id to a "
    "uniform 60-bit value, keep each group's 64 smallest distinct "
    "hashes, estimate |distinct| = (k-1)/h_k (exact count when the "
    "group holds fewer than k).  The '__all__' row is MERGED from the "
    "per-group sketches alone — the global k smallest of the union of "
    "group k-min sets, never re-reading raw data — the property that "
    "lets 10,000 partition sketches roll up to any grouping at 100 TB. "
    "The rank<=k pruning is map-side (WindowGroupLimit: each exchange "
    "carries at most k rows per group per partition), and the merge "
    "window runs over the <= |groups|*k pooled rows, never the corpus. "
    "Estimate arithmetic is ratio-first double (identical IEEE op "
    "sequence in both engines), floored to a hash-stable integer.",
)
def a22_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = (
        events.filter(F.col("user_id").isNotNull())
        .select("event_type", hv.alias("hv"))
        .distinct()
    )
    by_type = Window.partitionBy("event_type").orderBy("hv")
    kept = (
        h.withColumn("rn", F.row_number().over(by_type))
        .filter(F.col("rn") <= 64)
        .select("event_type", "hv")
    )
    per_type = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("hk")
    )
    pool = kept.select("hv").distinct()
    merged = (
        pool.withColumn("rn", F.row_number().over(Window.orderBy("hv")))
        .filter(F.col("rn") <= 64)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("hk"))
        .select(F.lit("__all__").alias("event_type"), "n_kept", "hk")
    )
    sketches = per_type.unionByName(merged)
    est = F.when(F.col("n_kept") < 64, F.col("n_kept")).otherwise(
        F.floor(F.lit(63.0) * (F.lit(1152921504606846976.0) / F.col("hk")))
    )
    return sketches.select(
        "event_type",
        F.col("n_kept").cast("long").alias("n_kept"),
        "hk",
        est.cast("long").alias("kmv_est"),
    ).orderBy("event_type")


_QSK_SRC_SQL = """
  SELECT event_type, value::DOUBLE AS v,
         ('0x' || substr(md5('qsk:' || event_id::VARCHAR), 1, 15))::BIGINT
           AS hv
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
"""

_QSK_QCOLS_SQL = """
       max(CASE WHEN rnk = greatest(1, CAST(ceil(0.25 * n_all) AS BIGINT))
                THEN v END) AS q25,
       max(CASE WHEN rnk = greatest(1, CAST(ceil(0.5 * n_all) AS BIGINT))
                THEN v END) AS q50,
       max(CASE WHEN rnk = greatest(1, CAST(ceil(0.9 * n_all) AS BIGINT))
                THEN v END) AS q90,
       max(CASE WHEN rnk = greatest(1, CAST(ceil(0.99 * n_all) AS BIGINT))
                THEN v END) AS q99
"""


# Shared with the streaming register-maintenance twin
# (stream_quantile_sketch): the batch sketch IS the streaming final
# state, so both gates run the SAME oracle and cannot drift — the
# HLL_USERS_ORACLE convention.
QSK_EVENTS_ORACLE = f"""
WITH src AS ({_QSK_SRC_SQL}),
pool AS (
  SELECT event_type, v FROM (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY hv, v) AS rn
    FROM src) WHERE rn <= 256
),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n_all
  FROM pool
)
SELECT event_type, count(*)::BIGINT AS n_kept,
{_QSK_QCOLS_SQL}
FROM ranked GROUP BY event_type ORDER BY event_type
"""


@register(
    "a23_quantile_sketch",
    QSK_EVENTS_ORACLE,
    ("A5", "X*"),
    "Mergeable quantile sketch, k=256: per event_type keep the 256 rows "
    "with the smallest salted md5 row hash (the row-sampling analogue "
    "of a22's k-minimum-values) and read quantiles off the sample's "
    "order statistics — value at sample rank ceil(q*n_kept), EXACT when "
    "the group holds fewer than k rows.  Hash-ordered instead of "
    "KLL/GK compaction so the sketch is a function of the row SET, not "
    "arrival order: bitwise cross-engine reproducible and exactly "
    "mergeable (a24).  Rank error obeys the Hoeffding sampling bound "
    "P(err > eps*n) <= 2*exp(-2*k*eps^2) (mergeable-summaries, PODS "
    "2012), pinned in tests/test_quality_sketches.py.  The rank<=k "
    "prune is map-side (WindowGroupLimit: each exchange carries at most "
    "k rows per group per partition); every later window runs over the "
    "<= groups*k pool, never the corpus.  operators/sketches.py.",
)
def a23_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import qsk_pool, qsk_quantiles

    pool = qsk_pool(
        load_table(spark, sf_dir, "events"), "value", "event_id",
        ["event_type"],
    )
    return qsk_quantiles(pool, ["event_type"]).orderBy("event_type")


@register(
    "a24_quantile_sketch_rollup",
    f"""
WITH src AS ({_QSK_SRC_SQL}),
pool AS (      -- the oracle sketches the whole corpus DIRECTLY ...
  SELECT v FROM (
    SELECT v, row_number() OVER (ORDER BY hv, v) AS rn FROM src)
  WHERE rn <= 256
),
ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rnk, count(*) OVER () AS n_all
  FROM pool
)
SELECT '__all__' AS scope, count(*)::BIGINT AS n_kept,
{_QSK_QCOLS_SQL}
FROM ranked
""",
    ("A5", "A8", "X*"),
    "Quantile-sketch MERGE: the per-event-type pools from a23 are merged "
    "(union, re-take bottom-k by hash) into one global sketch WITHOUT "
    "rescanning the input — every row of the global bottom-k is in its "
    "own group's bottom-k, so merged-per-group == whole-corpus EXACTLY, "
    "the a11 rollup property for quantiles.  The oracle computes the "
    "global sketch STRAIGHT FROM RAW ROWS while Spark merges per-group "
    "pools, so the driver's hash-match is a cross-engine PROOF of the "
    "merge identity, not a re-run of the same plan.  Emits exactly one "
    "row (global aggregate) — NULL quantiles with n_kept=0 on an empty "
    "corpus, both engines.  operators/sketches.py.",
)
def a24_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import qsk_merge, qsk_pool, qsk_quantiles

    pools = qsk_pool(
        load_table(spark, sf_dir, "events"), "value", "event_id",
        ["event_type"],
    )
    merged = qsk_merge(pools)
    return qsk_quantiles(merged, []).select(
        F.lit("__all__").alias("scope"), "n_kept", "q25", "q50", "q90", "q99"
    )


@register(
    "w20_median_event_gap",
    """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
per_user AS (
  SELECT user_id, list_sort(list(gap_us)) AS g
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       len(g)::BIGINT AS n_gaps,
       CASE WHEN len(g) % 2 = 1 THEN g[(len(g) + 1) // 2]
            ELSE (g[len(g) // 2] + g[len(g) // 2 + 1]) // 2
       END AS median_gap_us
FROM per_user
ORDER BY user_id
""",
    ("W*", "A*"),
    "Exact per-user median inter-event gap (the engagement-cadence "
    "metric): lag-computed gaps in integer micros, grouped median via "
    "sort_array over each user's OWN gap list (bounded by per-user "
    "event count, never corpus-sized), even-count medians as the "
    "integer-floor midpoint — no interpolated float median, so the "
    "value hashes identically in both engines.  Complements a15 "
    "(global weighted median via two-phase selection): per-group "
    "medians with bounded groups sort in-group; a global median must "
    "not.",
)
def w20_median_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    per_user = gaps.groupBy("user_id").agg(
        F.sort_array(F.collect_list("gap_us")).alias("g")
    )
    n = F.size("g")
    med = F.when(
        n % 2 == 1, F.element_at("g", ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at("g", (n / 2).cast("int"))
            + F.element_at("g", (n / 2 + 1).cast("int"))
        ).cast("long")
        / 2
    ).cast("long")
    return per_user.select(
        "user_id",
        n.cast("long").alias("n_gaps"),
        med.alias("median_gap_us"),
    ).orderBy("user_id")


_KMV_SETOPS_BASE_SQL = """
h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
  FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('purchase', 'click')
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
kept AS (SELECT event_type, hv FROM r WHERE rn <= 64),
sa AS (SELECT count(*)::BIGINT AS n_a, max(hv) AS hk_a
       FROM kept WHERE event_type = 'purchase'),
sb AS (SELECT count(*)::BIGINT AS n_b, max(hv) AS hk_b
       FROM kept WHERE event_type = 'click'),
th AS (
  SELECT least(
           CASE WHEN n_a < 64 THEN 1152921504606846976 ELSE hk_a END,
           CASE WHEN n_b < 64 THEN 1152921504606846976 ELSE hk_b END
         ) AS theta
  FROM sa, sb
),
s AS (
  SELECT count(*)::BIGINT AS n_s
  FROM kept a
  JOIN kept b ON a.hv = b.hv
  CROSS JOIN th
  WHERE a.event_type = 'purchase' AND b.event_type = 'click'
    AND a.hv < th.theta
),
pool AS (SELECT DISTINCT hv FROM kept),
pu AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM pool),
su AS (SELECT count(*)::BIGINT AS n_u, max(hv) AS hk_u FROM pu WHERE rn <= 64),
ex AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('purchase', 'click')
),
exa AS (
  SELECT sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS exact_a,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS exact_b
  FROM ex
),
exu AS (
  SELECT count(*)::BIGINT AS exact_union,
         sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END)::BIGINT AS exact_inter
  FROM (SELECT user_id, count(*) AS nt FROM ex GROUP BY user_id)
)
"""


@register(
    "a25_kmv_set_ops",
    f"""
WITH {_KMV_SETOPS_BASE_SQL}
SELECT exact_a, exact_b, exact_union, exact_inter,
       CASE WHEN n_a < 64 THEN n_a
            ELSE floor(63.0 * (1152921504606846976.0 / hk_a))::BIGINT
       END AS est_a,
       CASE WHEN n_b < 64 THEN n_b
            ELSE floor(63.0 * (1152921504606846976.0 / hk_b))::BIGINT
       END AS est_b,
       CASE WHEN n_u < 64 THEN n_u
            ELSE floor(63.0 * (1152921504606846976.0 / hk_u))::BIGINT
       END AS union_est,
       n_s,
       CASE WHEN theta = 1152921504606846976 THEN n_s
            ELSE floor(n_s::DOUBLE * (1152921504606846976.0 / theta))::BIGINT
       END AS inter_est
FROM sa, sb, th, s, su, exa, exu
""",
    ("A8", "X*"),
    "KMV/theta-sketch SET OPERATIONS, k=64: union, intersection, and "
    "Jaccard between two user populations (purchase vs click actors) "
    "computed from the two 64-minimum-value sketches ALONE — the raw "
    "corpus is touched once to build the sketches, never again.  Union "
    "sketch = bottom-k of the pooled k-min sets (a22's merge).  "
    "Intersection uses the theta-sketch estimator (Dasgupta et al., "
    "'Theta-Sketch Framework'): theta = min of the two sketches' k-th "
    "minima (2^60 when a side is unsaturated, i.e. exact); survivors "
    "S = {h in kA and kB, h < theta} are a uniform sample of the true "
    "intersection below theta, so |A inter B| ~= |S| * 2^60/theta — "
    "EXACT when both sides are unsaturated.  Exact counts ride along as "
    "the recall-report audit (the x3_ann_recall_report pattern): at "
    "sf0.01 the exact pass is cheap; at 100 TB you'd drop the exact "
    "columns and keep the sketch path, whose shuffle is <= 2*k rows. "
    "All estimator arithmetic is the same IEEE op sequence in both "
    "engines (ratio-first double, floored to int); the rank<=k prune is "
    "map-side (WindowGroupLimit).  No jaccard double column: the "
    "estimate is inter_est/union_est, derivable from the two exact-int "
    "columns — keeping the row all-integer keeps the hash gate strict.",
)
def a25_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    two60 = 1152921504606846976  # 2^60: md5-prefix hash space (15 hex digits)
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select("event_type", hv.alias("hv"))
        .distinct()
    )
    byt = Window.partitionBy("event_type").orderBy("hv")
    # the two k-min sketches: <= 2*64 rows with corpus-scale lineage and
    # FOUR consumers (two per-population stats, the intersection probe,
    # the union pool) — exactly the persisted_intermediate contract; the
    # corpus is scanned once to build this, never again
    kept = persisted_intermediate(
        base.withColumn("rn", F.row_number().over(byt))
        .filter(F.col("rn") <= 64)
        .select("event_type", "hv"),
        "<= 2*k = 128 rows",
    )
    ka = kept.filter(F.col("event_type") == "purchase").select("hv")
    kb = kept.filter(F.col("event_type") == "click").select("hv")
    sa = ka.agg(F.count(F.lit(1)).alias("n_a"), F.max("hv").alias("hk_a"))
    sb = kb.agg(F.count(F.lit(1)).alias("n_b"), F.max("hv").alias("hk_b"))
    theta = F.least(
        F.when(F.col("n_a") < 64, F.lit(two60)).otherwise(F.col("hk_a")),
        F.when(F.col("n_b") < 64, F.lit(two60)).otherwise(F.col("hk_b")),
    ).alias("theta")
    th = sa.crossJoin(F.broadcast(sb)).select("n_a", "hk_a", "n_b", "hk_b", theta)
    s_row = (
        ka.join(F.broadcast(kb), "hv")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("n_s"))
    )
    # Union sketch: bottom-k of the pooled per-population k-min sets.  The
    # unpartitioned window is over <= 2*k pooled rows (aggregate-bounded).
    pool = kept.select("hv").distinct()
    su = (
        pool.withColumn("rn", F.row_number().over(Window.orderBy("hv")))
        .filter(F.col("rn") <= 64)
        .agg(F.count(F.lit(1)).alias("n_u"), F.max("hv").alias("hk_u"))
    )
    # Exact audit columns (drop these at 100 TB; see docstring).  ONE
    # pass: per-user membership flags (max absorbs duplicate events, so
    # no distinct pre-shuffle), then one global aggregate.
    exact = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "has_a"
            ),
            F.max((F.col("event_type") == "click").cast("int")).alias(
                "has_b"
            ),
        )
        .agg(
            F.sum("has_a").cast("long").alias("exact_a"),
            F.sum("has_b").cast("long").alias("exact_b"),
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(F.col("has_a") * F.col("has_b"))
            .cast("long")
            .alias("exact_inter"),
        )
    )

    def est(n: str, hk: str):  # a22's estimator, identical op order
        return F.when(F.col(n) < 64, F.col(n)).otherwise(
            F.floor(F.lit(63.0) * (F.lit(1152921504606846976.0) / F.col(hk)))
        )

    return (
        th.crossJoin(F.broadcast(s_row))
        .crossJoin(F.broadcast(su))
        .crossJoin(F.broadcast(exact))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            est("n_a", "hk_a").cast("long").alias("est_a"),
            est("n_b", "hk_b").cast("long").alias("est_b"),
            est("n_u", "hk_u").cast("long").alias("union_est"),
            "n_s",
            F.when(F.col("theta") == two60, F.col("n_s"))
            .otherwise(
                F.floor(
                    F.col("n_s").cast("double")
                    * (F.lit(1152921504606846976.0) / F.col("theta"))
                )
            )
            .cast("long")
            .alias("inter_est"),
        )
    )


@register(
    "t5_scd2_history",
    """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WHERE user_id IS NOT NULL
),
versioned AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS version
  FROM flagged
),
runs AS (
  SELECT user_id, version::BIGINT AS version, event_type,
         min(ts) AS effective_from, count(*)::BIGINT AS n_events
  FROM versioned GROUP BY user_id, version, event_type
)
SELECT user_id, version, event_type, effective_from,
       lead(effective_from)
         OVER (PARTITION BY user_id ORDER BY version) AS effective_to,
       n_events,
       (lead(effective_from)
          OVER (PARTITION BY user_id ORDER BY version) IS NULL) AS is_current
FROM runs
ORDER BY user_id, version
""",
    ("T*", "A7"),
    "SCD TYPE-2 HISTORY BUILD: collapse each user's event-type change "
    "stream into slowly-changing-dimension validity intervals — one row "
    "per consecutive run with [effective_from, effective_to) bounds, a "
    "monotone version number, and a NULL-open is_current row — the "
    "standard dimension-history shape a warehouse maintains from CDC "
    "feeds.  Change detection is lag() IS DISTINCT FROM (first row of "
    "a user counts as a change), version is the running sum of change "
    "flags (the gaps-and-islands id, as w19), effective_to is the NEXT "
    "run's effective_from via lead() — intervals tile each user's "
    "timeline with no gaps and no overlaps by construction.  Scale: "
    "two user-partitioned windows and one partial-aggregatable groupBy; "
    "nothing corpus-ordered, skew bounded by per-user event counts; "
    "ties broken by event_id so the row set (and its hash) is total-"
    "order deterministic in both engines.",
)
def t5_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    # exactly IS DISTINCT FROM: null-safe on BOTH sides (the perturbation
    # corpora inject NULL event_types; lag's leading NULL counts as change)
    chg = (~prev.eqNullSafe(F.col("event_type"))).cast("int")
    versioned = events.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("version"),
    )
    runs = versioned.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("effective_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    eff_to = F.lead("effective_from").over(wv)
    return runs.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "event_type",
        "effective_from",
        eff_to.alias("effective_to"),
        F.col("n_events").cast("long").alias("n_events"),
        eff_to.isNull().alias("is_current"),
    ).orderBy("user_id", "version")


@register(
    "t6_interval_overlap_join",
    """
WITH activity AS (
  SELECT user_id, min(epoch_us(ts)) AS a_start, max(epoch_us(ts)) AS a_end
  FROM events WHERE user_id IS NOT NULL AND event_type <> 'error'
  GROUP BY user_id, date_trunc('week', ts)
),
incidents AS (
  SELECT user_id, min(epoch_us(ts)) AS i_start,
         max(epoch_us(ts)) + 1 AS i_end
  FROM events WHERE user_id IS NOT NULL AND event_type = 'error'
  GROUP BY user_id, date_trunc('day', ts)
),
pairs AS (
  SELECT a.user_id,
         least(a.a_end, i.i_end - 1) - greatest(a.a_start, i.i_start)
           AS ov_us,
         i.i_start
  FROM activity a JOIN incidents i
    ON a.user_id = i.user_id
   AND a.a_start < i.i_end AND i.i_start <= a.a_end
)
SELECT user_id,
       count(*)::BIGINT AS n_overlap_pairs,
       count(DISTINCT i_start)::BIGINT AS n_incidents,
       sum(ov_us)::BIGINT AS total_overlap_us
FROM pairs GROUP BY user_id
ORDER BY user_id
""",
    ("T*", "J*", "W*"),
    "INTERVAL OVERLAP JOIN, banded: per-user WEEKLY activity intervals "
    "(non-error events, [first, last] inclusive, up to 7 days wide) "
    "joined to the same user's DAILY error-incident windows ([first, "
    "last+1us) half-open) on temporal overlap — the blast-radius "
    "temporal join (which activity windows were exposed to which "
    "incidents) that a naive engine plans as a per-key inequality "
    "cross product.  The scale plan bands the WIDE side: each activity "
    "interval explodes into its covered day buckets (sequence: <= 8 "
    "rows, a constant) and equi-joins on (user, day) — an incident "
    "lies inside ONE day by construction, so every true pair is found "
    "in exactly one bucket (no dedup, nothing double-counted) and the "
    "exact overlap predicate filters band false positives.  Shuffle is "
    "|user-weeks|*8 + |user-day incidents| on a composite equi-key, "
    "never a per-user cross product.  The DuckDB oracle runs the NAIVE "
    "inequality join, so the hash match is a cross-engine proof the "
    "banding loses and invents nothing (row counts asserted non-zero "
    "in pytest — the sf0.01 corpus produces thousands of pairs, so the "
    "gate cannot pass vacuously).  Overlap microseconds are exact "
    "integers (least/greatest of epoch_us), aggregated per user.",
)
def t6_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    day_us = 86_400 * 1_000_000
    activity = (
        events.filter(F.col("event_type") != "error")
        .groupBy("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
        .agg(
            F.min(F.unix_micros("ts")).alias("a_start"),
            F.max(F.unix_micros("ts")).alias("a_end"),
        )
        .drop("wk")
    )
    incidents = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.min(F.unix_micros("ts")).alias("i_start"),
            (F.max(F.unix_micros("ts")) + 1).alias("i_end"),
        )
        .withColumn(
            # floor, not cast-truncation: long/long division is a double
            # and cast truncates TOWARD ZERO, so a pre-1970 (negative
            # epoch) timestamp would bucket one day high and silently
            # drop true overlap pairs vs the naive-join oracle.  The
            # day-boundary epochs here are exactly divisible (date_trunc)
            # so the double quotient is exact and floor is bitwise-safe.
            "day_idx",
            F.floor(F.unix_micros("d") / day_us).cast("long"),
        )
        .drop("d")
        .withColumnRenamed("user_id", "i_user")
    )
    # band the wide (weekly) side into its covered days: <= 8 constant rows
    banded = activity.withColumn(
        "day_idx",
        F.explode(
            # floor-division (see day_idx note): mid-day epochs are
            # integers microseconds, so the double quotient can only
            # land exactly ON an integer when the epoch is exactly
            # divisible — floor is therefore exact for every input,
            # negative epochs included.
            F.sequence(
                F.floor(F.col("a_start") / day_us).cast("long"),
                F.floor(F.col("a_end") / day_us).cast("long"),
            )
        ),
    )
    pairs = banded.join(
        incidents,
        (banded.user_id == incidents.i_user)
        & (banded.day_idx == incidents.day_idx)
        & (banded.a_start < incidents.i_end)
        & (incidents.i_start <= banded.a_end),
    ).select(
        "user_id",
        "i_start",
        (
            F.least(F.col("a_end"), F.col("i_end") - 1)
            - F.greatest(F.col("a_start"), F.col("i_start"))
        ).alias("ov_us"),
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlap_pairs"),
            F.countDistinct("i_start").alias("n_incidents"),
            F.sum("ov_us").cast("long").alias("total_overlap_us"),
        )
        .orderBy("user_id")
    )
