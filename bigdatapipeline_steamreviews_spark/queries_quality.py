"""Registered data-quality / robust-statistics queries (builder
extensions: the reference validates nothing between its CSV feed and its
aggregates — ``summarizer.py:40-58`` — so this family is the ingest gate a
production pipeline adds in front of the reference's processing).

Families here:
* ``dq_*``   — Deequ-style column profile + declarative constraint suite;
* ``a13``    — winsorized (clamped-tail) robust mean;
* ``p18``    — skew-resistant deterministic per-key reservoir sample;
* ``w12``    — trailing-7-day distinct users (the metric window frames
               can't express);
* ``j5``     — eager-aggregation join pushdown (partial agg below the
               join, a rewrite Catalyst does not perform itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import count_if
from .operators.quality import (
    EVENTS_CHECKSUM_ORACLE_EXPR,
    column_profile,
    events_checksum_row_hash,
    constraint_report,
    per_key_top_hash,
    sliding_distinct_count,
    winsorized_stats,
)
from .registry import _avg_exact_sql, register
from .sources.tables import load_table


# ---------------------------------------------------------------------------
# DQ — column profile
# ---------------------------------------------------------------------------


@register(
    "dq_column_profile",
    """
SELECT 'o_orderkey' AS col, count(*) AS n_rows,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       min(o_orderkey)::DOUBLE AS min_num, max(o_orderkey)::DOUBLE AS max_num,
       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       CAST(count(*) - count(o_custkey) AS BIGINT),
       count(DISTINCT o_custkey),
       min(o_custkey)::DOUBLE, max(o_custkey)::DOUBLE, NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       count(DISTINCT o_totalprice),
       min(o_totalprice), max(o_totalprice), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*),
       CAST(count(*) - count(o_orderdate) AS BIGINT),
       count(DISTINCT o_orderdate),
       CAST(floor(epoch(min(o_orderdate))) AS BIGINT)::DOUBLE,
       CAST(floor(epoch(max(o_orderdate))) AS BIGINT)::DOUBLE, NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*),
       CAST(count(*) - count(o_orderstatus) AS BIGINT),
       count(DISTINCT o_orderstatus),
       NULL::DOUBLE, NULL::DOUBLE, min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       CAST(count(*) - count(o_orderpriority) AS BIGINT),
       count(DISTINCT o_orderpriority),
       NULL::DOUBLE, NULL::DOUBLE, min(o_orderpriority), max(o_orderpriority)
FROM orders
""",
    ("A*", "P*"),
    "Deequ-style one-pass column profile of the orders table: per column "
    "row/null/distinct counts plus typed min/max (timestamps as epoch "
    "seconds).  One scan, one Expand-based multi-distinct aggregate, then "
    "an explode into the per-column report — the oracle's 6-way UNION ALL "
    "rescans the table per column precisely because SQL has no one-pass "
    "form, which is the point of the operator.",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return column_profile(
        load_table(spark, sf_dir, "orders"),
        numeric_cols=("o_orderkey", "o_custkey", "o_totalprice"),
        timestamp_cols=("o_orderdate",),
        string_cols=("o_orderstatus", "o_orderpriority"),
    )


# ---------------------------------------------------------------------------
# DQ — constraint suite
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_checks",
    """
SELECT rule, n_violations,
       CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM (
  SELECT 'orders.o_orderkey is unique' AS rule,
         count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
  UNION ALL
  SELECT 'orders.o_custkey references customer.c_custkey',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'orders.o_totalprice > 0',
         CAST(coalesce(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END), 0) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders.o_orderstatus in (O,F,P)',
         CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END),
              0) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'customer.c_acctbal >= 0',
         CAST(coalesce(sum(CASE WHEN c_acctbal >= 0 THEN 0 ELSE 1 END), 0) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'events.value is not null',
         CAST(coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
  FROM events
)
""",
    ("A*", "J*"),
    "Declarative constraint suite over three tables: key uniqueness "
    "(count minus distinct), referential integrity (anti-join count), "
    "domain and range checks (conditional counts), null checks.  Every "
    "rule is a partial-aggregatable count or an anti-join — no collect, "
    "no full-table comparison — and the report is the pass/fail gate a "
    "pipeline evaluates before promoting an ingest batch.  The "
    "c_acctbal >= 0 rule genuinely fails on this data (negative balances "
    "exist), so the suite exercises both verdicts.",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    rules = [
        (
            "orders.o_orderkey is unique",
            orders.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations")
            ),
        ),
        (
            "orders.o_custkey references customer.c_custkey",
            orders.join(
                customer,
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("n_violations")),
        ),
        # Range/domain rules count every row whose predicate is NOT
        # satisfied — including NULLs.  A bare ``count_if(~pred)`` is a
        # three-valued-logic trap: NULL > 0 is NULL, ~NULL is NULL, and
        # count_if counts only TRUE, so a NULL price silently PASSED the
        # ">0" gate (found by the null-injection differential audit; the
        # SQL oracle's CASE WHEN pred THEN 0 ELSE 1 had the correct
        # semantics all along).
        (
            "orders.o_totalprice > 0",
            orders.agg(
                count_if(
                    ~F.coalesce(F.col("o_totalprice") > 0, F.lit(False))
                ).alias("n_violations")
            ),
        ),
        (
            "orders.o_orderstatus in (O,F,P)",
            orders.agg(
                count_if(
                    ~F.coalesce(
                        F.col("o_orderstatus").isin("O", "F", "P"), F.lit(False)
                    )
                ).alias("n_violations")
            ),
        ),
        (
            "customer.c_acctbal >= 0",
            customer.agg(
                count_if(
                    ~F.coalesce(F.col("c_acctbal") >= 0, F.lit(False))
                ).alias("n_violations")
            ),
        ),
        (
            "events.value is not null",
            events.agg(count_if(F.isnull("value")).alias("n_violations")),
        ),
    ]
    return constraint_report(rules)


# ---------------------------------------------------------------------------
# A13 — winsorized robust mean
# ---------------------------------------------------------------------------


@register(
    "a13_winsorized_stats",
    f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_totalprice IS NOT NULL
),
pct AS (
  SELECT o_orderpriority,
         max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                  THEN o_totalprice END) AS p5,
         max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                  THEN o_totalprice END) AS p95,
         max(n) AS n_rows
  FROM ranked GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       max(p.p5) AS p5, max(p.p95) AS p95, max(p.n_rows) AS n_rows,
       {_avg_exact_sql('greatest(p.p5, least(p.p95, o.o_totalprice))')}
         AS winsorized_mean
FROM orders o JOIN pct p USING (o_orderpriority)
WHERE o.o_totalprice IS NOT NULL
GROUP BY o.o_orderpriority
""",
    ("A*", "O*"),
    "Winsorized mean of order value per priority: tails clamped at the "
    "exact nearest-rank p5/p95 (actual data values, bit-portable), then "
    "the decimal-exact mean.  Percentile window + broadcast join of the "
    "5-row percentile table back onto the fact + one partial-aggregatable "
    "groupBy — the robust location estimate that shrugs off the garbage "
    "rows a plain mean would absorb.",
)
def a13_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorized_stats(
        load_table(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_totalprice",
        "o_orderkey",
        0.05,
        0.95,
    )


# ---------------------------------------------------------------------------
# P18 — deterministic per-key reservoir sample
# ---------------------------------------------------------------------------


@register(
    "p18_reservoir_per_key",
    """
SELECT event_id, event_type, user_id, rank FROM (
  SELECT event_id, event_type, user_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY md5(event_id::VARCHAR), event_id) AS rank
  FROM events
) WHERE rank <= 100
""",
    ("P*", "O2"),
    "Deterministic fixed-size (k=100) per-event-type sample: rank by "
    "content hash within each key, keep the first k — a reproducible "
    "reservoir (same rows on any engine / partitioning / rerun, unlike "
    "rand()).  Implemented skew-resistant: phase 1 prunes to k within "
    "(key, input-partition) so a heavy key never forms one giant sort "
    "group, phase 2 ranks the <= k*P survivors.  The oracle's single "
    "global window is the semantic spec; the two-phase plan is the scale "
    "path.",
)
def p18_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    return per_key_top_hash(
        e,
        ["event_type"],
        [F.md5(F.col("event_id").cast("string")), F.col("event_id")],
        100,
        rank_name="rank",
    )


# ---------------------------------------------------------------------------
# W12 — trailing-7-day distinct users
# ---------------------------------------------------------------------------


@register(
    "w12_rolling_distinct_users",
    """
WITH p AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
d AS (SELECT DISTINCT day FROM p)
SELECT d.day AS win_end, count(DISTINCT p.user_id) AS n_users_7d
FROM d JOIN p ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
    ("W*", "A8"),
    "Rolling 7-day distinct active users per observed day — the metric a "
    "COUNT(DISTINCT) window frame cannot express.  Scale shape: dedup to "
    "(day, user) pairs (the only full-cardinality shuffle), explode each "
    "pair to the <=7 window-ends it feeds (fixed fan-out, partial-"
    "aggregatable), broadcast-clip to observed days, count distinct per "
    "window end.  The oracle's day x pairs range join is the spec; the "
    "explode form is what survives 100 M users/day.",
)
def w12_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_distinct_count(
        load_table(spark, sf_dir, "events"),
        "ts",
        "user_id",
        window_days=7,
        out_count="n_users_7d",
    )


# ---------------------------------------------------------------------------
# J5 — eager-aggregation join pushdown
# ---------------------------------------------------------------------------


@register(
    "j5_eager_agg_join",
    f"""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(28,10))) AS cust_total
  FROM orders GROUP BY o_custkey
)
SELECT n.n_name, CAST(sum(pc.n_orders) AS BIGINT) AS n_orders,
       ((sum(pc.cust_total)::VARCHAR)::DOUBLE) AS total_price
FROM per_cust pc
JOIN customer c ON pc.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    ("J*", "A*"),
    "Eager-aggregation pushdown: the fact is pre-aggregated to one row "
    "per join key BEFORE joining the dimensions, shrinking the join input "
    "from |orders| to |customers| — a rewrite Catalyst does not apply "
    "itself, decisive at 100 TB when the fact-side shuffle dominates.  "
    "The money accumulator stays DECIMAL through BOTH aggregate levels "
    "(a double intermediate would need a double->decimal re-cast, which "
    "is not correctly rounded in every engine) and is cast to double "
    "exactly once at the end, so the result is bitwise identical to the "
    "naive join-then-aggregate.",
)
def j5_eager_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.columns import _ACC_DECIMAL, _dec_to_double

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_ACC_DECIMAL)).alias("cust_total"),
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            _dec_to_double(F.sum("cust_total")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# W13 — cohort retention triangle
# ---------------------------------------------------------------------------


@register(
    "w13_retention_triangle",
    """
WITH pairs AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
first_day AS (
  SELECT user_id, min(day) AS cohort_day FROM pairs GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, p.day) AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM pairs p JOIN first_day f USING (user_id)
GROUP BY 1, 2
""",
    ("W*", "A*", "J*"),
    "Cohort retention triangle: users grouped by first-seen day, counted "
    "at every later day-offset they return — the classic growth-"
    "analytics matrix.  Dedup to (day, user) pairs once, derive each "
    "user's cohort day with a keyed aggregate, join back on user_id and "
    "count per (cohort, offset); the pair table is already distinct so "
    "the final count needs no second DISTINCT (no Expand).  Both heavy "
    "stages shuffle on user_id and co-partition, and the output is at "
    "most |days|^2/2 rows regardless of corpus size.",
)
def w13_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    first = pairs.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        pairs.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# A16 — MAD robust outlier detection
# ---------------------------------------------------------------------------


@register(
    "a16_mad_outliers",
    """
WITH r1 AS (
  SELECT o_orderpriority, o_totalprice, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_totalprice IS NOT NULL
),
med AS (
  SELECT o_orderpriority,
         max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                  THEN o_totalprice END) AS median
  FROM r1 GROUP BY o_orderpriority
),
dev AS (
  SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice, m.median,
         abs(o.o_totalprice - m.median) AS ad,
         row_number() OVER (PARTITION BY o.o_orderpriority
                            ORDER BY abs(o.o_totalprice - m.median),
                                     o.o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o.o_orderpriority) AS n
  FROM orders o JOIN med m USING (o_orderpriority)
  WHERE o.o_totalprice IS NOT NULL
),
mad AS (
  SELECT o_orderpriority, max(median) AS median,
         max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN ad END) AS mad
  FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority, max(d.median) AS median, max(t.mad) AS mad,
       CAST(sum(CASE WHEN d.ad > 3 * t.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       count(*) AS n_rows
FROM dev d JOIN mad t USING (o_orderpriority)
GROUP BY d.o_orderpriority
""",
    ("A*", "W*"),
    "Median-absolute-deviation outlier detection per priority: median "
    "and MAD are both exact nearest-rank order statistics (actual data "
    "values); a row is an outlier when |x - median| > 3*MAD.  Every "
    "arithmetic step is a single rounded double op applied identically "
    "on both engines (subtraction, abs, one multiply) — no accumulation "
    "anywhere — so the robust-statistics pipeline is bitwise portable.  "
    "The same percentile-window machinery as a9/a13, composed twice, "
    "with the tiny per-group median/MAD tables broadcast back onto the "
    "fact.",
)
def a16_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.analytic import nearest_rank_percentiles

    # MAD is defined over scoreable values: NULL prices are excluded up
    # front (matching the operator's percentile convention), so n_rows
    # counts the rows the statistics describe.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    med = nearest_rank_percentiles(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey", (0.5,)
    ).select("o_orderpriority", F.col("p50").alias("median"))
    dev = orders.join(F.broadcast(med), "o_orderpriority").withColumn(
        "ad", F.abs(F.col("o_totalprice") - F.col("median"))
    )
    mad = nearest_rank_percentiles(
        dev, ["o_orderpriority"], "ad", "o_orderkey", (0.5,)
    ).select("o_orderpriority", F.col("p50").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.sum((F.col("ad") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# A17 — bitwise-exact Pearson correlation
# ---------------------------------------------------------------------------


@register(
    "a17_exact_correlation",
    """
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS HUGEINT) AS x,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         ((sum(x)::VARCHAR)::DOUBLE) AS sx, ((sum(y)::VARCHAR)::DOUBLE) AS sy,
         ((sum(x * y)::VARCHAR)::DOUBLE) AS sxy,
         ((sum(x * x)::VARCHAR)::DOUBLE) AS sxx,
         ((sum(y * y)::VARCHAR)::DOUBLE) AS syy
  FROM q GROUP BY 1
)
SELECT l_returnflag, n,
       ((n::DOUBLE * sxy - sx * sy)
        / (sqrt(n::DOUBLE * sxx - sx * sx)
           * sqrt(n::DOUBLE * syy - sy * sy))) AS corr_qty_price
FROM s
""",
    ("A*",),
    "Pearson correlation of quantity vs price per return flag, BITWISE "
    "deterministic: inputs quantize to integer units (whole quantities, "
    "cents), all five moment sums accumulate in exact integer/decimal "
    "arithmetic (order-independent), and the final formula is a fixed "
    "chain of IEEE correctly-rounded ops — *, -, /, and sqrt, which "
    "unlike log/exp IS required correctly-rounded by IEEE 754 — so even "
    "corr, the classic 'never compare floats across engines' statistic, "
    "hash-gates exactly.  Built-in corr() accumulates doubles in "
    "partition order and can NOT do this.",
)
def a17_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.columns import _dec_to_double

    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("decimal(18,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    s = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_to_double(F.sum("x")).alias("sx"),
            _dec_to_double(F.sum("y")).alias("sy"),
            _dec_to_double(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
            _dec_to_double(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
            _dec_to_double(F.sum(F.col("y") * F.col("y"))).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    corr = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("l_returnflag", "n", corr.alias("corr_qty_price"))


# ---------------------------------------------------------------------------
# A18 — bitwise-exact least-squares fit
# ---------------------------------------------------------------------------


@register(
    "a18_exact_linear_fit",
    """
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS HUGEINT) AS x,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem
),
s AS (
  SELECT l_returnflag, count(*) AS n,
         ((sum(x)::VARCHAR)::DOUBLE) AS sx, ((sum(y)::VARCHAR)::DOUBLE) AS sy,
         ((sum(x * y)::VARCHAR)::DOUBLE) AS sxy,
         ((sum(x * x)::VARCHAR)::DOUBLE) AS sxx
  FROM q GROUP BY 1
)
SELECT l_returnflag, n,
       ((n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx))
         AS slope_cents_per_unit,
       ((sy - ((n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx)) * sx)
        / n::DOUBLE) AS intercept_cents
FROM s
""",
    ("A*",),
    "Ordinary least squares (price-cents vs quantity) per return flag "
    "with the same bitwise discipline as a17: exact integer moment sums, "
    "one correctly-rounded conversion each, then a fixed chain of IEEE "
    "ops — slope and intercept hash-gate exactly.  Together with a17 "
    "this is the feature-statistics pass an ML platform runs before "
    "training, reproducible across engines and re-runs.",
)
def a18_exact_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.columns import _dec_to_double

    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("decimal(18,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    s = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_to_double(F.sum("x")).alias("sx"),
            _dec_to_double(F.sum("y")).alias("sy"),
            _dec_to_double(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
            _dec_to_double(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope_cents_per_unit"),
        intercept.alias("intercept_cents"),
    )


# ---------------------------------------------------------------------------
# W15 — cumulative distinct users (expanding window)
# ---------------------------------------------------------------------------


@register(
    "w15_cumulative_distinct_users",
    """
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
),
new_per_day AS (SELECT day, count(*) AS n_new FROM first_seen GROUP BY day),
days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
SELECT d.day,
       coalesce(n.n_new, 0) AS n_new_users,
       CAST(sum(coalesce(n.n_new, 0)) OVER (
         ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_cumulative_users
FROM days d LEFT JOIN new_per_day n USING (day)
""",
    ("W*", "A8"),
    "Cumulative distinct users per day — the EXPANDING-window companion "
    "to w12's sliding window, and the case where the explode trick would "
    "blow up (unbounded fan-out): instead, first-seen day per user (one "
    "keyed aggregate — a user counts exactly once, on their first day), "
    "daily new-user counts, then a running sum over the tiny day "
    "dimension.  Corpus-sized work is one groupBy(user); the window "
    "runs on |days| rows.",
)
def w15_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    first_seen = e.groupBy("user_id").agg(F.min(day).alias("day"))
    new_per_day = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    days = e.select(day.alias("day")).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        days.join(new_per_day, "day", "left")
        .select("day", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new_users"))
        .withColumn(
            "n_cumulative_users",
            F.sum("n_new_users").over(w).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# DQ — table checksum (cross-cluster reconciliation fingerprint)
# ---------------------------------------------------------------------------


@register(
    "dq_table_checksum",
    f"""
SELECT event_type,
       count(*) AS n_rows,
       {EVENTS_CHECKSUM_ORACLE_EXPR} AS checksum
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    ("A*", "P*"),
    "Order-independent table fingerprint: per-row md5-derived 60-bit hash "
    "over the stable column serialization, XOR-folded per group.  XOR is "
    "commutative/associative, so the checksum is identical under ANY "
    "partitioning or row order — the cheap way to audit that two replicas "
    "of a 100 TB table agree (compare one row per group, move zero data). "
    "Map-side partial bit_xor, one exchange of |groups| rows.  Doubles "
    "enter the serialization through floor(value*1000) (bitwise-identical "
    "double arithmetic in every engine), never through engine-specific "
    "float-to-string formatting.  The serialization is NULL-TOTAL: every "
    "field is coalesced to an out-of-alphabet sentinel (chr(1)) — "
    "concat_ws-style null SKIPPING would make (a, NULL, b) collide with "
    "(a, b, NULL), and ||-style null PROPAGATION would silently drop any "
    "row containing a NULL from the fingerprint entirely (audited on "
    "null-injected data; both engines previously did one of each).",
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    row_hash = events_checksum_row_hash()
    return (
        events.select("event_type", row_hash.alias("__rh"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__rh)").alias("checksum"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# DQ — join-key skew report (heavy-hitter diagnostics)
# ---------------------------------------------------------------------------


@register(
    "dq_key_skew_report",
    """
WITH counts AS (
  SELECT l_partkey AS key, count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT count(*) AS n_rows, count(DISTINCT l_partkey) AS n_keys
  FROM lineitem
)
SELECT c.key, c.cnt,
       (1000000 * c.cnt) // t.n_rows AS share_ppm,
       CAST(c.cnt * t.n_keys AS BIGINT) AS skew_x_keys
FROM counts c, tot t
ORDER BY c.cnt DESC, c.key
LIMIT 20
""",
    ("A*", "O2"),
    "Join-key skew diagnostics: the 20 heaviest l_partkey values with "
    "row count, parts-per-million share, and cnt*n_keys (the skew ratio "
    "cnt/avg scaled to stay in exact integer arithmetic).  This is the "
    "query you run BEFORE a big join to decide between plain shuffle, "
    "salting, and AQE skew split.  Partial-agg groupBy on the key, a "
    "broadcast of the single global-totals row, TakeOrderedAndProject "
    "for the top-20 — no full sort.",
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_keys"),
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.expr("1000000 * cnt DIV n_rows").alias("share_ppm"),
            (F.col("cnt") * F.col("n_keys")).cast("long").alias("skew_x_keys"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A20 — equi-depth histogram without a global sort
# ---------------------------------------------------------------------------


@register(
    "a20_equidepth_histogram",
    """
WITH nn AS (SELECT o_totalprice FROM orders WHERE o_totalprice IS NOT NULL),
ranked AS (
  SELECT o_totalprice AS v, row_number() OVER (ORDER BY o_totalprice) AS rn
  FROM nn
),
tot AS (SELECT count(*) AS n FROM nn),
bounds AS (
  SELECT gs.i AS i, r.v AS b
  FROM generate_series(1, 9) gs(i)
  CROSS JOIN tot t
  JOIN ranked r ON r.rn = (gs.i * t.n + 9) // 10
),
assigned AS (
  SELECT o.o_totalprice AS v,
         1 + (SELECT count(*) FROM bounds WHERE bounds.b < o.o_totalprice)
           AS bucket
  FROM nn o
)
SELECT bucket, count(*) AS n_rows, min(v) AS lo, max(v) AS hi
FROM assigned GROUP BY bucket ORDER BY bucket
""",
    ("A*", "W*"),
    "Equi-depth (decile) histogram of order totals WITHOUT a global sort: "
    "all 9 nearest-rank boundaries come from one two-phase bucketed "
    "selection (operators/selection.py::equi_depth_boundaries — exact "
    "integer rank arithmetic, every ordered window over the cell table "
    "or one cell, the per-cell window partitioned by rank), then rows "
    "are assigned by value against the broadcast sorted boundary array "
    "with a map-side array expression.  The oracle is the textbook "
    "row_number() global-sort formulation — the gate proves the "
    "distributed plan selects the IDENTICAL boundary values.  Buckets "
    "are value-defined (b_{i-1} < v <= b_i), so ties are deterministic "
    "on both sides.",
)
def a20_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.selection import equi_depth_boundaries

    # Depth buckets partition the scoreable values; a NULL price has no
    # rank (and would shift every boundary via count(*)) — excluded on
    # both sides, same convention as the selection operator itself.
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    bounds = equi_depth_boundaries(orders, "o_totalprice", n_out=10)
    barr = bounds.agg(
        F.sort_array(F.collect_list("boundary")).alias("__bs")
    )
    assigned = (
        orders.select(F.col("o_totalprice").alias("v"))
        .join(F.broadcast(barr))
        .select(
            "v",
            (
                F.lit(1)
                + F.expr("size(filter(__bs, x -> x < v))")
            ).cast("long").alias("bucket"),
        )
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "dq_daily_drift",
    """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT day, sum(n)::BIGINT AS total FROM daily GROUP BY day),
paired AS (
  SELECT c.day, c.event_type,
         CAST(c.n AS DOUBLE) AS o,
         (CAST(p.n AS DOUBLE) * tc.total) / tp.total AS e
  FROM daily c
  JOIN daily p ON p.event_type = c.event_type
              AND p.day = c.day - INTERVAL 1 DAY
  JOIN tot tc ON tc.day = c.day
  JOIN tot tp ON tp.day = p.day
  WHERE p.n > 0
),
terms AS (
  SELECT day, event_type, ((o - e) * (o - e)) / e AS term FROM paired
)
SELECT day,
       count(*)::BIGINT AS n_types,
       list_reduce(list(term ORDER BY event_type), (acc, x) -> acc + x)
         AS chi2
FROM terms
GROUP BY day
ORDER BY day
""",
    ("DQ", "A*"),
    "Day-over-day distribution drift: Pearson chi-square of each day's "
    "event-type mix against the previous day's (expected = yesterday's "
    "count scaled to today's volume).  The monitoring gate a 100 TB "
    "ingest runs per batch — one groupBy plus a |days x types|-row "
    "self-join, nothing corpus-sized after the first aggregate.  "
    "Deliberately transcendental-free (no ln, unlike PSI/KL) so the "
    "statistic is an exact IEEE chain: integer counts -> one division "
    "per expected value -> squared-residual terms summed in event_type "
    "order by an identical left fold on both sides (seed 0.0 is an "
    "IEEE identity, so Spark's aggregate == DuckDB's seedless "
    "list_reduce bitwise).  Types absent on either day are excluded "
    "(e would be 0/undefined); the synthetic grid is complete, and at "
    "scale an absent type is its own alert before any statistic.",
)
def dq_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("day").agg(F.sum("n").cast("long").alias("total"))
    cur = daily.alias("c").join(tot.alias("tc"), "day")
    prev = (
        daily.alias("p")
        .join(tot.alias("tp"), "day")
        .select(
            (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("pday"),
            F.col("event_type").alias("petype"),
            F.col("n").alias("pn"),
            F.col("total").alias("ptotal"),
        )
        .filter(F.col("pn") > 0)
    )
    paired = cur.join(
        prev,
        (F.col("pday") == F.col("day")) & (F.col("petype") == F.col("event_type")),
    ).select(
        "day",
        "event_type",
        F.col("n").cast("double").alias("o"),
        ((F.col("pn").cast("double") * F.col("total")) / F.col("ptotal")).alias("e"),
    )
    terms = paired.select(
        "day",
        "event_type",
        (((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))) / F.col("e")).alias(
            "term"
        ),
    )
    return (
        terms.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("event_type", "term"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("chi2"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# DQ — NULL-rate drift monitor (r7 audit-born: the dirty-corpus
# differential audit dirtied columns at a known 10% rate; this is the
# monitor that would have CAUGHT such an ingest regression in production)
# ---------------------------------------------------------------------------


@register(
    "dq_null_rate_drift",
    """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n_rows,
         count(*) - count(event_type) AS n_event_type,
         count(*) - count(props)      AS n_props,
         count(*) - count(value)      AS n_value
  FROM events GROUP BY 1
),
unp AS (
  SELECT day, 'event_type' AS col, n_rows, n_event_type AS n_nulls FROM daily
  UNION ALL SELECT day, 'props', n_rows, n_props FROM daily
  UNION ALL SELECT day, 'value', n_rows, n_value FROM daily
),
corpus AS (
  SELECT col,
         CAST((1000000 * sum(n_nulls)) // sum(n_rows) AS BIGINT) AS corpus_ppm
  FROM unp GROUP BY col
)
SELECT u.day, u.col,
       CAST(u.n_rows AS BIGINT) AS n_rows,
       CAST(u.n_nulls AS BIGINT) AS n_nulls,
       CAST((1000000 * u.n_nulls) // u.n_rows AS BIGINT) AS null_ppm,
       c.corpus_ppm,
       CAST(abs((1000000 * u.n_nulls) // u.n_rows - c.corpus_ppm) AS BIGINT)
         AS drift_ppm
FROM unp u JOIN corpus c USING (col)
ORDER BY day, col
""",
    ("DQ", "A*"),
    "Per-day per-column NULL-rate monitor over the event feed's non-key "
    "columns, each day scored against the corpus-wide rate (drift in "
    "integer parts-per-million — exact DIV arithmetic, no float rates to "
    "diverge between engines).  This is the ingest gate the r6/r7 "
    "dirty-corpus audit was a manual run of: a collector that starts "
    "emitting NULL payloads moves a column's daily ppm away from "
    "baseline and the row surfaces with its drift magnitude.  One scan "
    "with map-side count_if partials -> |days|-row table, unpivoted via "
    "stack (no rescan per column, unlike the oracle's UNION ALL), corpus "
    "baseline re-aggregated from the tiny day table and broadcast back.  "
    "Nothing after the first aggregate scales with the corpus, so the "
    "monitor costs one pass at 100 TB.",
)
def dq_null_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .caching import persisted_intermediate

    events = load_table(spark, sf_dir, "events")
    cols = ("event_type", "props", "value")
    # Two consumers (the per-day report and the corpus baseline) would
    # each re-scan the corpus for the same day table.
    daily = persisted_intermediate(
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[count_if(F.col(c).isNull()).alias(f"n_{c}") for c in cols],
        ),
        bound="|days| rows",
    )
    unp = daily.select(
        "day",
        "n_rows",
        F.expr(
            "stack(3, 'event_type', n_event_type, 'props', n_props, "
            "'value', n_value) AS (col, n_nulls)"
        ),
    )
    corpus = unp.groupBy("col").agg(
        F.expr("1000000 * sum(n_nulls) DIV sum(n_rows)").alias("corpus_ppm")
    )
    return (
        unp.join(F.broadcast(corpus), "col")
        .select(
            "day",
            "col",
            "n_rows",
            "n_nulls",
            F.expr("1000000 * n_nulls DIV n_rows").alias("null_ppm"),
            "corpus_ppm",
            F.expr("abs(1000000 * n_nulls DIV n_rows - corpus_ppm)").alias(
                "drift_ppm"
            ),
        )
        .orderBy("day", "col")
    )


# ---------------------------------------------------------------------------
# DQ — blob/table reconciliation (r7 audit-born: pins the binaryFile
# zero-byte-drop trap, DIRTYDATA.md §2, beyond its unit test)
# ---------------------------------------------------------------------------


@register(
    "dq_blob_reconciliation",
    """
SELECT status, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes
FROM (
  SELECT CASE WHEN text IS NULL OR text = ''
              THEN 'quarantined_no_payload' ELSE 'ok' END AS status,
         CASE WHEN text IS NULL OR text = ''
              THEN 0 ELSE octet_length(encode(text)) END AS n_bytes
  FROM documents
) t
GROUP BY status ORDER BY status
""",
    ("DQ", "S*", "X5"),
    "Table-vs-lake reconciliation: FULL OUTER join of the documents table "
    "against the blob-per-file listing (binaryFile metadata only — length "
    "comes from the directory listing, no payload read), each doc "
    "classified ok / quarantined_no_payload (NULL-or-empty text has no "
    "file, the x5 quarantine convention) / missing_blob / orphan_blob / "
    "size_mismatch.  The oracle enumerates the healthy statuses straight "
    "from the table, so ANY discrepancy class appearing Spark-side fails "
    "the hash gate — in particular the trap this query exists to pin: "
    "Spark's binaryFile source silently DROPS zero-byte files "
    "(DIRTYDATA.md §2), so a stager that wrote size-0 placeholders for "
    "empty docs would surface them here as missing_blob rows, not as a "
    "quietly smaller manifest.  At lake scale this is a metadata-sized "
    "shuffle join (|docs| narrow rows per side), the nightly consistency "
    "gate between a catalog and its object store.",
)
def dq_blob_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quality import blob_reconciliation
    from .queries_sources import _stage_doc_files

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = _stage_doc_files(spark, sf_dir)
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("b_doc_id"),
            F.col("length").alias("blob_bytes"),  # listing metadata, no read
        )
    )
    return blob_reconciliation(docs, blobs)
