"""Relational coverage: scan-side projections (P1, P3), the classic
pricing-summary aggregate shape, and the join strategies the reference never
had but a 100 TB deployment needs (SURVEY.md §2.5: stream-static enrichment
becomes broadcast joins; the serving upsert becomes a keyed merge).

Join-strategy notes (visible in .explain("formatted")):
* dimension joins (nation, region, filtered part) are explicitly
  ``F.broadcast(...)`` — no shuffle of the fact side, ever;
* fact-fact joins (orders x lineitem) shuffle on the join key; at 100 TB
  both sides would be bucketed by orderkey at write time to elide the
  exchange, and AQE handles skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .caching import persisted_intermediate
from .functions import avg_exact, sum_exact
from .operators.serving import top_n
from .registry import _avg_exact_sql, _min_label_sql, _sum_exact_sql, register
from .sources.tables import load_table

# ---------------------------------------------------------------------------
# P1 — cast projection (binary <-> string), the Kafka value decode
# ---------------------------------------------------------------------------


@register(
    "p01_cast_projection",
    """
SELECT event_id,
       decode(encode(props)) AS props_str,
       octet_length(encode(props)) AS props_bytes
FROM events
""",
    ("P1",),
    "Binary->string cast, the Kafka-value decode (summarizer.py:61 "
    "selectExpr CAST(value AS STRING)), plus byte length of the encoded "
    "payload — the multimodal binary-column convention's simplest form.",
)
def p01_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    binary = F.encode(F.col("props"), "UTF-8")
    return e.select(
        "event_id",
        F.decode(binary, "UTF-8").alias("props_str"),
        F.length(binary).cast("long").alias("props_bytes"),
    )


# ---------------------------------------------------------------------------
# P3 — epoch seconds <-> timestamp conversion
# ---------------------------------------------------------------------------


@register(
    "p03_epoch_roundtrip",
    """
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
       make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS ts_second
FROM events
""",
    ("P3",),
    "Unix-seconds <-> TimestampType both ways (summarizer.py:66's "
    "from_unixtime().cast(); we use the direct timestamp_seconds builtin).",
)
def p03_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    unix_ts = F.unix_timestamp(F.col("ts")).alias("unix_ts")
    return e.select(
        "event_id", unix_ts, F.timestamp_seconds(unix_ts).alias("ts_second")
    )


# ---------------------------------------------------------------------------
# P15 — deterministic (hash-based) sampling
# ---------------------------------------------------------------------------


@register(
    "p15_deterministic_sample",
    """
SELECT event_id, user_id, event_type
FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
""",
    ("P*",),
    "Reproducible ~10% sample by content hash: md5(id) mod 100 — the "
    "sampling a training pipeline can re-run months later on any engine "
    "and get the SAME rows (rand()-based TABLESAMPLE cannot, and RNGs "
    "differ across engines). Pure projection + filter, no shuffle; the "
    "predicate composes with partition pruning.",
)
def p15_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    return e.filter(bucket < 10).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Pricing summary — the canonical scan->filter->agg shape at fact scale
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {_sum_exact_sql('l_quantity')} AS sum_qty,
       {_sum_exact_sql('l_extendedprice')} AS sum_base_price,
       {_sum_exact_sql('l_extendedprice * (1.0 - l_discount)')}
         AS sum_disc_price,
       {_sum_exact_sql('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)')}
         AS sum_charge,
       {_avg_exact_sql('l_quantity')} AS avg_qty,
       {_avg_exact_sql('l_extendedprice')} AS avg_price,
       {_avg_exact_sql('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    ("A2", "A3", "P4", "P7"),
    "TPC-H Q1-shaped pricing summary: predicate pushed to the parquet scan, "
    "partial+final hash aggregate, exact decimal money sums.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.partitioning import ensure_min_parallelism

    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    # The fact file is a single parquet row group locally, so the scan —
    # and with it the 9-accumulator DECIMAL(28,10) partial aggregate, the
    # query's entire cost — plans as ONE task (guide §2.5: unsplittable
    # input -> repartition right after the read).  Hash-spread on the
    # high-cardinality price column (deterministic, no round-robin
    # pre-sort); a no-op on any multi-split table, and the group keys
    # stay (l_returnflag, l_linestatus) so the final aggregate is
    # unchanged.  Decimal sums are order-exact, so results are bitwise
    # placement-independent.  Measured 1.52 -> 0.47 s at sf0.1.
    l = ensure_min_parallelism(l, "l_extendedprice")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_exact("l_quantity").alias("sum_qty"),
        sum_exact("l_extendedprice").alias("sum_base_price"),
        sum_exact(disc_price).alias("sum_disc_price"),
        sum_exact(charge).alias("sum_charge"),
        avg_exact("l_quantity").alias("avg_qty"),
        avg_exact("l_extendedprice").alias("avg_price"),
        avg_exact("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Fact-fact-dim join with top-N (TPC-H Q3 shape)
# ---------------------------------------------------------------------------


@register(
    "q3_top_revenue_orders",
    f"""
SELECT l.l_orderkey,
       {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    ("A4", "O2", "P10"),
    "TPC-H Q3 shape: selective dim broadcast (filtered customer), "
    "fact-fact shuffle join on orderkey, aggregate, bounded top-N.",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        sum_exact(revenue).alias("revenue")
    )
    return top_n(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10).select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# Six-table join tree (TPC-H Q5 shape)
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name AS nation,
       {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
    ("J*", "A2", "P10"),
    "TPC-H Q5 shape: a six-table join tree (two facts, two dims, two "
    "tiny dims) with a same-nation correlation between customer and "
    "supplier. Declared as plain joins — Catalyst orders the tree, "
    "broadcasts the small sides, and pushes both date bounds and the "
    "region filter into the scans.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (c.c_custkey == o.o_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        sum_exact(revenue).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Small-dim star join (broadcast chain)
# ---------------------------------------------------------------------------


@register(
    "j1_region_enrichment",
    f"""
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_customers,
       {_avg_exact_sql('c.c_acctbal')} AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    ("J*", "A2", "A3"),
    "Star-schema enrichment via a chain of broadcast hash joins — the "
    "stream-static enrichment pattern (SURVEY.md §2.5) in batch form; no "
    "shuffle touches the fact side.",
)
def j1_region_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        avg_exact("c_acctbal").alias("avg_acctbal"),
    )


# ---------------------------------------------------------------------------
# Nation-pair trade volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN supplier s ON l.l_suppkey  = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
    ("J*", "A2", "P10", "P12"),
    "TPC-H Q7 shape: the same dimension (nation) joined twice under two "
    "aliases with a disjunctive cross-nation predicate, grouped by shipment "
    "year. Both nation sides broadcast; the only shuffles are the "
    "orderkey fact-fact join and the final aggregate. The disjunction is "
    "applied after the joins so Catalyst can still push the date bounds "
    "into the lineitem scan.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    volume = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(sum_exact(volume).alias("volume"))


# ---------------------------------------------------------------------------
# Distinct-count with exclusion anti-join (TPC-H Q16 shape, no partsupp)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_counts",
    """
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 20
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY 1, 2
""",
    ("J*", "A8"),
    "TPC-H Q16 shape (adapted: lineitem stands in for partsupp): "
    "count(DISTINCT supplier) per (brand, type) after excluding a "
    "blocklist via anti-join. The NOT IN subquery becomes a broadcast "
    "left-anti hash join (s_suppkey is non-null, so NOT IN == anti-join); "
    "distinct-count expands to a two-level aggregate.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    kept = l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
    return (
        kept.join(F.broadcast(p), kept.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    f"""
WITH part_avg AS (
  SELECT l_partkey, {_avg_exact_sql('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       {_sum_exact_sql('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND l.l_quantity < 0.2 * a.avg_qty
GROUP BY p.p_brand
""",
    ("J*", "A2"),
    "TPC-H Q17 shape: the correlated scalar subquery 'quantity below 20% "
    "of this part's average' decorrelated into a per-part aggregate joined "
    "back to the fact — one extra shuffle on l_partkey instead of a "
    "per-row subquery. The threshold comparison uses the deterministic "
    "decimal-exact mean so the boundary predicate is engine-independent.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    part_avg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        avg_exact("l_quantity").alias("avg_qty")
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == part_avg.a_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return joined.groupBy("p_brand").agg(
        (sum_exact("l_extendedprice") / 7.0).alias("avg_yearly")
    )


# ---------------------------------------------------------------------------
# HAVING-subquery join-back (TPC-H Q18 shape)
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {_sum_exact_sql('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING (sum(CAST(l_quantity AS DECIMAL(28,10)))::VARCHAR)::DOUBLE > 250.0
)
GROUP BY 1, 2, 3, 4, 5
""",
    ("J*", "A2", "O2"),
    "TPC-H Q18 shape: orders whose total quantity exceeds a threshold — a "
    "grouped-HAVING subquery semi-joined back to the same fact. Spark plan: "
    "one aggregate over lineitem produces the qualifying keyset, "
    "left-semi join prunes orders, then the enrich joins re-aggregate. "
    "The keyset is usually small (top ~1% of orders) so the semi-join "
    "broadcasts under AQE.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(sum_exact("l_quantity").alias("q"))
        .filter(F.col("q") > 250.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    pruned = o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
    joined = pruned.join(F.broadcast(c), pruned.o_custkey == c.c_custkey).join(
        l, pruned.o_orderkey == l.l_orderkey
    )
    return joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(sum_exact("l_quantity").alias("total_qty"))


# ---------------------------------------------------------------------------
# Disjunctive join predicate (TPC-H Q19 shape)
# ---------------------------------------------------------------------------


@register(
    "q19_discounted_revenue",
    f"""
SELECT {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    ("J*", "P10"),
    "TPC-H Q19 shape: a three-arm disjunctive predicate mixing columns "
    "from both join sides. Catalyst extracts the common per-side "
    "implications (brand IN (...), quantity in the disjunction's hull) and "
    "pushes them into the scans, so the join sees pre-filtered inputs even "
    "though the full OR can only be evaluated post-join; the filtered "
    "part side broadcasts.",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arms = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(15, 50)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 40)
        )
    )
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).filter(arms)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return joined.agg(
        sum_exact(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


# ---------------------------------------------------------------------------
# Scalar-subquery threshold + NOT EXISTS (TPC-H Q22 shape)
# ---------------------------------------------------------------------------


@register(
    "q22_dormant_rich_customers",
    f"""
WITH threshold AS (
  SELECT {_avg_exact_sql('c_acctbal')} AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       count(*) AS n_custs,
       {_sum_exact_sql('c.c_acctbal')} AS total_bal
FROM customer c, threshold t
WHERE c.c_acctbal > t.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
""",
    ("J*", "A2"),
    "TPC-H Q22 shape: above-average-balance customers with no orders. The "
    "scalar aggregate subquery becomes a one-row broadcast (every executor "
    "compares against it for free) and NOT EXISTS becomes a left-anti hash "
    "join on custkey — no correlated per-row probing anywhere.",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    threshold = c.filter(F.col("c_acctbal") > 0.0).agg(
        avg_exact("c_acctbal").alias("ab")
    )
    rich = c.crossJoin(F.broadcast(threshold)).filter(F.col("c_acctbal") > F.col("ab"))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        sum_exact("c_acctbal").alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# P16 — stratified deterministic sampling (per-stratum rates)
# ---------------------------------------------------------------------------


@register(
    "p16_stratified_sample",
    """
SELECT event_id, event_type, user_id
FROM events
WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 100
      < (CASE WHEN event_type = 'purchase' THEN 50 ELSE 5 END)
""",
    ("P*",),
    "Stratified reproducible sampling: rare strata kept at a higher rate "
    "than bulk strata (50% of purchases, 5% of everything else) — the "
    "class-rebalancing a training pipeline applies to terabytes of "
    "clickstream. Same content-hash determinism as P15 (re-runnable on "
    "any engine, any partitioning), still a pure scan-side predicate with "
    "no shuffle.",
)
def p16_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    rate = F.when(F.col("event_type") == "purchase", 50).otherwise(5)
    return e.filter(bucket < rate).select("event_id", "event_type", "user_id")


# ---------------------------------------------------------------------------
# Correlated EXISTS + NOT EXISTS self-joins (TPC-H Q21 shape)
# ---------------------------------------------------------------------------


@register(
    "q21_latest_shipper",
    """
SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS n_orders
FROM lineitem l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
""",
    ("J*", "A8"),
    "TPC-H Q21 shape (adapted to available columns): per supplier, the "
    "multi-supplier orders where no OTHER supplier shipped later — a "
    "correlated EXISTS plus a correlated NOT EXISTS against the same "
    "fact. Decorrelated into one left-semi and one left-anti self-join, "
    "both keyed on l_orderkey: at scale both sort-merge joins partition "
    "on the same key (one aligned shuffle chain, no re-exchange between "
    "them); at test SF, AQE turns all three joins into broadcasts.",
)
def q21_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    multi = l1.join(
        l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "left_semi"
    )
    sole_latest = multi.join(
        l3,
        (multi.l_orderkey == l3.o3)
        & (multi.l_suppkey != l3.s3)
        & (l3.d3 > multi.l_shipdate),
        "left_anti",
    )
    return (
        sole_latest.join(F.broadcast(s), sole_latest.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Round-2 additions: the remaining classic shapes expressible on the
# driver's table subset (no partsupp table, so Q2/Q11/Q20 are out of reach).
# ---------------------------------------------------------------------------


@register(
    "q4_priority_exists",
    """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    ("A3", "J*"),
    "TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join — the fact "
    "side is filtered by the date window BEFORE the join, and the semi "
    "join never materializes per-order lineitem multiplicity (first match "
    "short-circuits), so the aggregate input is at most one row per "
    "order. (Ships late-shipment predicate on shipdate vs orderdate; the "
    "canonical commit/receipt columns aren't in the driver's lineitem.)",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    f"""
SELECT {_sum_exact_sql('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""",
    ("A4", "P10"),
    "TPC-H Q6 shape: the pure scan-filter-aggregate — every predicate "
    "(date range, discount band, quantity cap) pushes into the parquet "
    "scan as DataFilters and prunes row groups via min/max stats; the "
    "whole query is one codegen'd map + a 1-row partial/final agg, the "
    "canonical demonstration that selective scans never shuffle data.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return l.agg(
        sum_exact(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


@register(
    "q10_returned_items",
    f"""
SELECT c.c_custkey, c.c_name,
       {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    ("A4", "O2", "J*"),
    "TPC-H Q10 shape: lost-revenue ranking. Fact-fact shuffle join "
    "(orders x lineitem on orderkey, both pre-filtered at the scan), "
    "customer and nation broadcast, bounded top-20 via "
    "TakeOrderedAndProject — never a global sort.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        sum_exact(revenue).alias("revenue")
    )
    return top_n(agg, [F.col("revenue").desc(), F.col("c_custkey")], 20).select(
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


@register(
    "q12_late_shipments",
    """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
    ("A4", "J*"),
    "TPC-H Q12 shape: late shipments split by order priority — a "
    "fact-fact join with a non-equi residual predicate (shipdate vs "
    "orderdate + 60d rides the orderkey hash join as a post-join filter) "
    "feeding conditional counts. (Grouped by l_linestatus; the canonical "
    "shipmode column isn't in the driver's lineitem.)",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import count_if

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus"
    )
    joined = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_linestatus")
        .agg(
            count_if(high).alias("high_line_count"),
            count_if(~high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue",
    f"""
SELECT (100.0 * {_sum_exact_sql(
        "CASE WHEN p.p_type LIKE 'PROMO%' "
        "THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")})
       / {_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')}
         AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
    ("A4", "J*"),
    "TPC-H Q14 shape: promotion revenue share — a month-sliced fact scan "
    "broadcast-joined to the part dimension, two exact-decimal "
    "conditional sums, one double division at the end (both sums through "
    "the DECIMAL(28,10) recipe so the ratio is bitwise reproducible).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    joined = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return joined.agg(
        (
            (F.lit(100.0) * sum_exact(promo_rev)) / sum_exact(rev)
        ).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------------------
# Min-cost supplier per part (TPC-H Q2 shape, partsupp adapted from lineitem)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, {_avg_exact_sql('l_extendedprice')} AS supply_cost
  FROM lineitem WHERE l_extendedprice IS NOT NULL
  GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, n.n_name AS nation
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
ranked AS (
  SELECT p.p_partkey, c.supply_cost, eu.s_suppkey, eu.s_name, eu.nation,
         row_number() OVER (PARTITION BY p.p_partkey
                            ORDER BY c.supply_cost, eu.s_suppkey) AS rn
  FROM cost c
  JOIN eu ON c.l_suppkey = eu.s_suppkey
  JOIN part p ON c.l_partkey = p.p_partkey
  WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 30
)
SELECT p_partkey, supply_cost, s_suppkey, s_name, nation
FROM ranked WHERE rn = 1
ORDER BY supply_cost DESC, p_partkey
LIMIT 100
""",
    ("J*", "A2", "O2", "W*"),
    "TPC-H Q2 shape (no partsupp in the schema, so the supplier catalog is "
    "derived: supply cost of a (part, supplier) pair = exact-decimal mean "
    "line price over their lineitems).  The correlated min-subquery is "
    "decorrelated into a per-part row_number over (cost, suppkey) — one "
    "shuffle on partkey instead of a per-row probe; region-filtered "
    "suppliers and the filtered part dim broadcast.  Deterministic "
    "tie-break (cost, then suppkey) and exact-decimal costs keep rank 1 "
    "engine-independent.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 30)
    )
    # A supplier whose every price is NULL has no known cost and cannot
    # win a MIN-cost election (unfiltered, the NULL-cost row's rank-1
    # slot is engine-dependent: Spark sorts NULLS FIRST, DuckDB LAST).
    cost = l.filter(F.col("l_extendedprice").isNotNull()).groupBy(
        "l_partkey", "l_suppkey"
    ).agg(avg_exact("l_extendedprice").alias("supply_cost"))
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    joined = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey).join(
        F.broadcast(p), cost.l_partkey == p.p_partkey
    )
    w = Window.partitionBy("p_partkey").orderBy("supply_cost", "s_suppkey")
    best = joined.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return top_n(
        best, [F.col("supply_cost").desc(), F.col("p_partkey")], 100
    ).select("p_partkey", "supply_cost", "s_suppkey", "s_name", "nation")


# ---------------------------------------------------------------------------
# National market share (TPC-H Q8 shape)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ({_sum_exact_sql(
           "CASE WHEN sn.n_name = 'NATION_1' "
           "THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")})
       / ({_sum_exact_sql('l.l_extendedprice * (1.0 - l.l_discount)')})
         AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'AMERICA'
  AND p.p_type = 'STANDARD'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    ("J*", "A2", "A4", "P12"),
    "TPC-H Q8 shape: one nation's share of a region's market per year — "
    "an eight-table tree where the same dimension (nation) joins twice "
    "(customer side filters the region, supplier side tags the share "
    "numerator).  Share = two exact-decimal conditional sums and ONE "
    "double division per group, so the ratio is bitwise reproducible; "
    "every dimension broadcasts, the only shuffles are the orderkey "
    "fact-fact join and the final year groupBy.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0))
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg((sum_exact(nat_vol) / sum_exact(vol)).alias("mkt_share"))


# ---------------------------------------------------------------------------
# Product-line profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {_sum_exact_sql(
           "l.l_extendedprice * (1.0 - l.l_discount)"
           " - p.p_retailprice * l.l_quantity * 0.1")} AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    ("J*", "A2", "P12"),
    "TPC-H Q9 shape: profit (revenue minus supply cost) per supplier "
    "nation per order year for one product line.  The schema has no "
    "partsupp, so supply cost is modeled as 10% of the part's retail "
    "price per unit — the shape (fact scan, name-LIKE filtered part dim, "
    "nation rollup, signed money arithmetic through the exact-decimal "
    "sum) is what's exercised.  All dims broadcast; shuffles: orderkey "
    "join + final groupBy.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(sum_exact(profit).alias("profit"))


# ---------------------------------------------------------------------------
# Important stock by value share (TPC-H Q11 shape)
# ---------------------------------------------------------------------------


@register(
    "q11_important_stock",
    f"""
WITH nation_lines AS (
  SELECT l.l_partkey, l.l_extendedprice
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey, {_sum_exact_sql('l_extendedprice')} AS part_value
  FROM nation_lines GROUP BY l_partkey
),
total AS (
  SELECT {_sum_exact_sql('l_extendedprice')} AS total_value FROM nation_lines
)
SELECT p.l_partkey, p.part_value
FROM per_part p, total t
WHERE p.part_value > 0.001 * t.total_value
""",
    ("J*", "A2"),
    "TPC-H Q11 shape: parts representing an outsized share of one "
    "nation's supplied value (partsupp adapted: value = exact-decimal sum "
    "of the nation's line prices per part).  The HAVING-vs-global-total "
    "threshold is a scalar aggregate broadcast as a one-row cross join — "
    "every executor compares locally, no second pass over the data; the "
    "nation filter reaches the supplier dim before the fact join.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    lines = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", "l_extendedprice")
    )
    per_part = lines.groupBy("l_partkey").agg(
        sum_exact("l_extendedprice").alias("part_value")
    )
    total = lines.agg(sum_exact("l_extendedprice").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    """
WITH counts AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM counts GROUP BY c_count
""",
    ("J*", "A3"),
    "TPC-H Q13 shape: the customer order-count histogram — a LEFT OUTER "
    "join with a predicate INSIDE the join condition (not a post-filter: "
    "customers with only urgent orders must survive with count 0), then "
    "two stacked aggregates.  count(o_orderkey) ignores the null-extended "
    "rows, so zero-order customers land in the c_count=0 bucket.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    counts = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Top supplier by quarterly revenue (TPC-H Q15 shape)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey,
         {_sum_exact_sql('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
),
mx AS (SELECT max(total_revenue) AS m FROM revenue)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r JOIN supplier s ON r.l_suppkey = s.s_suppkey, mx
WHERE r.total_revenue = mx.m
""",
    ("J*", "A2", "O2"),
    "TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue — "
    "the view + scalar-max subquery decorrelated into a one-row broadcast "
    "compared against the per-supplier aggregate.  The equality on a "
    "double is safe ONLY because both engines compute the revenue through "
    "the exact-decimal recipe, so max and members are bitwise identical.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    revenue = l.groupBy("l_suppkey").agg(sum_exact(rev).alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Dominant promo-part suppliers (TPC-H Q20 shape)
# ---------------------------------------------------------------------------


@register(
    "q20_promo_part_suppliers",
    """
WITH promo_1996 AS (
  SELECT l.l_suppkey, l.l_partkey, l.l_quantity
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'PROMO'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
),
pair_qty AS (
  SELECT l_suppkey, l_partkey,
         ((sum(CAST(l_quantity AS DECIMAL(28,10)))::VARCHAR)::DOUBLE) AS sq
  FROM promo_1996 GROUP BY l_suppkey, l_partkey
),
part_qty AS (
  SELECT l_partkey,
         ((sum(CAST(l_quantity AS DECIMAL(28,10)))::VARCHAR)::DOUBLE) AS pq
  FROM promo_1996 GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
FROM pair_qty a
JOIN part_qty b ON a.l_partkey = b.l_partkey
JOIN supplier s ON a.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE a.sq > 0.1 * b.pq
""",
    ("J*", "A2"),
    "TPC-H Q20 shape: suppliers who moved more than 10% of any promo "
    "part's 1996 volume (partsupp availqty adapted to shipped quantity). "
    "Two aggregates over the same filtered slice at different grains, "
    "joined on partkey for the share predicate, then the qualifying "
    "supplier keyset deduplicated and enriched — the IN-subquery chain "
    "becomes aggregate + hash join + distinct, no correlated probing. "
    "Both quantity sums go through the exact-decimal recipe so the 10% "
    "boundary is engine-independent.",
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    promo = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    pair_qty = promo.groupBy("l_suppkey", "l_partkey").agg(
        sum_exact("l_quantity").alias("sq")
    )
    part_qty = promo.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        sum_exact("l_quantity").alias("pq")
    )
    dominant = (
        pair_qty.join(part_qty, pair_qty.l_partkey == part_qty.b_partkey)
        .filter(F.col("sq") > F.lit(0.1) * F.col("pq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


# ---------------------------------------------------------------------------
# J4 — fuzzy (edit-distance) self-join via symmetric-deletion blocking
# ---------------------------------------------------------------------------


@register(
    "j4_fuzzy_name_match",
    """
WITH v AS (
  SELECT c_custkey, c_name,
         unnest(list_distinct(list_prepend(c_name,
           [substr(c_name, 1, i - 1) || substr(c_name, i + 1, length(c_name))
            for i in generate_series(1, length(c_name))]))) AS variant
  FROM customer
),
cand AS (
  SELECT DISTINCT a.c_custkey AS lk, a.c_name AS ln,
                  b.c_custkey AS rk, b.c_name AS rn
  FROM v a JOIN v b ON a.variant = b.variant AND a.c_custkey < b.c_custkey
)
SELECT lk AS c_custkey,
       count(*) AS n_near_dups,
       CAST(min(rk) AS BIGINT) AS first_match_key
FROM cand
WHERE levenshtein(ln, rn) <= 1
GROUP BY lk
""",
    ("J*", "X2"),
    "Fuzzy record-linkage self-join: customers whose names are within "
    "Levenshtein distance 1, found via symmetric-deletion blocking "
    "(SymSpell/FastSS family) — explode each name into its one-char-"
    "deletion variants, equi-join on the variant, verify candidates with "
    "one exact levenshtein() call. Never the O(n^2) all-pairs product; "
    "the oracle runs the same public blocking scheme in DuckDB (a naive "
    "cross join would be quadratic there too), with the exact-distance "
    "verification keeping both sides honest.",
)
def j4_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.linkage import fuzzy_pairs_distance1

    pairs = fuzzy_pairs_distance1(
        load_table(spark, sf_dir, "customer"), "c_custkey", "c_name"
    )
    return pairs.groupBy(F.col("l_key").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_near_dups"),
        F.min("r_key").cast("bigint").alias("first_match_key"),
    )


# ---------------------------------------------------------------------------
# J6 — entity resolution end-to-end (fuzzy block -> components -> canonical)
# ---------------------------------------------------------------------------


@register(
    "j6_entity_resolution",
    f"""
WITH RECURSIVE v AS (
  SELECT c_custkey, c_name,
         unnest(list_distinct(list_prepend(c_name,
           [substr(c_name, 1, i - 1) || substr(c_name, i + 1, length(c_name))
            for i in generate_series(1, length(c_name))]))) AS variant
  FROM customer
),
cand AS (
  SELECT DISTINCT a.c_custkey AS lk, a.c_name AS ln,
                  b.c_custkey AS rk, b.c_name AS rn
  FROM v a JOIN v b ON a.variant = b.variant AND a.c_custkey < b.c_custkey
),
pairs AS (SELECT lk, rk FROM cand WHERE levenshtein(ln, rn) <= 1),
edges AS (
  SELECT lk AS src, rk AS dst FROM pairs
  UNION SELECT rk, lk FROM pairs
),
{_min_label_sql(12)}
SELECT cl.cluster_id, count(*) AS n_members,
       max(struct_pack(b := coalesce(c.c_acctbal, -1e308), nk := -c.c_custkey,
                       k := c.c_custkey, n := c.c_name)).k
         AS canonical_custkey,
       max(struct_pack(b := coalesce(c.c_acctbal, -1e308), nk := -c.c_custkey,
                       k := c.c_custkey, n := c.c_name)).n
         AS canonical_name,
       {{SUM_EXACT}} AS total_acctbal
FROM cl JOIN customer c ON c.c_custkey = cl.node
GROUP BY cl.cluster_id
""".replace("{SUM_EXACT}", _sum_exact_sql("c.c_acctbal")),
    ("J*", "X1", "X2"),
    "Entity resolution end-to-end: deletion-variant fuzzy blocking (j4's "
    "candidate generator) -> exact Levenshtein verification -> connected "
    "components (the iterative min-label/pointer-jumping operator; "
    "unrolled min-label propagation in the oracle — the transitive-"
    "closure recursion carried O(n^2) label pairs on one big component "
    "and could not finish at sf0.1) -> one canonical "
    "record per entity cluster under an explicit SURVIVORSHIP POLICY "
    "(highest account balance, ties to the smallest key, via the struct-"
    "max idiom) plus merged totals (decimal-exact).  The full dedupe-"
    "and-merge a master-data pipeline runs, as one declarative plan; "
    "singleton customers (no fuzzy match) are not clusters and are "
    "excluded by construction on both sides.",
)
def j6_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import sum_exact
    from .operators.dedup import connected_components
    from .operators.linkage import fuzzy_pairs_distance1

    cust = load_table(spark, sf_dir, "customer")
    pairs = fuzzy_pairs_distance1(cust, "c_custkey", "c_name")
    cc = connected_components(pairs, "l_key", "r_key")
    # NULL-total election key: struct-max with a NULL field compares
    # differently in Spark vs DuckDB (null-injection audit); a member
    # with unknown balance ranks below every known balance.
    s = F.struct(
        F.coalesce(F.col("c_acctbal"), F.lit(float("-1e308"))).alias("b"),
        (-F.col("c_custkey")).alias("nk"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("n"),
    )
    return (
        cc.join(cust, cc.doc_id == cust.c_custkey)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(s).getField("k").alias("canonical_custkey"),
            F.max(s).getField("n").alias("canonical_name"),
            sum_exact("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# SQL front-end surface: the same engine through spark.sql() over views
# ---------------------------------------------------------------------------


@register(
    "sql_q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       {_sum_exact_sql('l_quantity')} AS sum_qty,
       {_sum_exact_sql('l_extendedprice')} AS sum_base_price,
       {_avg_exact_sql('l_quantity')} AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    ("A*", "P*"),
    "The pricing summary through the SQL FRONT-END: tables registered as "
    "temp views, the query submitted as a spark.sql() string (Spark "
    "dialect of the same decimal-exact recipe) — proving a SQL-only user "
    "of the engine gets the identical plan and the identical bitwise "
    "result as the Column-API surface.  Catalyst compiles both to the "
    "same scan -> partial agg -> exchange -> final agg shape.",
)
def sql_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS STRING) AS DOUBLE)
         AS sum_qty,
       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS STRING)
            AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS STRING) AS DOUBLE)
         / count(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem_v
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
    )


# ---------------------------------------------------------------------------
# M1 — market-basket pair affinity (support + lift, integer-exact)
# ---------------------------------------------------------------------------


@register(
    "m1_basket_lift",
    """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_cnt AS (
  SELECT l_partkey, count(*) AS cnt FROM items GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_cnt
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items)
SELECT p.part_a, p.part_b, p.pair_cnt,
       (1000000 * p.pair_cnt * t.n_orders) // (ca.cnt * cb.cnt) AS lift_ppm
FROM pairs p
JOIN item_cnt ca ON ca.l_partkey = p.part_a
JOIN item_cnt cb ON cb.l_partkey = p.part_b
CROSS JOIN tot t
ORDER BY p.pair_cnt DESC, p.part_a, p.part_b
LIMIT 200
""",
    ("J*", "A*", "O2"),
    "Market-basket affinity: the 200 most co-ordered part pairs with "
    "support count and lift (P(a,b)/(P(a)P(b)), scaled to exact integer "
    "ppm — no float division on either side).  Pair generation is a "
    "self-equi-join on l_orderkey after per-order item dedup, so the "
    "blow-up is bounded by max-basket-size^2 per order (~13^2 here), "
    "never corpus^2; item counts and the single-row order total join "
    "back broadcast.  At 100 TB add a min-support pre-filter on "
    "item_cnt (frequent-itemset pruning) before the pair join, and move "
    "the lift numerator (1e6 * pair_cnt * n_orders) into DECIMAL(38,0) "
    "— at ~10^10 orders the BIGINT product can overflow, silently in "
    "Spark and loudly in the oracle.",
)
def m1_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    item_cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    tot = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ca = item_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a")
    )
    cb = item_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b")
    )
    # No broadcast hint on the per-part count joins: |part| scales
    # linearly with SF (20B rows at SF100k), so a hard broadcast is the
    # raw-vocab OOM class — AQE picks broadcast-hash from measured size
    # here and degrades to a shuffle join at scale.  Only the 1-row
    # order total keeps the hint.
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .join(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr("1000000 * pair_cnt * n_orders DIV (cnt_a * cnt_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("pair_cnt"), "part_a", "part_b")
        .limit(200)
    )


@register(
    "sql_recursive_user_ewma",
    """
SELECT user_id,
       list_reduce((list(value ORDER BY ts, event_id))[1:32],
                   (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma,
       least(count(*), 32)::BIGINT AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
    ("W*", "SQL"),
    "Spark 4 RECURSIVE CTE front-end: the per-user EWMA recurrence "
    "f(n) = 0.5*value_n + 0.5*f(n-1) expressed as WITH RECURSIVE over "
    "each user's (ts, event_id)-ordered first 32 events — a LINEAR "
    "recursion (one successor per step, no branching), so each "
    "iteration carries exactly |users| rows and terminates at the "
    "32-event cap.  Must match DuckDB's list_reduce fold BITWISE (same "
    "IEEE ops in the same order, the w14/stream_user_ewma contract).  "
    "The higher-order-fold formulation (w14_user_ewma_batch) remains "
    "the scale path; this query exists for SQL-surface parity — a "
    "recursive-SQL user migrating to the engine keeps their query.  "
    "Graph-shaped recursion (transitive closure) is deliberately NOT "
    "offered through this surface: recursive UNION dedup is unsupported "
    "(UNION ALL walks explode on LSH band cliques) — dedup clustering "
    "routes through the pointer-jumping operator (x2_dedup_clusters).  "
    "Execution shape: the capped per-user sequence is MATERIALIZED "
    "(persist) before the recursion — Spark re-executes a non-recursive "
    "CTE referenced inside the recursive member on EVERY iteration, so "
    "the inline form re-ran the events window 32x (11 s -> 4.6 s at "
    "sf0.1) — and each step joins it BROADCAST (|users| x 32 narrow "
    "rows; at a scale where that stops broadcasting, w14 is the path).",
)
def sql_recursive_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    capped = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") <= 32)
        .select("user_id", "value", "rn")
    )
    # Spark re-executes a non-recursive CTE referenced inside the
    # recursive member on EVERY iteration — materialize it first.
    capped = persisted_intermediate(capped, bound="<=32 rows per user")
    capped.createOrReplaceTempView("capped_recursive_v")
    return spark.sql(
        """
WITH RECURSIVE fold(user_id, rn, acc) AS (
  SELECT user_id, rn, value AS acc FROM capped_recursive_v WHERE rn = 1
  UNION ALL
  SELECT /*+ BROADCAST(c) */ c.user_id, c.rn, 0.5D * c.value + 0.5D * f.acc
  FROM fold f JOIN capped_recursive_v c
    ON c.user_id = f.user_id AND c.rn = f.rn + 1
)
SELECT user_id, max_by(acc, rn) AS ewma, CAST(max(rn) AS BIGINT) AS n_events
FROM fold GROUP BY user_id
"""
    )


@register(
    "j7_lateral_topk_orders",
    """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) l
""",
    ("J*", "O2", "SQL"),
    "Correlated LATERAL subquery with ORDER BY ... LIMIT: each "
    "customer's top-2 orders by price, the lateral-join formulation of "
    "the per-group top-k that w4_topk_orders_per_customer expresses as "
    "a ranking window.  Catalyst DECORRELATES it into a partitioned "
    "rank-limit — the physical plan is WindowGroupLimit(partial) -> "
    "exchange -> WindowGroupLimit(final) -> broadcast join, so the "
    "shuffle carries at most k rows per (custkey, partition), never "
    "|orders| per customer (plan-asserted in tests/test_spark4.py).  "
    "The hash gate proves the two formulations agree including the "
    "deterministic o_orderkey tie-break.",
)
def j7_lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lat_v"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer_lat_v c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders_lat_v o WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) l
"""
    )
