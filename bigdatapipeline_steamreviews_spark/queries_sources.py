"""Source-format coverage beyond parquet/CSV (SURVEY.md §2.1): the flagship
aggregate run end-to-end from JSON-lines and ORC stagings of the events
table, gated against the SAME DuckDB oracle as the parquet flagship — if
the format round-trip loses or mangles a single value anywhere (timestamp
precision, embedded-JSON escaping, null handling), the hash compare fails.

Staging derives deterministically from the driver's parquet (fingerprint-
cached under /tmp, same invalidation discipline as the streaming replay
stage), so the oracle legitimately reads the parquet view: identical rows,
different wire format on the Spark side.

Scale notes: both readers take a DECLARED schema (no sampling-based
inference pass over 100 TB); JSON carries event-time as epoch-micros
integers because timestamp-string round-trips are where JSON pipelines
silently lose sub-second precision.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.aggregations import daily_summary
from .queries_streaming import _source_fingerprint
from .registry import FLAGSHIP_ORACLE, _sum_exact_sql, register
from .sources.tables import load_table

_EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch micros
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _stage_events_as(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write the events table once as ``fmt`` under /tmp, fingerprint-keyed
    so regenerated testdata can never serve a stale staging."""
    key = _source_fingerprint(sf_dir)
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_src_{fmt}_{key}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        df = load_table(spark, sf_dir, "events")
        if fmt == "json":
            df = df.withColumn("ts", F.unix_micros(F.col("ts")))
            df.write.mode("overwrite").json(out)
        elif fmt == "orc":
            df.write.mode("overwrite").orc(out)
        else:  # pragma: no cover - registration-time typo guard
            raise ValueError(f"unknown staging format {fmt!r}")
    return out


@register(
    "src_json_daily_summary",
    FLAGSHIP_ORACLE,
    ("S1", "A1", "P2", "P3"),
    "The flagship daily summary computed from a JSON-lines source: events "
    "staged as JSON (event-time as epoch-micros integers, props as an "
    "embedded JSON string — the escaping round-trip is part of the test), "
    "read back with a DECLARED schema (no inference scan), aggregated, and "
    "hash-compared against the parquet oracle. Proves the engine's query "
    "surface is source-format-agnostic end-to-end.",
)
def src_json_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_events_as(spark, sf_dir, "json")
    events = (
        spark.read.schema(_EVENTS_JSON_SCHEMA)
        .json(path)
        .withColumn("ts", F.timestamp_micros(F.col("ts")))
    )
    return daily_summary(events)


@register(
    "src_orc_daily_summary",
    FLAGSHIP_ORACLE,
    ("S1", "A1"),
    "The flagship daily summary computed from an ORC source (the second "
    "columnar format a lakehouse actually encounters): native ORC "
    "timestamps survive the round-trip under the pinned UTC session, and "
    "the result must hash-match the parquet oracle exactly.",
)
def src_orc_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_events_as(spark, sf_dir, "orc")
    return daily_summary(spark.read.orc(path))


@register(
    "src_union_evolved_schema",
    """
SELECT coalesce(lang, 'unknown') AS lang,
       count(*) AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
FROM (
  SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 != 0
  UNION ALL
  SELECT doc_id, text, NULL AS lang FROM documents WHERE doc_id % 3 = 0
)
GROUP BY 1
""",
    ("S*", "P13"),
    "Schema evolution at the ingest edge: an older batch written before "
    "the `lang` column existed unions with current batches via "
    "unionByName(allowMissingColumns=True) — positional unionAll would "
    "silently misalign columns; by-name union NULL-fills the missing one "
    "and the aggregate treats it as 'unknown'.  The batch split is "
    "simulated by doc_id parity; the oracle mirrors it with explicit "
    "NULL projection.",
)
def src_union_evolved_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    current = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text", "lang")
    # The "pre-lang" batch: the column simply doesn't exist in its schema.
    legacy = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    unioned = current.unionByName(legacy, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce(F.col("lang"), F.lit("unknown")).alias("lang")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Partition-pruned directory source
# ---------------------------------------------------------------------------


@register(
    "src_partitioned_pruned_scan",
    f"""
SELECT date_trunc('day', ts) AS day, count(*) AS n_events,
       {_sum_exact_sql('value')} AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY 1
""",
    ("S*", "P7", "P9"),
    "Directory-partitioned source with partition pruning: the events "
    "table is staged once per corpus fingerprint as "
    "partitionBy(event_type) parquet, and the query's equality filter "
    "becomes a PartitionFilter — the scan lists ONLY the one "
    "event_type=purchase directory, never opening the other partitions' "
    "files (plan-asserted in tests/test_scale_layout.py for the layout "
    "op; here the pruned read is oracle-gated end-to-end against the "
    "unpartitioned table).  At 100 TB this is the difference between "
    "reading 1/N of the lake and reading all of it.",
)
def src_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import functions as F

    from .functions import sum_exact
    from .sources.staging import (
        STAGE_ROOT,
        STAGE_VERSION,
        publish_dir,
        source_fingerprint,
    )
    from .sources.tables import load_table

    fp = source_fingerprint(sf_dir, "events")
    path = os.path.join(STAGE_ROOT, f"events_bytype_{fp}_{STAGE_VERSION}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.build{os.getpid()}"
        load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(tmp)
        publish_dir(tmp, path)
    purchases = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    return purchases.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_exact("value").alias("total_value"),
    )
