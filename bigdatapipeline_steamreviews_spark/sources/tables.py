"""Batch sources: parquet test tables + the reference's CSV review source.

S1 (CSV scan): the reference reads quoted/escaped CSV with no header and
assigns 24 names positionally (``/root/reference/stream_generator.py:49-50``).
Spark-first equivalent: an explicit-schema ``spark.read.csv`` so Catalyst
knows the types at plan time and nothing is inferred.

Parquet loads push column pruning + predicate pushdown into the scan (check
``.explain``: ``ReadSchema`` / ``PushedFilters``) — which is what keeps a
100 TB scan from reading 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import REVIEW_SCHEMA

__all__ = ["load_table", "load_tables", "read_reviews_csv", "TABLE_NAMES"]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver test table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as a
    long (``spark.sql.legacy.parquet.nanosAsLong``) and we truncate to
    microseconds here — the same truncation DuckDB applies — so both engines
    see identical timestamps.
    """
    from ..session import ensure_parity_conf

    ensure_parity_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES))


def read_reviews_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — the reference's CSV review source, Spark-native.

    Mirrors ``pd.read_csv(path, quotechar='"', sep=',', escapechar='\\\\',
    header=None)`` + positional names (stream_generator.py:15-40,49-50), but
    with the declared 24-field schema (summarizer.py:24-49) applied at scan
    time so the read parallelizes and type errors surface per-record instead
    of poisoning the whole file.
    """
    return (
        spark.read.schema(REVIEW_SCHEMA)
        .options(header=False, quote='"', escape="\\", sep=",", mode="PERMISSIVE")
        .csv(path)
    )
