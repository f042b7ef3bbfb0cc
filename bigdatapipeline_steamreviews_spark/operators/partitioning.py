"""Partitioning utilities — parallelism guards for explode-heavy operators.

Spark sizes a parquet scan's partitions by bytes
(``spark.sql.files.maxPartitionBytes``), so a compact input — one small
file locally, or a handful of heavily-compressed row groups anywhere —
can enter the plan as one or two partitions.  That is fine for a scan,
but an operator that *expands* its input (shingle explode, token explode:
5-50x row growth) then does all its downstream join/aggregate work at the
input's parallelism: broadcast joins add no exchange, so nothing ever
re-partitions and one task does everything.

``ensure_min_parallelism`` is the declarative fix: round-trip through one
hash repartition only when the input has fewer partitions than the
session's default parallelism.  On a real cluster reading a real table
(thousands of splits) it is a no-op; on a compact input it buys full
fan-out for one cheap shuffle of the *pre-explode* rows — always smaller
than shuffling the exploded output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

__all__ = ["ensure_min_parallelism"]


def ensure_min_parallelism(
    df: DataFrame, *keys: Column | str, min_partitions: int | None = None
) -> DataFrame:
    """Repartition ``df`` (hash on ``keys`` if given, else round-robin) up
    to the session default parallelism — but only if the plan currently has
    fewer partitions.  No-op (and no shuffle) on already-parallel inputs.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
