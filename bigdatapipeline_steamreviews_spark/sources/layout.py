"""Physical table layout for scale: bucketed writes (co-located joins) and
partitioned writes (partition-pruned reads).

These back the engine's two central 100 TB storage claims with runnable
code instead of prose:

* **Bucketing** — a fact table written ``bucketBy(N, key).sortBy(key)``
  is pre-shuffled AND pre-sorted on disk.  A join of two tables bucketed
  the same way needs **no Exchange and no Sort** on either side — the
  most expensive stages of a fact-fact join are paid once at write time
  and amortized over every subsequent join.  (`tests/test_scale_layout.py`
  asserts the exchange-free, sort-free plan.)
* **Partitioning** — a serving table written ``partitionBy(year, month)``
  turns time-drilldown filters (the reference dashboard's P11 pattern)
  into directory pruning: a month query reads one directory, not the
  table.  (Plan shows the filter under ``PartitionFilters``, and the scan
  reads only matching files.)

Both are plain ``DataFrameWriter`` features — no table format dependency;
Delta/Iceberg add transactions and compaction on top, not the layout idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed_table", "write_partitioned", "read_partitioned"]


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table registered in the
    session catalog (bucket metadata lives in the catalog, which is why
    this is ``saveAsTable`` and not a bare path write)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Write a table partitioned by the given columns (directory-per-value
    layout; readers prune directories via partition filters)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
