"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``bigdatapipeline_steamreviews_spark``
package; this module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatapipeline_steamreviews_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference summarizer's windowed daily summary,
    SURVEY.md §3.1) on /root/testdata/sf0.001; driver checks rows>0."""
    # The driver passes its own session; pin the parity confs (UTC,
    # permissive casts, nanos-drift fallback) before touching any table.
    from bigdatapipeline_steamreviews_spark.session import ensure_parity_conf

    ensure_parity_conf(spark)
    return _registry.REGISTRY["flagship_daily_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted => rows-only)."""
    return _registry.oracle_sql()
