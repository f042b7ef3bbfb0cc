"""bigdatapipeline_steamreviews_spark — a PySpark-native analytics engine
with the query and data-processing capabilities of
NikeshDC/BigDataPipeline_SteamReviews, rebuilt Spark-first.

Layers (see SURVEY.md for the blueprint):
* ``schemas``    — declared schemas (never inferred on the hot path)
* ``sources``    — parquet/CSV/Kafka/rate sources and sinks
* ``functions``  — reusable Catalyst column expressions (zero Python UDFs)
* ``operators``  — relational + LLM-data-pipeline operators (dedup,
                   similarity, text analysis, multimodal)
* ``streaming``  — the Structured Streaming summarizer pipeline
* ``registry``   — every query as a (PySpark fn, DuckDB oracle SQL) pair
"""

from .session import get_spark
from .registry import REGISTRY, queries, oracle_sql

__all__ = ["get_spark", "REGISTRY", "queries", "oracle_sql"]
__version__ = "0.1.0"
