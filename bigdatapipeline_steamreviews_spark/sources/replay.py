"""S2/S4 — the producer replay (``/root/reference/stream_generator.py``),
Spark-first.

The reference replays a CSV row-by-row from a single Python process with a
10ms±1ms sleep per message (~90-100 msg/s, stream_generator.py:10-11,53-58).
Rebuilt two ways:

* **Bulk replay** (`replay_to_kafka`): a batch DataFrame written through
  the kafka sink — parallel across partitions, no driver loop, the right
  way to backfill a topic at any scale.
* **Paced synthetic stream** (`paced_event_stream`): the `rate` source
  emitting rows/sec on a schedule, mapped to events-shaped columns — the
  demo/load-test stand-in that needs no Kafka and no data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kafka import encode_json_output

__all__ = ["replay_to_kafka", "paced_event_stream"]


def replay_to_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, key_col: str | None = None
) -> None:
    """Bulk-produce a batch DataFrame to Kafka as one JSON object per row
    (the reference's wire format), parallel across partitions."""
    out = encode_json_output(df, key_col) if key_col else df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def paced_event_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """The reference's ~100 rows/sec replay pacing (stream_generator.py:10-11)
    as a `rate` source mapped to the events shape — deterministic columns
    derived from the tick index, usable anywhere a streaming events frame is.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    etypes = F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")])
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 1000).alias("user_id"),
        F.element_at(etypes, (F.col("value") % 5 + 1).cast("int")).alias("event_type"),
        (F.pmod(F.col("value") * F.lit(2654435761), F.lit(20000)) / 100.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
    )
