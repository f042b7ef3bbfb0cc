"""Opt-in Kafka end-to-end integration test (S3/S4/S5/S6).

No broker exists in the sandbox, so this entire module SKIPS unless
``SPARK_GRAFT_KAFKA=broker:port`` points at a reachable Kafka (and the
session was built with the spark-sql-kafka-0-10 package, e.g.
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``).
When it runs, it drives the full reference pipeline shape
(`/root/reference/kafka_server_setup.sh:73-75` topics,
`stream_generator.py:45-55` JSON-per-record producer,
`summarizer.py:52-59,103-111` source/sink):

    replay_to_kafka (S4 batch producer, JSON wire format)
      -> read_kafka_stream + parse_json_values (S3 source, P1/P2 decode)
      -> streaming daily summary (A1)
      -> write_kafka_stream update-mode + checkpoint (S5 sink)
      -> batch read-back of the output topic, last-record-per-key merge
         (S6 consumer semantics) vs the batch aggregate.

Everything else in the suite exercises the same operators through the
file-stream twin; this is the wire-level proof when a broker exists.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatapipeline_steamreviews_spark.operators.aggregations import daily_summary
from bigdatapipeline_steamreviews_spark.sources.kafka import (
    parse_json_values,
    read_kafka_stream,
    write_kafka_stream,
)
from bigdatapipeline_steamreviews_spark.sources.replay import replay_to_kafka
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from tests.conftest import SF_DIR

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="Kafka e2e is opt-in: set SPARK_GRAFT_KAFKA=broker:port "
    "(no broker exists in the sandbox; the file-stream twin covers the "
    "same operators there)",
)

# Wire schema of the replayed events rows: to_json writes ts as an ISO
# timestamp string, so from_json round-trips it as TimestampType.
_EVENTS_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_kafka_roundtrip_matches_batch(spark):
    run_id = uuid.uuid4().hex[:8]
    in_topic = f"graft_events_{run_id}"
    out_topic = f"graft_summary_{run_id}"

    events = load_table(spark, SF_DIR, "events").limit(500)
    try:
        # S4: batch producer, one JSON object per record, keyed by event_id.
        replay_to_kafka(events, BOOTSTRAP, in_topic, key_col="event_id")
    except Exception as e:  # pragma: no cover - deploy-config dependent
        if "Failed to find data source" in str(e) or "kafka" in str(e).lower():
            pytest.skip(
                "kafka data source not on the classpath — launch with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13"
            )
        raise

    # S3 + P1/P2: subscribe from earliest, decode the JSON wire format.
    parsed = parse_json_values(
        read_kafka_stream(spark, BOOTSTRAP, in_topic), _EVENTS_WIRE_SCHEMA
    )
    summary = daily_summary(parsed)

    # S5: update-mode keyed sink with checkpoint (summarizer.py:103-111).
    ckpt = tempfile.mkdtemp(prefix="kafka_e2e_ckpt_")
    query = write_kafka_stream(
        summary, BOOTSTRAP, out_topic, ckpt, output_mode="update", key_col="event_type"
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    # S6: consumer-side keyed merge — the LAST record per key is the
    # serving value; it must equal the batch aggregate over the same rows.
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", out_topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "offset",
        )
    )
    rows = raw.collect()
    assert rows, "output topic is empty"

    def norm_ts(s: str) -> str:
        # to_json / isoformat differ in the date-time separator only.
        return s.replace(" ", "T")[:19]

    latest: dict[tuple, dict] = {}
    for r in sorted(rows, key=lambda r: r.offset):
        payload = json.loads(r.value)
        latest[(r.key, norm_ts(payload["time"]))] = payload

    batch = {
        (r.event_type, norm_ts(r.time.isoformat())): r
        for r in daily_summary(events).collect()
    }
    assert len(latest) == len(batch)
    for key, payload in latest.items():
        b = batch[key]
        assert payload["T_events"] == b.T_events
        assert payload["A_value"] == pytest.approx(b.A_value, rel=1e-12)
