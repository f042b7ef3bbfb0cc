"""Write-audit-publish (WAP): the output-side quality gate a production
lake runs on every batch — write to a staging path, AUDIT the staged
bytes with the constraint suite, and atomically publish only a clean
audit.  Composes the existing pieces (`operators/quality.constraint_report`
+ `sources/staging.publish_dir`); this test pins the contract:

* a failing audit leaves NO published directory (readers keep seeing the
  previous version, or nothing);
* a passing audit publishes atomically (marker-gated rename), and the
  published bytes equal the staged frame exactly.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.quality import (
    constraint_report,
)
from bigdatapipeline_steamreviews_spark.sources.staging import publish_dir
from bigdatapipeline_steamreviews_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _audit(spark, staged_path):
    staged = spark.read.parquet(staged_path)
    rules = [
        (
            "event_id_not_null",
            staged.agg(
                F.count_if(F.col("event_id").isNull()).alias("n_violations")
            ),
        ),
        (
            "event_id_unique",
            staged.agg(
                (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                    "n_violations"
                )
            ),
        ),
        (
            "value_non_negative",
            staged.agg(
                F.count_if(F.col("value") < 0).alias("n_violations")
            ),
        ),
    ]
    report = constraint_report(rules).collect()
    return all(r.status == "pass" for r in report), report


def test_wap_publishes_only_clean_audits(spark):
    events = load_table(spark, SF_DIR, "events")
    root = tempfile.mkdtemp(prefix="wap_")
    final = os.path.join(root, "published", "events_daily")

    # Batch 1: corrupt (negative values injected) — audit must block it.
    stage1 = os.path.join(root, "stage1")
    events.withColumn(
        "value", F.when(F.col("event_id") % 97 == 0, -1.0).otherwise(F.col("value"))
    ).write.mode("overwrite").parquet(stage1)
    ok, report = _audit(spark, stage1)
    assert not ok, "corrupt batch passed the audit"
    assert not os.path.exists(final), "nothing published yet"
    # the WAP protocol: failing audit => no publish call at all

    # Batch 2: clean — audit passes and the stage publishes atomically.
    stage2 = os.path.join(root, "stage2")
    clean = events.filter(F.col("value").isNull() | (F.col("value") >= 0))
    clean.write.mode("overwrite").parquet(stage2)
    ok, report = _audit(spark, stage2)
    assert ok, f"clean batch failed the audit: {report}"
    publish_dir(stage2, final)
    assert os.path.exists(os.path.join(final, "_SUCCESS"))

    published = spark.read.parquet(final)
    assert published.count() == clean.count()
    a = published.agg(
        F.sum(F.col("value").cast("decimal(28,10)")).alias("s")
    ).collect()[0].s
    b = clean.agg(
        F.sum(F.col("value").cast("decimal(28,10)")).alias("s")
    ).collect()[0].s
    assert a == b, "published bytes differ from the staged frame"
