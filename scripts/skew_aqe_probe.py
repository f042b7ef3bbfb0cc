#!/usr/bin/env python
"""AQE skew-join probe at scale (round-12 verdict ask #6): on a SKEWED
x30 events corpus (sf3-equivalent volume, ~50% of rows collapsed onto
one existing hot customer key — the adversarial_data recipe), run the
j3-shaped join+aggregate three ways and compare wall-clock + results:

  1. naive shuffled join, AQE skew-join OFF  — the straggler baseline:
     the hot key's entire volume sorts/joins in ONE task;
  2. naive shuffled join, AQE skew-join ON   — OptimizeSkewedJoin reads
     runtime shuffle stats, marks the join ``skew=true`` and splits the
     hot partition along map-block boundaries;
  3. explicit ``salted_join`` (n_salts=8)    — the manual formulation
     the registry ships (j3_salted_segment_stats).

All three must produce the IDENTICAL aggregate (printed as a sorted
digest) — skew handling is pure routing.  The skew threshold is set to
8 MB (default 256 MB): the x30 hot partition is ~tens of MB compressed,
real but below the default tuned for production shuffles; the probe
reports the thresholds it ran with.  ``tests/test_skewed_input.py::
test_aqe_skew_join_splits_hot_partition`` pins the same mechanism in CI
at test scale.

Usage: python scripts/skew_aqe_probe.py [x30_dir]
Emits one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.functions import sum_exact  # noqa: E402
from bigdatapipeline_steamreviews_spark.operators.partitioning import (  # noqa: E402
    salted_join,
)

CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8388608",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4194304",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else None
    if base is None:
        import glob

        cands = sorted(glob.glob("/tmp/spark_graft_x10_*_30_v5"))
        if not cands:
            print("no x30 corpus staged; run scripts/scaling_probe.py with "
                  "SPARK_GRAFT_PROBE_REPLICAS=30 first")
            sys.exit(2)
        base = cands[0]
    spark = get_spark("skew-aqe-probe")
    for k, v in CONFS.items():
        spark.conf.set(k, v)

    c = spark.read.parquet(f"{base}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    hot = spark.read.parquet(f"{base}/customer.parquet").agg(
        F.min("c_custkey")
    ).first()[0]
    e = (
        spark.read.parquet(f"{base}/events.parquet")
        # The staged corpus is ONE part file = one map task, and AQE can
        # only split a skewed reduce partition along map-block boundaries
        # — a single block is unsplittable regardless of size.  At 100 TB
        # thousands of input splits make this automatic; here the
        # repartition stands in for them (same lesson as the pytest).
        .repartition(64)
        .select(
            F.when(F.pmod(F.xxhash64("event_id"), 2) == 0, F.lit(hot))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "value",
        )
    )

    def agg(joined):
        return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_exact("value").alias("total_value"),
        )

    def run(build, skew_on):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if skew_on else "false")
        spark.catalog.clearCache()
        df = agg(build())
        # Time the collect of df's OWN QueryExecution — a write() wraps
        # the plan in a separate execution, leaving df's adaptive plan
        # un-materialized and its skew markers unreadable.
        t0 = time.time()
        rows = df.collect()
        sec = round(time.time() - t0, 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        digest = hashlib.sha256(
            repr(sorted(
                (r.segment, r.n_events, str(r.total_value)) for r in rows
            )).encode()
        ).hexdigest()[:16]
        return {
            "sec": sec,
            "skew_split": "skew=true" in plan,
            "digest": digest,
        }

    out = {
        "corpus": base,
        "hot_key": hot,
        "confs": CONFS,
        "naive_skewjoin_off": run(lambda: e.join(c, "user_id"), skew_on=False),
        "naive_skewjoin_on": run(lambda: e.join(c, "user_id"), skew_on=True),
        "salted": run(
            lambda: salted_join(e, c, "user_id", n_salts=8), skew_on=False
        ),
    }
    out["same_answer"] = (
        out["naive_skewjoin_off"]["digest"]
        == out["naive_skewjoin_on"]["digest"]
        == out["salted"]["digest"]
    )
    print(json.dumps({"skew_aqe_probe": out}))


if __name__ == "__main__":
    main()
