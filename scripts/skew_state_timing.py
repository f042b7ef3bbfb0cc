#!/usr/bin/env python
"""Per-key-state skew timing (r7 verdict ask #5): the skew corpus proved
the stateful family ANSWERS right with a 50%-hot key; this measures what
the hot key COSTS.  The 100 TB failure mode of per-key state / per-key
top-k under skew is a straggler partition — one reducer holding half the
rows — which at local[32] shows up as wall-clock that stops scaling with
cores.

Method: build a 50%-hot-key corpus at sf0.1 (same generator as the
correctness audit, `scripts/adversarial_data.py`), then time
`stream_sessionization` (applyInPandasWithState per-user sessions) and
`w4_topk_orders_per_customer` (WindowGroupLimit per-key top-k) on clean
vs skew, cold, best-of-3.  Then amplify volume 4x WITHOUT remapping the
key column (event_id/o_orderkey offsets only), so the hot key's state
grows 4x while key cardinality stays fixed — if a straggler term exists,
the skew/clean ratio must GROW with amplification; if the ratio is flat,
the operator's cost is volume-bound, not hot-key-bound.

Usage: python scripts/skew_state_timing.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from adversarial_data import CORPUS_VERSION, _skew, write_flat  # noqa: E402
from bigdatapipeline_steamreviews_spark import get_spark, queries  # noqa: E402
from bigdatapipeline_steamreviews_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
)

BASE = "/root/testdata/sf0.1"
SKEW_DIR = f"/tmp/spark_graft_sf_skew01_{CORPUS_VERSION}"
AMP = 4
STRIDE = 100_000_000

QUERIES = ("stream_sessionization", "w4_topk_orders_per_customer")


def build_skew(spark) -> str:
    if not os.path.exists(os.path.join(SKEW_DIR, "_DONE")):
        for t in TABLE_NAMES:
            df = spark.read.parquet(f"{BASE}/{t}.parquet")
            write_flat(_skew(spark, df, t, BASE), SKEW_DIR, t)
        open(os.path.join(SKEW_DIR, "_DONE"), "w").close()
    return SKEW_DIR


def build_amplified(spark, src: str, tag: str) -> str:
    """4x the events/orders volume, SAME key space: row ids get a replica
    stride so dedup-by-id semantics hold, but user_id/o_custkey are kept —
    the hot key's state volume grows 4x, key cardinality does not."""
    out = f"/tmp/spark_graft_sf_{tag}_x{AMP}_{CORPUS_VERSION}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(AMP - 1))).alias("rep")
    ev = (
        spark.read.parquet(f"{src}/events.parquet")
        .select("*", rep)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * STRIDE)
        .drop("rep")
    )
    write_flat(ev, out, "events")
    orders = (
        spark.read.parquet(f"{src}/orders.parquet")
        .select("*", rep)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * STRIDE)
        .drop("rep")
    )
    write_flat(orders, out, "orders")
    for t in TABLE_NAMES:
        if t in ("events", "orders"):
            continue
        write_flat(spark.read.parquet(f"{src}/{t}.parquet"), out, t)
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def main() -> None:
    spark = get_spark("skew-state-timing")
    regs = queries()
    skew = build_skew(spark)
    clean_amp = build_amplified(spark, BASE, "clean01")
    skew_amp = build_amplified(spark, skew, "skew01")

    def best3(name, sf_dir):
        samples = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            regs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        return samples

    out = {}
    for name in QUERIES:
        row = {}
        for label, d in (
            ("clean", BASE),
            ("skew", skew),
            (f"clean_x{AMP}", clean_amp),
            (f"skew_x{AMP}", skew_amp),
        ):
            s = best3(name, d)
            row[label] = {"best": min(s), "samples": s}
            print(json.dumps({name: {label: row[label]}}))
        r1 = row["skew"]["best"] / row["clean"]["best"]
        r4 = row[f"skew_x{AMP}"]["best"] / row[f"clean_x{AMP}"]["best"]
        row["skew_over_clean"] = round(r1, 2)
        row[f"skew_over_clean_x{AMP}"] = round(r4, 2)
        out[name] = row
    print(json.dumps({"skew_state_timing": out}))


if __name__ == "__main__":
    main()
