#!/usr/bin/env python
"""In-session alternating A/B: x3_pq_adc_topk with vs without the
_pq_sliced_corpus spread_scan (r17 verdict ask #3).

Per the host-steal protocol (13-52% bursty hypervisor steal), variants
alternate back-to-back in ONE session and the decision compares MINS, with
per-sample steal logged.  bench.py semantics per sample: clearCache, build,
noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.operators.similarity import (  # noqa: E402
    pq_adc_topk,
)
from bigdatapipeline_steamreviews_spark.queries_similarity import (  # noqa: E402
    _clean_emb,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ticks():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(v) - v[3] - v[4], v[7]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_adc_spread")
    spark.sparkContext.setJobDescription("ab_adc_spread")

    def run(spread: bool) -> tuple[float, float]:
        spark.catalog.clearCache()
        b0, s0 = _ticks()
        t0 = time.time()
        df = pq_adc_topk(
            _clean_emb(spark, SF_DIR), F.col("vec_id") < 10, n_sub=4, k=5,
            spread=spread,
        )
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        b1, s1 = _ticks()
        return wall, round(100.0 * (s1 - s0) / max(b1 - b0, 1), 1)

    run(True)  # warmup, untimed
    run(False)
    res = {"spread": [], "nospread": []}
    for i in range(rounds):
        for name, flag in (("spread", True), ("nospread", False)):
            w, st = run(flag)
            res[name].append((round(w, 3), st))
            print(json.dumps({"round": i, "variant": name, "wall": round(w, 3), "steal": st}), flush=True)
    summary = {
        k: {"min": min(w for w, _ in v), "all": v} for k, v in res.items()
    }
    print(json.dumps(summary))
    with open("/tmp/ab_adc_spread.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
