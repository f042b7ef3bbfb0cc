#!/usr/bin/env python
"""Round-14 ask #2: settle the IVF+PQ close-to-close timing drift.

r12->r13 close stamps showed x3_ivf_pq_persisted 1.25->2.01 s,
x3_ivf_pq_topk 1.17->1.67 s, x3_ivf_pq_incremental 1.76->2.42 s with
noise-shaped raw samples but a direction consistent across both stamps.
This probe re-times EXACTLY those three plus a control query
(x3_cosine_topk — shares the corpus scan but none of the staged-index
read path) in a quiet window, bench-protocol-identical (fresh staging
pre-pass excluded, then min-of-3 with all samples kept).  Run when
`cat /proc/loadavg` 1-min < 0.3.  Prints one JSON line for PERF.md.

Usage: python scripts/ivf_pq_reprobe.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipeline_steamreviews_spark import get_spark, queries  # noqa: E402

PROBE = [
    "x3_ivf_pq_persisted",
    "x3_ivf_pq_topk",
    "x3_ivf_pq_incremental",
    "x3_cosine_topk",  # control: same corpus, no staged-index path
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    spark = get_spark("ivf-pq-reprobe")
    regs = queries()
    out: dict = {"sf_dir": SF_DIR, "loadavg_1min_at_start": load1, "queries": {}}
    for name in PROBE:
        regs[name](spark, SF_DIR).collect()  # staging + JIT warm pass
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            regs[name](spark, SF_DIR).collect()
            samples.append(round(time.monotonic() - t0, 3))
        out["queries"][name] = {
            "min_s": min(samples),
            "samples": samples,
            "spread_s": round(max(samples) - min(samples), 3),
        }
    print(json.dumps({"ivf_pq_reprobe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
