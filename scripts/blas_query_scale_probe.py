#!/usr/bin/env python
"""Driver-memory probe for cosine_topk_blas at corpus-scale QUERY sets
(r14 verdict ask #6).

The r14 implementation ``.collect()``ed the query vectors to the driver
— bounded and fine for retrieval workloads (requests are driver-side
anyway), but a corpus-scale query block (batch re-ranking, all-pairs
refresh) would materialize |q| x dim doubles in the driver Python
process.  r15 lifts that: the query block is STAGED to parquet and each
executor worker loads it once; the driver holds only a path.

This probe runs the operator with 10,000 queries over a 20,000-vector
synthetic corpus (deterministic xxhash64-derived components, generated
JVM-side — the driver never builds a vector) and reports the driver
Python process's VmRSS before staging and after full execution.  The
acceptance statement is the DELTA: with the old collect it would grow by
at least the query block (plus list-of-Row overhead, ~5-40 MB at this
size and multiplying with dim); with staging it stays allocator noise.
Result cardinality (10_000 x k) is asserted so the probe cannot pass on
an empty plan.

Usage: python scripts/blas_query_scale_probe.py
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
    cosine_topk_blas,
)

N_CORPUS = 20_000
N_QUERIES = 10_000
DIM = 64
K = 5


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    spark = get_spark("blas-query-scale-probe")
    # Deterministic synthetic corpus, built entirely JVM-side.
    emb = spark.range(N_CORPUS).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000
            ).cast("double")
            / 1000.0,
        ).alias("embedding"),
    )
    rss_before = _rss_mb()
    t0 = time.time()
    rows = cosine_topk_blas(
        emb, F.col("vec_id") < N_QUERIES, k=K
    ).count()
    wall = round(time.time() - t0, 1)
    rss_after = _rss_mb()
    out = {
        "n_corpus": N_CORPUS,
        "n_queries": N_QUERIES,
        "dim": DIM,
        "result_rows": rows,
        "expected_rows": N_QUERIES * K,
        "wall_s": wall,
        "driver_py_rss_before_mb": rss_before,
        "driver_py_rss_after_mb": rss_after,
        "driver_py_rss_delta_mb": round(rss_after - rss_before, 1),
    }
    assert rows == N_QUERIES * K, out
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
