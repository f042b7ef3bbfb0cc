#!/usr/bin/env python
"""Round-14 ask #4 evidence: where does the BLAS (mapInPandas GEMM)
cosine top-k overtake the codegen'd expression fold?

Builds synthetic float32 corpora (seeded, deterministic) at a range of
dimensionalities, times `cosine_topk` (expression path) vs
`cosine_topk_blas` (GEMM selection + exact rescore) — min of N runs
each, first run discarded per path per dim (JIT / Python-worker warmup)
— and asserts the two paths return IDENTICAL rows at every dim before
trusting any timing.  Prints one JSON line for PERF.md.

Usage: python scripts/blas_crossover_probe.py [n_rows] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_blas,
)

DIMS = (64, 256, 1024, 2048)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("blas-crossover")
    out: dict = {"n_rows": n, "k": 5, "n_queries": 10, "dims": {}}
    for dim in DIMS:
        rng = np.random.default_rng(dim)
        mat = rng.standard_normal((n, dim)).astype("float32")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in mat[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        ).repartition(32)
        emb.persist().count()  # timings measure compute, not staging
        pred = F.col("vec_id") < 10

        def timed(fn):
            ts = []
            for _ in range(runs + 1):
                t0 = time.monotonic()
                fn().collect()
                ts.append(time.monotonic() - t0)
            return ts[1:]  # drop warmup

        expr_rows = cosine_topk(emb, pred, k=5).orderBy(
            "query_id", "rank"
        ).collect()
        blas_rows = cosine_topk_blas(emb, pred, k=5).orderBy(
            "query_id", "rank"
        ).collect()
        assert expr_rows == blas_rows, f"paths diverge at dim={dim}"

        t_expr = timed(lambda: cosine_topk(emb, pred, k=5))
        t_blas = timed(lambda: cosine_topk_blas(emb, pred, k=5))
        out["dims"][dim] = {
            "expr_s": round(min(t_expr), 3),
            "blas_s": round(min(t_blas), 3),
            "expr_samples": [round(t, 3) for t in t_expr],
            "blas_samples": [round(t, 3) for t in t_blas],
            "speedup": round(min(t_expr) / min(t_blas), 2),
            "identical": True,
        }
        emb.unpersist()
    print(json.dumps({"blas_crossover": out}))
    spark.stop()


if __name__ == "__main__":
    main()
