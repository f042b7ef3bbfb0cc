#!/usr/bin/env python
"""In-session alternating A/B (r17): residual IVF+PQ build — r16's
join-back-on-list_id shape (whose inferred isnotnull pushdown evaluates
the full-corpus assignment argmin twice, see
plans/r17/x3_ivf_pq_residual_before.txt ops 15-16) vs the r17
carry-centroid shape.  Old shape reconstructed here verbatim from the r16
code so both variants run back-to-back in ONE session (host-steal
protocol)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.operators import similarity as S  # noqa: E402
from bigdatapipeline_steamreviews_spark.queries_similarity import (  # noqa: E402
    _clean_emb,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_residual_topk(embeddings, query_pred, k=5, n_lists=16, n_probe=16,
                      n_sub=4, codebook_k=4, dim=64):
    """The r16 shape: assignment, then join back to centroids on list_id."""
    e, n_sub, sub_dim = S._pq_sliced_corpus(
        embeddings, query_pred, n_sub, dim, "vec_id", "embedding"
    )
    centroids = S.seeded_centroids(embeddings, n_lists, "vec_id", "embedding")
    seed_rows = e.orderBy("vid").limit(n_lists + codebook_k)
    seed_asg = S.assign_to_centroids(
        seed_rows, centroids, id_col="vid", vec_col="v", cluster_col="list_id"
    )
    seed_res = seed_asg.join(F.broadcast(centroids), "list_id").select(
        "vid", F.zip_with("v", "centroid", lambda a, b: a - b).alias("v")
    )
    cb = S._pq_codebook(seed_res, n_sub, sub_dim, codebook_k, skip=n_lists)
    asg = S.assign_to_centroids(
        e, centroids, id_col="vid", vec_col="v", cluster_col="list_id"
    )
    res = asg.join(F.broadcast(centroids), "list_id").select(
        "vid", "list_id",
        F.zip_with("v", "centroid", lambda a, b: a - b).alias("v"),
    )
    nested_cb = S._pq_codebook_nested(cb, n_sub)
    coded = res.crossJoin(F.broadcast(nested_cb)).select(
        "vid", "list_id",
        F.array(*[S._pq_code_col(F.col("v"), s, sub_dim) for s in range(n_sub)]).alias("codes"),
    )
    q = e.filter(F.col("is_q")).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv")
    )
    qdist = q.crossJoin(F.broadcast(centroids)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
    )
    wprobe = Window.partitionBy("query_id").orderBy("dist", "list_id")
    qprobe = (
        qdist.withColumn("__pr", F.row_number().over(wprobe))
        .filter(F.col("__pr") <= n_probe)
        .select(
            "query_id", "list_id",
            F.zip_with(F.col("qv"), F.col("centroid"), lambda a, b: a - b).alias("qr"),
        )
    )

    def lut_for(s):
        sl = F.slice(F.col("qr"), 1 + s * sub_dim, sub_dim)
        return F.transform(
            F.element_at(F.col("cb"), s + 1), lambda ent: S._pq_subdist(sl, ent["c"])
        )

    nested = S._pq_codebook_nested(cb, n_sub)
    lutf = qprobe.crossJoin(F.broadcast(nested)).select(
        "query_id", "list_id",
        F.array(*[lut_for(s) for s in range(n_sub)]).alias("lut"),
    )
    adc = (
        coded.join(F.broadcast(lutf), "list_id")
        .select("query_id", F.col("vid").alias("neighbor_id"),
                S._pq_adc_dist().alias("adc_dist"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _ticks():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(v) - v[3] - v[4], v[7]


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_residual_carry")

    def run(new: bool):
        spark.catalog.clearCache()
        b0, s0 = _ticks()
        t0 = time.time()
        emb = _clean_emb(spark, SF_DIR)
        if new:
            df = S.ivf_pq_residual_topk(emb, F.col("vec_id") < 10, k=5,
                                        n_lists=16, n_probe=16, n_sub=4,
                                        codebook_k=4)
        else:
            df = old_residual_topk(emb, F.col("vec_id") < 10)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        b1, s1 = _ticks()
        return round(wall, 3), round(100.0 * (s1 - s0) / max(b1 - b0, 1), 1)

    run(True)  # warmup
    run(False)
    res = {"old_join": [], "new_carry": []}
    for i in range(rounds):
        for name, flag in (("old_join", False), ("new_carry", True)):
            w, st = run(flag)
            res[name].append((w, st))
            print(json.dumps({"round": i, "variant": name, "wall": w, "steal": st}), flush=True)
    print(json.dumps({k: {"min": min(w for w, _ in v), "all": v} for k, v in res.items()}))


if __name__ == "__main__":
    main()
