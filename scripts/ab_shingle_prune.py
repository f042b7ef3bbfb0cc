#!/usr/bin/env python
"""A-B: shingle_table hot-set prune — r7 anti-join vs pre-r7 semi-join
(r7 verdict What's-wrong #2).

Context the numbers need: BENCH_r07 showed x2_ngram_jaccard +52% and
x2_minhash_lsh +56% vs r6, and the shingle_table hot-set anti-join
(operators/dedup.py:80-89) was the only adjacent code change.  But the
prune branch DOES NOT EXECUTE in either query's plan:

* x2_ngram_jaccard joins from a staged shingle posting table built with
  ``max_doc_freq=None`` — the ``if max_doc_freq is not None`` branch is
  skipped entirely, and the timed plan reads parquet anyway;
* x2_minhash_lsh joins staged LSH band tables — no shingle prune in its
  lineage at all.

So the only place the r7 change can cost anything is the PRUNED shingle
build (x2_ngram_jaccard_pruned's ``max_doc_freq=5`` path).  This script
times that build-and-join end-to-end, cold, best-of-3, under both
strategies, plus the two regressed queries as-registered (staged reads)
for a same-host contention reference.  Results go to PERF.md.

Usage: python scripts/ab_shingle_prune.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark, queries  # noqa: E402
from bigdatapipeline_steamreviews_spark.functions import word_shingles  # noqa: E402
from bigdatapipeline_steamreviews_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from bigdatapipeline_steamreviews_spark.operators.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)
from bigdatapipeline_steamreviews_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def shingle_table_semi_pre_r7(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """The pre-r7 formulation: hard-broadcast the KEEP set, left-semi.
    (The r7 change replaced it because the keep set is Heaps-law
    unbounded at 100 TB; this copy exists only for the A-B.)"""
    s = ensure_min_parallelism(df, id_col).select(
        F.col(id_col).alias("sid"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("sh"),
    )
    if max_doc_freq is not None:
        counts = s.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        keep = counts.filter(F.col("df") <= max_doc_freq).select("sh")
        s = s.join(F.broadcast(keep), "sh", "left_semi")
    return s


def main() -> None:
    spark = get_spark("ab-shingle")
    regs = queries()
    docs = load_table(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())

    def timed(fn, runs: int = 3) -> list:
        out = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            out.append(round(time.time() - t0, 3))
        return out

    results = {}

    # The path the r7 change actually touches: pruned build + jaccard join,
    # no staged parquet (shingles derived in-plan, localCheckpoint'ed).
    results["pruned_build_anti_r7"] = timed(
        lambda: ngram_jaccard_pairs(docs, min_jaccard=0.5, max_doc_freq=5)
    )
    results["pruned_build_semi_pre_r7"] = timed(
        lambda: ngram_jaccard_pairs(
            docs,
            min_jaccard=0.5,
            shingles=shingle_table_semi_pre_r7(docs, max_doc_freq=5).localCheckpoint(),
        )
    )
    # Sanity: both strategies produce the identical pair set.
    a = ngram_jaccard_pairs(docs, min_jaccard=0.5, max_doc_freq=5)
    b = ngram_jaccard_pairs(
        docs,
        min_jaccard=0.5,
        shingles=shingle_table_semi_pre_r7(docs, max_doc_freq=5),
    )
    results["pair_sets_identical"] = (
        a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    )

    # The two regressed bench queries, as registered (staged reads) — a
    # same-host reference against BENCH_r06/r07 numbers.
    for name in ("x2_ngram_jaccard", "x2_minhash_lsh"):
        results[name + "_as_registered"] = timed(lambda n=name: regs[n](spark, SF_DIR))

    print(json.dumps({"sf_dir": SF_DIR, **results}, indent=1))


if __name__ == "__main__":
    main()
