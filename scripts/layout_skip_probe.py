#!/usr/bin/env python
"""Predicate-skipping layout probe (round-12 verdict ask #7): rewrite
``lineitem`` clustered on q1's filter column (``l_shipdate``) with
``sources.layout.write_zordered`` and MEASURE what the layout buys the
scan-bound query — row groups and bytes actually skippable via parquet
min/max statistics, plus Spark wall-clock on both layouts.

Why this matters at 100 TB: q1 is deliberately scan-bound (the r11 plan
audit's "scales with executors, not cleverness").  Layout is the one
lever left for a scan: a shipdate-clustered rewrite turns any selective
shipdate predicate into row-group pruning INSIDE the pushed filter —
the reader consults each group's min/max and never decompresses groups
wholly outside the bound.  The as-generated table interleaves dates
across every row group (each group's [min,max] spans the full range),
so statistics prune nothing no matter how selective the predicate.

Skippability is computed from the parquet FOOTERS (pyarrow metadata:
for ``l_shipdate <= B``, a group with ``min > B`` is skipped), which is
exactly the decision procedure Spark's vectorized reader runs, made
deterministic — wall-clock at sf0.1 is too noisy to carry the claim
alone but is reported alongside.

q1's own registered bound (2000-09-02) exceeds max(l_shipdate) and
keeps every row — correct for the oracle-gated query, useless for a
skipping demo — so the probe sweeps selective bounds over the same
column/shape.  The registry is untouched.

Usage: python scripts/layout_skip_probe.py [sf_dir]
Emits one JSON line per bound plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.sources.layout import (  # noqa: E402
    write_zordered,
)
from bigdatapipeline_steamreviews_spark.sources.tables import (  # noqa: E402
    load_table,
)


def rowgroup_skip_stats(path: str, col: str, bound) -> dict:
    """Parquet-footer pruning decision for ``col <= bound``: bytes and
    row groups skippable (group min > bound) vs total, across all part
    files (or the single file)."""
    import pyarrow.parquet as pq

    files = (
        [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        if os.path.isdir(path)
        else [path]
    )
    total_groups = skipped_groups = 0
    total_bytes = skipped_bytes = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(idx).statistics
            size = rg.total_byte_size
            total_groups += 1
            total_bytes += size
            if st is not None and st.has_min_max and st.min > bound:
                skipped_groups += 1
                skipped_bytes += size
    return {
        "groups": total_groups,
        "groups_skipped": skipped_groups,
        "bytes": total_bytes,
        "bytes_skipped": skipped_bytes,
        "bytes_skipped_pct": round(100.0 * skipped_bytes / total_bytes, 1)
        if total_bytes
        else None,
    }


def q1_shape(df, bound_ts):
    from bigdatapipeline_steamreviews_spark.functions import (
        avg_exact,
        sum_exact,
    )

    l = df.filter(F.col("l_shipdate") <= F.lit(bound_ts).cast("timestamp"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_exact("l_quantity").alias("sum_qty"),
        avg_exact("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("layout-skip-probe")
    base_path = f"{sf_dir}/lineitem.parquet"
    l = load_table(spark, sf_dir, "lineitem")

    lo, hi = l.agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).first()
    print(json.dumps({"shipdate_range": [str(lo), str(hi)]}))

    clustered = os.path.join(
        tempfile.gettempdir(), "spark_graft_layout_probe_lineitem"
    )
    write_zordered(l, clustered, ["l_shipdate"], bits=8, target_files=32)

    def timed(path, bound):
        df = spark.read.parquet(path)
        spark.catalog.clearCache()
        t0 = time.time()
        q1_shape(df, bound).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    span = hi - lo
    out = {}
    for frac in (0.1, 0.25, 0.5, 1.0):
        bound = lo + span * frac
        bound_s = str(bound)
        rec = {
            "bound": bound_s,
            "asgen": rowgroup_skip_stats(base_path, "l_shipdate", bound),
            "clustered": rowgroup_skip_stats(clustered, "l_shipdate", bound),
            "asgen_s": min(timed(base_path, bound_s), timed(base_path, bound_s)),
            "clustered_s": min(
                timed(clustered, bound_s), timed(clustered, bound_s)
            ),
        }
        # Same answer on both layouts (clustering is pure row order).
        a = {
            tuple(sorted(r.asDict().items()))
            for r in q1_shape(spark.read.parquet(base_path), bound_s).collect()
        }
        b = {
            tuple(sorted(r.asDict().items()))
            for r in q1_shape(spark.read.parquet(clustered), bound_s).collect()
        }
        rec["same_result"] = a == b
        out[f"frac_{frac}"] = rec
        print(json.dumps({f"frac_{frac}": rec}))
    print(json.dumps({"layout_skip_probe": out}))


if __name__ == "__main__":
    main()
