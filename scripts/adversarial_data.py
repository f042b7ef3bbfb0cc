#!/usr/bin/env python
"""Generate adversarial variants of the testdata for robustness audits.

Two variants, both flat single-file parquet (the driver's layout):

* ``empty``: every table with 0 rows, schemas intact — the empty-lake-
  partition audit (all 215 queries must not crash; see
  tests/test_empty_input.py for the pinned regression subset).
* ``dirty``: ~10% NULLs injected into every non-key column (keys and
  join columns are left intact — those are schema contracts).  Run
  ``python scripts/verify_local.py <out_dir>`` against it for a
  DIFFERENTIAL audit: any Spark-vs-DuckDB mismatch is a NULL-semantics
  divergence between a query and its own oracle.  Findings and the
  contract decisions they led to are recorded in DIRTYDATA.md.

Usage:
    python scripts/adversarial_data.py empty [out_dir] [src_sf_dir]
    python scripts/adversarial_data.py dirty [out_dir] [src_sf_dir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES  # noqa: E402

# Keys and join columns stay non-null: they are the schema contract the
# engine documents (dedup/join operators key on them), and dirtying them
# audits a different, weaker claim.
KEEP = {
    "event_id", "user_id", "doc_id", "vec_id",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "c_custkey", "c_nationkey", "s_suppkey", "s_nationkey",
    "p_partkey", "n_nationkey", "n_regionkey", "r_regionkey",
    "ts", "embedding",
}

NULL_RATE = 0.10


def write_flat(df, dst: str, table: str) -> None:
    tmp = f"{dst}/_build_{table}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{dst}/{table}.parquet")
    shutil.rmtree(tmp)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "dirty"
    dst = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_sf_{mode}"
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    assert mode in ("empty", "dirty"), mode
    spark = get_spark(f"adversarial-{mode}")
    os.makedirs(dst, exist_ok=True)
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if mode == "empty":
            out = df.limit(0)
        else:
            cols = []
            for f_ in df.schema.fields:
                if f_.name in KEEP:
                    cols.append(F.col(f_.name))
                else:
                    cols.append(
                        F.when(
                            # crc32, NOT hash(): Python string hashing is
                            # salted per process, which would make the
                            # injected NULL mask — and any divergence it
                            # surfaces — unreproducible across runs.
                            F.rand(seed=zlib.crc32((t + f_.name).encode()) % 2**31)
                            < NULL_RATE,
                            F.lit(None),
                        )
                        .otherwise(F.col(f_.name))
                        .alias(f_.name)
                    )
            out = df.select(*cols)
        write_flat(out, dst, t)
        print(f"{t}: {mode}")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
