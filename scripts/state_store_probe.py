#!/usr/bin/env python
"""State-store / trigger-granularity probe for the two stateful
sessionizers (r10 verdict ask #6): they are ~26% of the 36-query bench
total, nearly all per-trigger state-store fixed cost.  This measures,
COLD (clearCache + fresh checkpoint per run, best-of-3), the grid

    provider x max_files_per_trigger
      provider: HDFSBackedStateStoreProvider (default) vs RocksDB vs
                RocksDB + changelog checkpointing (round 13 — commit
                cost proportional to per-batch state CHANGES, the
                restartability knob for large-state sessionizers)
      mfpt: 1 / 2 / 4 (the stage has 4 chunks -> 4 / 2 / 1 triggers)

for `stream_sessionization` and `stream_sessionization_disordered`,
rebuilt here with the knobs exposed but otherwise byte-for-byte the
registered pipelines (same stage, same gap/watermark, same 16 state
partitions).  Every variant's output is hashed and compared to the
registered variant's output — a faster variant that changes the answer
is disqualified, not adopted.

Adoption constraints (the probe reports these rather than hiding them):
  - `_disordered` exists to audit CROSS-BATCH disorder: its displaced
    chunk must land in a LATER trigger than its origin, so mfpt=4 (one
    trigger) erases the property the query audits — measured for the
    curve, marked non-adoptable.
  - plain `stream_sessionization` uses the O(1)-state sessionizer whose
    contract is per-key event-time order ACROSS micro-batches; the
    time-ordered replay chunks satisfy it at any mfpt, so all its cells
    are adoptable if hash-identical.

Usage: python scripts/state_store_probe.py [--json out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipeline_steamreviews_spark import get_spark  # noqa: E402
from bigdatapipeline_steamreviews_spark.queries_streaming import (  # noqa: E402
    _stage_events_chunks,
    _stage_events_chunks_displaced,
    events_file_stream,
)
from bigdatapipeline_steamreviews_spark.streaming.sessions import (  # noqa: E402
    streaming_sessionize,
    streaming_sessionize_disordered,
)
from bigdatapipeline_steamreviews_spark.streaming.summarizer import (  # noqa: E402
    run_to_memory_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BEST_OF = 3
_counter = 0


def _run(spark, which: str, mfpt: int, provider: str):
    global _counter
    _counter += 1
    if which == "plain":
        stage = _stage_events_chunks(spark, SF_DIR)
        stream = events_file_stream(spark, stage, max_files_per_trigger=mfpt)
        result = streaming_sessionize(
            stream, gap_seconds=1800, watermark="30 minutes"
        )
    else:
        stage, wm_days = _stage_events_chunks_displaced(spark, SF_DIR)
        stream = events_file_stream(spark, stage, max_files_per_trigger=mfpt)
        result = streaming_sessionize_disordered(
            stream, gap_seconds=1800, watermark=f"{wm_days} days"
        )
    checkpoint = tempfile.mkdtemp(prefix="spark_graft_ckpt_probe_")
    return run_to_memory_table(
        result,
        f"probe_{which}_{_counter}",
        checkpoint,
        "append",
        shuffle_partitions=16,
        rocksdb_state=provider != "hdfs",
        changelog_checkpoint=provider == "rocksdb_changelog",
    )


def _hash(df) -> str:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark()
    grid = [
        (which, mfpt, provider)
        for which in ("plain", "disordered")
        for provider in ("hdfs", "rocksdb", "rocksdb_changelog")
        for mfpt in (1, 2, 4)
    ]
    results: dict[str, dict] = {}
    baselines: dict[str, str] = {}
    # Registered configs first so every variant hashes against them.
    for which, reg_mfpt in (("plain", 2), ("disordered", 2)):
        spark.catalog.clearCache()
        baselines[which] = _hash(_run(spark, which, reg_mfpt, "hdfs"))
    for which, mfpt, provider in grid:
        times = []
        h = None
        for _ in range(BEST_OF):
            spark.catalog.clearCache()
            t0 = time.time()
            df = _run(spark, which, mfpt, provider)
            h = _hash(df)
            times.append(round(time.time() - t0, 2))
        key = f"{which}/mfpt={mfpt}/{provider}"
        results[key] = {
            "best_s": min(times),
            "samples": times,
            "hash_matches_registered": h == baselines[which],
            "adoptable": not (which == "disordered" and mfpt >= 4),
        }
        print(json.dumps({key: results[key]}), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
