#!/usr/bin/env python
"""Capture `.explain("formatted")` output for bench queries to files.

Usage:
    python scripts/capture_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each requested query (default: every
batch query in bench.BENCH_QUERIES).  Streaming queries (stream_*) are
skipped unless named explicitly: their query functions RUN the replay to a
memory sink and return the drained table, so `explain` on the returned frame
shows a memory-scan, not the streaming plan — for those the evidence lives
in the StreamingQueryProgress numbers quoted in OPTIMIZATION notes.  When a
stream_* query IS named explicitly, the memory-scan plan is captured as-is
with a header note (it still pins the post-drain projection shape).

Building a batch DataFrame is plan-only (no action), so this is cheap; the
staged-index queries may still pay a one-time stage build if the stage is
cold.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, SF_DIR  # noqa: E402
from bigdatapipeline_steamreviews_spark import get_spark, queries  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or [q for q in BENCH_QUERIES if not q.startswith("stream_")]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    regs = queries()
    for name in names:
        spark.catalog.clearCache()
        try:
            df = regs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record per-query, keep going
            text = f"ERROR building plan: {type(e).__name__}: {e}\n"
        header = ""
        if name.startswith("stream_"):
            header = (
                "# NOTE: streaming query — the function runs the replay to a\n"
                "# memory sink; this is the post-drain read-back plan, not the\n"
                "# micro-batch plan (see OPTIMIZATION notes for stream timing).\n"
            )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header + text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
