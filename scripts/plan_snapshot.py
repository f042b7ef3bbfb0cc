#!/usr/bin/env python
"""Per-query physical-plan snapshots — plan-drift detection across rounds.

The plan lint (`plans/lint.py`) checks invariants (no cartesian products,
no row-Python, broadcasts where asserted) but not DRIFT: a lost broadcast
or a new exchange that the lint rules don't name slips through silently,
visible only as a bench regression with no artifact to diff.  This script
records, for EVERY batch query in the registry (round 12 — previously
the 34-query bench headline set; the round-11 uniform-noise diagnosis
leaned on plan identity, which then covered 15% of the registry), the
normalized physical-plan operator skeleton and its hash into
``PLANS.json`` at the repo root.  Commit the file each round: `git diff PLANS.json` then shows
exactly which query's plan changed shape and how (the `ops` list), before
any timing number moves.

Streaming queries are skipped — invoking them executes the replay and the
returned memory-table scan carries no plan worth diffing.

Usage: python scripts/plan_snapshot.py [sf_dir]   (default sf0.1 testdata)
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipeline_steamreviews_spark import get_spark, queries  # noqa: E402
from bigdatapipeline_steamreviews_spark.plans.lint import plan_text  # noqa: E402

# Volatile tokens that differ run-to-run without the plan changing shape:
# expression ids, codegen/plan ids, staged-file paths, stats, object hashes.
_VOLATILE = [
    (re.compile(r"#\d+L?"), "#x"),
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    (re.compile(r"\[id=#?x?\d*\]"), "[id=x]"),
    (re.compile(r"file:[^\],\s]+"), "file:x"),
    (re.compile(r"@[0-9a-f]{6,}"), "@x"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(x)"),
    (re.compile(r"\d+ paths"), "N paths"),
    # Higher-order-function lambda variables are numbered by a SESSION-global
    # counter (lambda x_2 / lambda x_35 for the same plan), so any query
    # planned earlier in the process shifts them — normalize the ordinal.
    (re.compile(r"lambda ([A-Za-z]+)_\d+"), r"lambda \1_n"),
    # Streaming-born memory tables carry a per-session counter in the
    # table name (x3_incr_index_3) — same plan, different ordinal.
    (re.compile(r"x3_incr_index_\d+"), "x3_incr_index_n"),
]

def normalize(plan: str) -> str:
    for pat, repl in _VOLATILE:
        plan = pat.sub(repl, plan)
    return plan


def op_skeleton(plan: str) -> list[str]:
    """The tree's operator names, top-down, indentation preserved via
    depth prefixes — the human-diffable shape of the plan."""
    ops = []
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(")
        m = re.match(r"(\d+\) )?([A-Z][A-Za-z0-9]+)", stripped)
        if m and not stripped.startswith(("Output", "Input", "Arguments",
                                          "Functions", "Keys", "Results",
                                          "Condition", "Join", "Location",
                                          "ReadSchema", "PushedFilters",
                                          "Batched")):
            depth = (len(line) - len(line.lstrip(" :+-*"))) // 3
            ops.append("  " * depth + m.group(2))
    return ops


def snapshot_names() -> list[str]:
    """Every registry query the snapshot covers: all batch entries.
    ``stream_*`` fns execute a replay when invoked and return a
    memory-table scan with no plan worth diffing; everything else —
    including the staged/incremental ANN paths whose builds are one-time
    and fingerprint-cached — is gated."""
    return sorted(n for n in queries() if not n.startswith("stream_"))


def compute_snapshots(
    spark, sf_dir: str, names: list[str] | None = None
) -> dict[str, dict]:
    """{query: {hash, ops}} for every batch query in the registry (or
    the given subset).  Importable so ``tests/test_plans.py`` can
    re-derive the shapes and diff them against the committed PLANS.json
    (the drift GATE; this script is the re-bless step)."""
    # Untruncated scan metadata: the default 100-char cut moves with the
    # (session-global) lambda-variable ordinal width, so a truncated
    # DataFilters string is order-sensitive even after normalization.
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    regs = queries()
    out: dict[str, dict] = {}
    for name in names if names is not None else snapshot_names():
        df = regs[name](spark, sf_dir)
        norm = normalize(plan_text(df))
        out[name] = {
            "hash": hashlib.md5(norm.encode()).hexdigest()[:12],
            "ops": op_skeleton(norm),
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("plan-snapshot")
    out = compute_snapshots(spark, sf_dir)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "PLANS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {len(out)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
