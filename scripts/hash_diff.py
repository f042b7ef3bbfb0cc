#!/usr/bin/env python
"""Diff two ``verify_local.py --json`` artifacts by per-query value_hash.

Usage:
    python scripts/hash_diff.py CLEAN.json OTHER.json

The two sweeps must be over corpora that are LOGICALLY identical (same
multiset of rows — e.g. clean vs the ``shuffled`` adversarial corpus);
then any hash drift is, by construction, a dependence on something other
than the data: row encounter order, partitioning, file layout.  Exit 1
if any query drifts, so the audit can gate.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))["results"]
    b = json.load(open(b_path))["results"]
    common = sorted(set(a) & set(b))
    missing = sorted(set(a) ^ set(b))
    drifted, unhashed = [], []
    for name in common:
        ha, hb = a[name].get("value_hash"), b[name].get("value_hash")
        if ha is None or hb is None:
            unhashed.append(name)
        elif ha != hb:
            drifted.append(name)
            print(
                f"DRIFT {name}: {ha} ({a[name].get('spark_rows')} rows) != "
                f"{hb} ({b[name].get('spark_rows')} rows)"
            )
    print(
        f"\n{len(common) - len(drifted) - len(unhashed)}/{len(common)} "
        f"queries hash-identical across corpora"
        + (f"; DRIFTED: {drifted}" if drifted else "")
        + (f"; no hash recorded (pre-hash artifact or error row): {unhashed}" if unhashed else "")
        + (f"; only in one artifact: {missing}" if missing else "")
    )
    return 1 if drifted else 0


if __name__ == "__main__":
    raise SystemExit(main())
