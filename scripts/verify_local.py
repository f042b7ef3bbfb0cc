#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Runs every registered query's Spark implementation AND its DuckDB oracle on
the same parquet tables, then compares: row count, sorted column names, and
order-insensitive exact values (columns sorted by name, rows sorted by all
columns).  Usage:

    python scripts/verify_local.py [sf_dir] [query ...]
    python scripts/verify_local.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a machine-readable per-query result file
(driver-artifact-shaped), so a full local sweep can be COMMITTED as
evidence — the registry outgrew the driver's bounded per-round window, and
a committed artifact beats prose for the queries outside it.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from bigdatapipeline_steamreviews_spark import REGISTRY, get_spark, queries  # noqa: E402

queries()  # populate REGISTRY (lazy module loading)
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # Probe-scale oracles (the x30 corpora) can materialize exploded
    # intermediates far past RAM — span windows at sf3-equivalent OOM-
    # killed the whole sweep (124 GB RSS, round 12).  A bounded oracle
    # SPILLS instead: opt in via e.g. SPARK_GRAFT_DUCKDB_MEMLIMIT=48GB.
    memlimit = os.environ.get("SPARK_GRAFT_DUCKDB_MEMLIMIT")
    if memlimit:
        import tempfile

        con.execute(f"SET memory_limit='{memlimit}'")
        con.execute(
            "SET temp_directory="
            f"'{os.path.join(tempfile.gettempdir(), 'duck_spill')}'"
        )
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        # The driver's testdata tables are single parquet FILES; Spark-
        # written corpora (the x10/x30 scale-probe replicas) are
        # DIRECTORIES of part files — glob those so the same oracle gate
        # runs at probe scale (round-12: hash-gating the 30x outputs).
        # Recursive ** so partitionBy layouts (part files nested under
        # key=value subdirs) are read too, not silently matched as zero
        # files (round-13 ADVICE fix); ** also matches zero directories,
        # so flat part-file dirs still resolve.
        src = f"{p}/**/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
        if df[c].dtype == object and len(df):
            import numpy as np

            if isinstance(df[c].iloc[0], (list, tuple, np.ndarray)):
                df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _canon_cell(v) -> str:
    """Canonical, engine- and dtype-agnostic cell repr for value_hash.

    Floats go through ``repr(float(v))`` — the shortest round-trip repr,
    so the hash is BITWISE on doubles (two corpora that differ only in
    float summation order hash differently, which is the point: the
    engine claims DECIMAL-exact accumulation makes its doubles
    order-independent, and this hash is how that claim is audited
    corpus-to-corpus)."""
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, (np.floating, float)) and v != v:
        # Distinct from the NULL token: NaN-vs-NULL drift (e.g. a pandas
        # seam promoting a missing value to float NaN) must be hash-
        # visible — operators/inference.py relies on exactly this.
        return "NaN"
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive digest of a result set: columns sorted by name,
    rows sorted by value (the ``normalize`` canonicalization), every cell
    rendered via ``_canon_cell``.  Equal logical results hash equal
    regardless of the partitioning, scan order, or engine that produced
    them; recorded per-query in the ``--json`` artifact so two sweeps
    over logically-identical corpora (e.g. clean vs row-shuffled) can be
    diffed without rerunning anything."""
    import hashlib

    a = normalize(df.copy())
    h = hashlib.sha256()
    h.update(("|".join(a.columns) + "\n").encode())
    for row in a.itertuples(index=False, name=None):
        h.update(("\x1f".join(_canon_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()[:16]


def _num_family(series: pd.Series) -> str:
    """Coarse numeric dtype family, for catching int-vs-float drift.

    The driver's value hash is representation-sensitive: a DuckDB HUGEINT
    (int128) materializes through ``fetchdf()`` as float64, so ``170.0``
    hashes differently from Spark's ``170`` even though every value is
    equal.  r5 shipped three such oracles green locally and red at the
    driver because this comparator coerced both sides to float64 first.
    Only the int/float axis is checked — decimal/object/datetime columns
    keep the permissive value compare, which has matched driver behavior
    for five rounds.
    """
    dt = series.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "other"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if dt == object:
        import numpy as np

        v = series.dropna()
        if len(v):
            x = v.iloc[0]
            if isinstance(x, (bool, np.bool_)):
                return "other"
            if isinstance(x, (int, np.integer)):
                return "int"
            if isinstance(x, (float, np.floating)):
                return "float"
    return "other"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = normalize(spark_df.copy()), normalize(duck_df.copy())
    if len(a) and len(b):
        for c in a.columns:
            fa, fb = _num_family(a[c]), _num_family(b[c])
            if {fa, fb} == {"int", "float"}:
                problems.append(
                    f"col {c}: dtype-family drift spark={a[c].dtype}({fa}) "
                    f"duck={b[c].dtype}({fb}) — driver hash is representation-"
                    "sensitive; cast the oracle (usually HUGEINT -> BIGINT)"
                )
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.astype("float64") == bv.astype("float64")) | (av.isna() & bv.isna())
            except (ValueError, TypeError):
                eq = (av.astype(str) == bv.astype(str))
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"col {c}: {int((~eq).sum())}/{len(a)} mismatched, e.g. row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    unknown = only - set(REGISTRY)
    if unknown:
        # A typo'd (or misplaced-flag) name must be an error, not a
        # silently-empty "N/N verified" — --json must precede sf_dir.
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    spark = get_spark("verify-local")
    from bigdatapipeline_steamreviews_spark.sources.staging import prune_all_stages

    removed = prune_all_stages()  # evict stages of dead corpus fingerprints
    if removed:
        print(f"stage GC: evicted {len(removed)} stale stage dirs")
    con = duck_connect(sf_dir)
    failed = []
    results: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            # Queries may persist() small multi-consumer intermediates;
            # drop them so every query runs cold and the sweep's memory
            # footprint stays flat across 200+ queries.
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failed.append(name)
            results[name] = {"match": False, "err": f"spark {type(e).__name__}: {e}"[:300]}
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {
                "match": None,
                "spark_rows": len(sdf),
                "value_hash": value_hash(sdf),
                "err": None,
            }
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            failed.append(name)
            results[name] = {"match": False, "err": f"duckdb {type(e).__name__}: {e}"[:300]}
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
            results[name] = {"match": False, "err": "; ".join(problems)[:300]}
        else:
            print(f"ok    {name}: {len(sdf)} rows match [{time.time()-t0:.1f}s]")
            results[name] = {
                "match": True,
                "spark_rows": len(sdf),
                "oracle_rows": len(ddf),
                "value_hash": value_hash(sdf),
                "sec": round(time.time() - t0, 2),
                "err": None,
            }
    total = len(only) if only else len(REGISTRY)
    print(f"\n{total - len(failed)}/{total} queries verified" + (f"; FAILED: {failed}" if failed else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_out}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
