#!/usr/bin/env python
"""Generate adversarial variants of the testdata for robustness audits.

Three variants, all flat single-file parquet (the driver's layout):

* ``empty``: every table with 0 rows, schemas intact — the empty-lake-
  partition audit (all 215 queries must not crash; see
  tests/test_empty_input.py for the pinned regression subset).
* ``dirty``: ~10% NULLs injected into every non-key column (keys and
  join columns are left intact — those are schema contracts).  Run
  ``python scripts/verify_local.py <out_dir>`` against it for a
  DIFFERENTIAL audit: any Spark-vs-DuckDB mismatch is a NULL-semantics
  divergence between a query and its own oracle.  Findings and the
  contract decisions they led to are recorded in DIRTYDATA.md.
* ``skew``: zipf-like hot keys — ~50% of ``events.user_id`` and
  ``orders.o_custkey`` rows collapse onto ONE existing customer key, and
  ~50% of ``documents.source`` onto one source label.  This is the real
  Steam-data shape (one blockbuster app, a few whale users) and the
  100 TB failure mode of shuffled joins / per-key state / per-key top-k:
  a straggler reducer, not a wrong answer.  The differential sweep
  proves correctness is skew-independent; ``tests/test_skewed_input.py``
  pins a regression subset, and DIRTYDATA.md §3 records the
  salted-vs-naive join timing at this skew.
* ``unicode``: multibyte text injection — in ~50% of documents (and
  customer names), every 5th word (by content hash) gains a suffix from
  a palette spanning the interesting encodings: 2-byte Latin (``é``,
  ``ß``), 3-byte CJK (``中``), and a 4-byte astral-plane emoji
  (``🎮`` — a SURROGATE PAIR in UTF-16, where Java-regex Spark and
  RE2 DuckDB can legitimately disagree).  The driver's synthetic corpus
  is pure ASCII, so without this corpus every text operator's
  multibyte behavior (length vs octet_length, regex char classes,
  per-codepoint vs per-code-unit counting) is unverified.  Findings in
  DIRTYDATA.md §4.

All injection masks are derived from ROW CONTENT (xxhash64 of the
table's contract-key columns + the target column name), never from
``F.rand(seed)``: rand(seed) is only deterministic for a fixed
partitioning of the source scan, so a different core count or
``maxPartitionBytes`` would silently change which rows are dirtied and
make any divergence the audit surfaces unreproducible across machines.

Usage:
    python scripts/adversarial_data.py empty   [out_dir] [src_sf_dir]
    python scripts/adversarial_data.py dirty   [out_dir] [src_sf_dir]
    python scripts/adversarial_data.py skew    [out_dir] [src_sf_dir]
    python scripts/adversarial_data.py unicode [out_dir] [src_sf_dir]
    python scripts/adversarial_data.py shuffled [out_dir] [src_sf_dir]

``shuffled`` is the scan-order-determinism corpus: the SAME rows in a
content-hash-permuted physical order (see ``_shuffle``).  Its audit is a
hash DIFF against the clean-corpus sweep, not just an oracle sweep.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

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

# Corpus-format version, folded into every default output dir and the test
# fixture dirs (tests/test_{dirty,skewed}_input.py).  The fixtures key
# "already built" on a _DONE marker alone, so a change to the mask
# derivation or the skew column set would otherwise silently keep testing a
# stale corpus built by the old code (r7 advice).  Bump on ANY change to
# what the generators write.
#   v2: xxhash64 content-derived masks (was rand(seed)); skew extended to
#       lineitem.l_partkey (agg-side hot reducer).
CORPUS_VERSION = "v2"

NULL_RATE = 0.10  # spelled as pmod(hash, 10) == 0 below — keep in sync

# skew mode: (table, column) pairs that collapse onto a single hot value
# for ~half the rows.  events.user_id / orders.o_custkey stress shuffled
# joins and per-key state; documents.source stresses per-source rollups.
SKEW_RATE_MOD = 2  # pmod(hash, 2) == 0  ->  ~50% of rows go hot


def _content_mask(df, table: str, col_name: str, modulus: int):
    """Partitioning-independent boolean mask: true for ~1/modulus of rows,
    derived from the row's contract-key columns (always intact in every
    variant) + the target column name, so each column gets an independent
    but machine-reproducible mask."""
    keys = [F.col(c) for c in df.columns if c in KEEP and c != "embedding"]
    h = F.xxhash64(F.lit(f"{table}:{col_name}"), *keys)
    return F.pmod(h, F.lit(modulus)) == 0


def write_flat(df, dst: str, table: str) -> None:
    tmp = f"{dst}/_build_{table}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{dst}/{table}.parquet")
    shutil.rmtree(tmp)


def _dirty(df, t):
    cols = []
    for f_ in df.schema.fields:
        if f_.name in KEEP:
            cols.append(F.col(f_.name))
        else:
            cols.append(
                F.when(_content_mask(df, t, f_.name, int(1 / NULL_RATE)), None)
                .otherwise(F.col(f_.name))
                .alias(f_.name)
            )
    return df.select(*cols)


def _skew(spark, df, t, src):
    """Collapse ~50% of the skew column's rows onto one hot key.  The hot
    key is an EXISTING value (min customer key / first source label), so
    referential joins still match — the stress is volume, not nulls."""
    if t in ("events", "orders"):
        col = "user_id" if t == "events" else "o_custkey"
        hot = (
            spark.read.parquet(f"{src}/customer.parquet")
            .agg(F.min("c_custkey"))
            .collect()[0][0]
        )
    elif t == "documents":
        col = "source"
        hot = (
            spark.read.parquet(f"{src}/documents.parquet")
            .agg(F.min("source"))
            .collect()[0][0]
        )
    elif t == "lineitem":
        # agg-side skew: one blockbuster part in half the order lines —
        # stresses groupBy-hot-reducer shapes (dq_key_skew_report's own
        # subject, m1 basket pairs, per-part rollups) rather than joins.
        col = "l_partkey"
        hot = (
            spark.read.parquet(f"{src}/part.parquet")
            .agg(F.min("p_partkey"))
            .collect()[0][0]
        )
    else:
        return df
    return df.withColumn(
        col,
        F.when(
            _content_mask(df, t, f"skew:{col}", SKEW_RATE_MOD), F.lit(hot)
        ).otherwise(F.col(col)),
    )


def _shuffle(df, t):
    """Deterministic pseudo-random ROW-ORDER permutation: sort by
    xxhash64(table-salt, contract keys), keys as collision tiebreak.  The
    logical multiset of rows is BITWISE identical to the source — only
    the physical order in the file changes.

    Why this corpus exists: on a 1000-executor cluster the scan order of
    a 100 TB table is arbitrary (file listing order, split assignment,
    speculative re-execution), but every local test sees ONE fixed order,
    so any query whose result depends on encounter order — an untied
    LIMIT/row_number, a first()/collect_list without sort, float
    summation outside the DECIMAL-exact recipe, an order-seeded k-means
    init — passes locally and flaps in production.  The differential
    audit runs the full sweep on this corpus and diffs per-query
    ``value_hash`` against the clean-corpus sweep: any hash drift is an
    order-dependence bug by construction (same rows, same engines, only
    the order moved)."""
    keys = [F.col(c) for c in df.columns if c in KEEP and c != "embedding"]
    return df.orderBy(F.xxhash64(F.lit(f"shuffle:{t}"), *keys), *keys)


# unicode mode: suffixes drawn per-WORD by content hash so the same word
# is decorated identically everywhere (dedup/shingle structure preserved
# within the corpus), covering 2-, 3-, and 4-byte UTF-8.
UNI_PALETTE = ("é", "ß", "中", "\U0001f3ae")  # é ß 中 🎮


def _unicodify(df, t):
    col = {"documents": "text", "customer": "c_name"}.get(t)
    if col is None:
        return df

    def decorate(w):
        h = F.crc32(F.encode(w, "utf-8"))
        suffix = F.element_at(
            F.array(*[F.lit(c) for c in UNI_PALETTE]),
            (F.pmod(h, F.lit(len(UNI_PALETTE))) + 1).cast("int"),
        )
        return F.when(
            F.pmod(h, F.lit(5)) == 0, F.concat(w, suffix)
        ).otherwise(w)

    decorated = F.array_join(
        F.transform(F.split(F.col(col), " "), decorate), " "
    )
    return df.withColumn(
        col,
        F.when(_content_mask(df, t, f"uni:{col}", 2), decorated).otherwise(
            F.col(col)
        ),
    )


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "dirty"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_sf_{mode}_{CORPUS_VERSION}"
    )
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    assert mode in ("empty", "dirty", "skew", "unicode", "shuffled"), mode
    spark = get_spark(f"adversarial-{mode}")
    os.makedirs(dst, exist_ok=True)
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if mode == "empty":
            out = df.limit(0)
        elif mode == "dirty":
            out = _dirty(df, t)
        elif mode == "unicode":
            out = _unicodify(df, t)
        elif mode == "shuffled":
            out = _shuffle(df, t)
        else:
            out = _skew(spark, df, t, src)
        write_flat(out, dst, t)
        print(f"{t}: {mode}")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
