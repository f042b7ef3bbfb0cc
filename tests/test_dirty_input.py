"""NULL-injection regression: the queries whose NULL semantics were fixed
in the round-6 differential audit (DIRTYDATA.md) must keep matching their
own DuckDB oracles on dirty data — not just on the clean testdata where
the NULL paths never execute.

Pinned contracts:
- constraint rules count NULL as NOT satisfying a range/domain predicate;
- the table checksum serializes NULL fields via an out-of-alphabet
  sentinel (no concat_ws skipping, no || row-nulling);
- the multimodal codec seam quarantines NULL payload/mime rows.
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb
import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY, queries
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from adversarial_data import CORPUS_VERSION  # noqa: E402
from verify_local import compare  # noqa: E402

# Version-suffixed (r7 advice): the fixture keys "already built" on the
# _DONE marker alone, so a mask-derivation change must land in a FRESH dir
# rather than silently re-testing the corpus the old code wrote.
DIRTY_DIR = f"/tmp/spark_graft_sf_dirty_test_{CORPUS_VERSION}"

FIXED = [
    "dq_constraint_checks",
    "dq_table_checksum",
    "stream_table_checksum",
    "x5_feature_extract",
    "x5_resize",
    "x5_frame_sample",
    # r8 audit-born monitors: the dirty corpus is the case they exist for
    # (10% NULL injection -> non-zero drift ppm / quarantined blobs).
    "dq_null_rate_drift",
    "dq_blob_reconciliation",
]


@pytest.fixture(scope="module")
def dirty_dir(spark):
    if not os.path.exists(os.path.join(DIRTY_DIR, "_DONE")):
        from adversarial_data import _dirty, write_flat

        for t in TABLE_NAMES:
            df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            write_flat(_dirty(df, t), DIRTY_DIR, t)
        open(os.path.join(DIRTY_DIR, "_DONE"), "w").close()
    return DIRTY_DIR


@pytest.fixture(scope="module")
def duck(dirty_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", FIXED)
def test_fixed_queries_match_oracle_on_dirty_data(spark, dirty_dir, duck, name):
    queries()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, dirty_dir).toPandas()
    spark.catalog.clearCache()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert problems == [], problems


def test_injection_mask_is_partitioning_independent(spark):
    """The r6 advice finding, pinned: the NULL/skew masks must be derived
    from row content, not F.rand(seed) — rand(seed) is only deterministic
    for a FIXED partitioning of the source scan, so a different core
    count or maxPartitionBytes would silently dirty different rows and
    make any divergence the audits surface unreproducible."""
    import pandas as pd

    from adversarial_data import _dirty, _skew

    df1 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df8 = df1.repartition(8)
    df3 = df1.repartition(3, "o_orderpriority")

    def frame(df, fn, *a):
        out = fn(df, *a) if fn is _dirty else fn(spark, df, *a)
        return (
            out.toPandas().sort_values("o_orderkey").reset_index(drop=True)
        )

    base = frame(df1, _dirty, "orders")
    pd.testing.assert_frame_equal(base, frame(df8, _dirty, "orders"))
    pd.testing.assert_frame_equal(base, frame(df3, _dirty, "orders"))
    # and some rows actually got dirtied (the mask isn't vacuous)
    assert base["o_totalprice"].isna().any()

    sbase = frame(df1, _skew, "orders", SF_DIR)
    pd.testing.assert_frame_equal(sbase, frame(df8, _skew, "orders", SF_DIR))
    hot_share = (sbase["o_custkey"] == sbase["o_custkey"].mode()[0]).mean()
    assert hot_share > 0.4
