"""Scan-order-determinism regression (round-9 audit, DIRTYDATA.md §7).

On a 1000-executor cluster the encounter order of a 100 TB scan is
arbitrary — file listing order, split assignment, and speculative
re-execution all permute it — but every local test sees ONE fixed
order, so order-dependence is the class of bug that passes local[32]
and flaps in production.  The ``shuffled`` adversarial corpus
(scripts/adversarial_data.py::_shuffle) is the SAME rows in a
content-hash-permuted physical order; a query whose result survives the
permutation bit-for-bit cannot be depending on encounter order.

This module pins the queries with the sharpest exposure (the full-sweep
hash diff against the clean corpus is run per-round via
scripts/verify_local.py artifacts and recorded in DIRTYDATA.md §7):

* ``flagship_daily_summary`` — the DECIMAL-exact float claim: plain
  float64 summation is NOT reassociation-safe, so a bitwise-stable
  ``A_value`` under reordering proves the exact-accumulate recipe.
* ``q3_top_revenue_orders`` / ``serving_topn_users`` — top-N: an
  untied LIMIT would keep whichever tied row the scan met first.
* ``p15_deterministic_sample`` / ``p16_stratified_sample`` /
  ``p18_reservoir_per_key`` — sampling: the operators advertise
  content-derived (not positional) row selection.
* ``x3_kmeans_lloyd`` — iterative init: seeded on ``vid < k``, not
  "first k rows encountered"; an order-seeded init would change every
  downstream centroid.
* ``x3_cosine_topk`` — top-k with float scores: tie + summation-order
  exposure in one.
* ``a20_equidepth_histogram`` — rank/quantile boundaries over ties.
* ``x2_minhash_lsh`` — signature fold: min() is order-free, but band
  hashing composes many steps worth pinning.
"""

from __future__ import annotations

import os
import pathlib
import sys

import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from adversarial_data import CORPUS_VERSION, _shuffle, write_flat  # noqa: E402
from verify_local import value_hash  # noqa: E402

SHUF_DIR = f"/tmp/spark_graft_sf_shuffled_test_{CORPUS_VERSION}"

PINNED = [
    "flagship_daily_summary",
    "q3_top_revenue_orders",
    "serving_topn_users",
    "p15_deterministic_sample",
    "p16_stratified_sample",
    "p18_reservoir_per_key",
    "x3_kmeans_lloyd",
    "x3_cosine_topk",
    "a20_equidepth_histogram",
    "x2_minhash_lsh",
]


@pytest.fixture(scope="module")
def shuf_dir(spark):
    if not os.path.exists(os.path.join(SHUF_DIR, "_DONE")):
        for t in TABLE_NAMES:
            df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            write_flat(_shuffle(df, t), SHUF_DIR, t)
        open(os.path.join(SHUF_DIR, "_DONE"), "w").close()
    return SHUF_DIR


def test_corpus_is_a_true_permutation(spark, shuf_dir):
    """Guard the fixture both ways: same multiset of rows (else the audit
    tests the wrong thing) AND a genuinely different physical order (else
    it is vacuous)."""
    import pandas as pd

    clean = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    shuf = spark.read.parquet(f"{shuf_dir}/events.parquet").toPandas()
    assert not clean["event_id"].head(50).equals(shuf["event_id"].head(50))
    a = clean.sort_values("event_id", ignore_index=True)
    b = shuf.sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("name", PINNED)
def test_result_is_scan_order_invariant(spark, shuf_dir, name):
    spec = REGISTRY[name]
    clean = spec.fn(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    shuf = spec.fn(spark, shuf_dir).toPandas()
    spark.catalog.clearCache()
    assert len(clean) == len(shuf), (len(clean), len(shuf))
    assert value_hash(clean) == value_hash(shuf), (
        f"{name}: result depends on row encounter order — same rows in a "
        "permuted file order changed the value hash"
    )
