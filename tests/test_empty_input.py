"""Empty-input robustness: at 100 TB an empty partition of the lake is
routine (a new source, a filtered branch, a day with no data), and every
query must return an empty/degenerate result — never crash.

A full 215-query empty sweep runs ~10 min, so this test pins the paths
that actually crashed in the round-6 audit (24/215) plus one
representative per operator family.  The crash roots fixed:

- ``stage_events_for_replay`` — ``approxQuantile`` on empty events
  returns no split points and the chunk loop indexed past the padded
  bounds (took down all 22 replay-staged stream_* queries);
- ``src_partitioned_pruned_scan`` — a partitioned write of 0 rows leaves
  no parquet footer to infer a schema from (UNABLE_TO_INFER_SCHEMA);
- ``train_ivf`` — MLlib ``KMeans.fit`` throws on an empty corpus;
- the stream-stream flush sentinel — ``int(max(ts))`` with NULL max.
"""

from __future__ import annotations

import os

import pytest

from bigdatapipeline_steamreviews_spark import queries
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_DIR

EMPTY_DIR = "/tmp/spark_graft_sf_empty_test"

# Formerly-crashing representatives + one per family.
PROBE = [
    # the four fixed crash roots
    "stream_daily_summary",          # replay staging (chunk padding)
    "stream_dedup_daily_summary",    # duped replay staging (parts[1])
    "stream_click_abandonment",      # flush sentinel int(NULL)
    "src_partitioned_pruned_scan",   # schema-less empty partition read
    "x3_cosine_topk_ivf",            # KMeans.fit on empty corpus
    # one per family
    "flagship_daily_summary",
    "q1_pricing_summary",
    "j1_region_enrichment",
    "w18_peak_concurrency",
    "t1_asof_latest_order",
    "a20_equidepth_histogram",
    "x1_span_dedup",
    "x2_minhash_lsh",
    "x3_pq_adc_topk",
    # the prebuilt/persisted-index path: these hand _validate_pq_index a
    # STAGED codebook, which on an empty corpus is an EMPTY codebook —
    # the guard must pass it through (empty index -> empty results), not
    # reject it (the round-11 empty-audit regression).
    "x3_pq_adc_trained",
    "x3_ivf_pq_persisted",
    "x3_ivf_pq_incremental",
    "x4_ccnet_buckets",
    "x5_shard_manifest",
    "serving_upsert_compaction",
    "sql_recursive_user_ewma",
    "dq_column_profile",
    # round-13 births: obs_ingest_metrics is the regression that PUT the
    # births here — Spark's Observation holds a schema-less empty Row
    # when the observed plan processed zero rows, and the .get conversion
    # asserts (caught by the empty-corpus audit, fixed with an arity
    # probe in queries_streaming.py).
    "obs_ingest_metrics",
    "a23_quantile_sketch",
    "a24_quantile_sketch_rollup",
    "a25_kmv_set_ops",
    "t5_scd2_history",
    "x4_dsir_sample",
    "x4_conjunctive_search",
    "t6_interval_overlap_join",
    "stream_pyds_serving_store",  # zero-trigger replay still commits schema
    # round-14 births
    "stream_quantile_sketch",  # no emissions -> empty pool -> zero rows
    "x3_cosine_topk_blas",  # empty query set -> typed empty frame branch
    "src_skipping_index",  # empty stats -> no probe key -> typed empty
    # round-15 births
    "x3_ivf_pq_residual",  # empty coarse seeds -> NULL assignment join
    "stream_curation_pipeline",  # zero-chunk replay + empty band index
    "x3_ivf_pq_residual_persisted",  # staged EMPTY 4-tuple through guard
    # round-16 births
    "x3_ivf_pq_rerank",  # empty shortlist -> empty rescore join
    "x3_ivf_pq_residual_recall",  # empty brute + empty approx -> 0 rows
    "stream_curation_semantic",  # empty assignment stage + anti-join
]


@pytest.fixture(scope="module")
def empty_dir(spark):
    if not os.path.exists(os.path.join(EMPTY_DIR, "_DONE")):
        for t in TABLE_NAMES:
            raw = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(0)
            raw.coalesce(1).write.mode("overwrite").parquet(
                f"{EMPTY_DIR}/{t}.parquet"
            )
        open(os.path.join(EMPTY_DIR, "_DONE"), "w").close()
    return EMPTY_DIR


@pytest.mark.parametrize("name", PROBE)
def test_query_survives_empty_tables(spark, empty_dir, name):
    df = queries()[name](spark, empty_dir)
    # Row count is what empty input allows to assert universally; most
    # queries return 0 rows, a few return degenerate summaries (e.g. a
    # profile row of zeros) — not-crashing with a well-formed schema is
    # the contract.
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    spark.catalog.clearCache()


# The round-7 empty-DIFFERENTIAL fixes (DIRTYDATA.md §1): queries whose
# oracle disagreed with Spark about empty-input semantics — NULL sums
# materializing as float64 NaN, and ANSI ROLLUP/CUBE's count-0
# grand-total row that Spark's grouping-set expansion never emits.
ORACLE_FIXED = [
    "dq_column_profile",
    "dq_constraint_checks",
    "g1_priority_rollup",
    "g4_status_priority_cube",
]


@pytest.mark.parametrize("name", ORACLE_FIXED)
def test_fixed_queries_match_oracle_on_empty_data(spark, empty_dir, name):
    import pathlib
    import sys

    import duckdb

    from bigdatapipeline_steamreviews_spark import REGISTRY

    sys.path.insert(
        0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts")
    )
    from verify_local import compare

    queries()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        # the fixture writes Spark parquet DIRECTORIES named {t}.parquet
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{empty_dir}/{t}.parquet/*.parquet'"
        )
    spec = REGISTRY[name]
    sdf = spec.fn(spark, empty_dir).toPandas()
    spark.catalog.clearCache()
    ddf = con.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert problems == [], problems
