"""Execution-decomposition invariance (round-9 audit, DIRTYDATA.md §8).

The shuffled corpus (test_shuffled_input.py) proves results don't depend
on row ENCOUNTER ORDER; this module proves they don't depend on the
PARALLEL DECOMPOSITION either — how many shuffle partitions the plan
used, how the scan was split into tasks, and where Arrow drew its batch
boundaries on the Python seams.  On a real cluster every one of these
differs run-to-run (AQE coalescing from observed sizes, executor count,
dynamic allocation), so any dependence is a flaps-in-production bug:

* ``spark.sql.shuffle.partitions`` 32 -> 7: different partial-aggregate
  trees (float summation outside the DECIMAL-exact recipe would drift),
  different hash-join task boundaries.
* ``spark.sql.files.maxPartitionBytes`` -> 64 KiB (+ zero open cost):
  the single-file sf0.001 scans split into many input tasks instead of
  one — per-partition state that silently assumed "whole table in one
  task" breaks here.
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` -> 64: mapInPandas /
  pandas-UDF seams (model inference, multimodal codec) see many small
  batches instead of one — an operator that aggregates within a batch
  instead of within a group changes its answer.

The full-sweep variant (all 224 queries under the perturbed confs,
hash-diffed against the clean sweep via scripts/hash_diff.py) is run
per-round; this pins the sharpest exposures on every pytest run.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from verify_local import value_hash  # noqa: E402

PERTURBED = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
}

PINNED = [
    # partial-aggregation tree + DECIMAL-exact floats
    "flagship_daily_summary",
    "q1_pricing_summary",
    # Python seams: Arrow batch boundaries move under maxRecordsPerBatch
    "x4_model_scores",
    "x5_feature_extract",
    # multi-step shuffle pipelines (bands, quantiles, windows)
    "x2_minhash_lsh",
    "a20_equidepth_histogram",
    "w18_peak_concurrency",
    # iterative + composed
    "x3_kmeans_lloyd",
    "x4_model_curated_corpus",
]


@pytest.mark.parametrize("name", PINNED)
def test_result_is_decomposition_invariant(spark, name):
    spec = REGISTRY[name]
    saved = {k: spark.conf.get(k, None) for k in PERTURBED}
    base = spec.fn(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    try:
        for k, v in PERTURBED.items():
            spark.conf.set(k, v)
        pert = spec.fn(spark, SF_DIR).toPandas()
        spark.catalog.clearCache()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert len(base) == len(pert), (len(base), len(pert))
    assert value_hash(base) == value_hash(pert), (
        f"{name}: result depends on the parallel decomposition — same "
        "data, same plan, different partitioning/batching changed the "
        "value hash"
    )


def test_perturbation_actually_changes_decomposition(spark):
    """Guard: under the perturbed confs a documents scan really does
    split into multiple input partitions and a shuffle really does use 7
    partitions — otherwise the module is vacuous."""
    saved = {k: spark.conf.get(k, None) for k in PERTURBED}
    try:
        for k, v in PERTURBED.items():
            spark.conf.set(k, v)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert docs.rdd.getNumPartitions() > 1
        shuffled = docs.groupBy("source").count()
        assert "7" == spark.conf.get("spark.sql.shuffle.partitions")
        assert shuffled.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# Evaluation-path invariance (round-11, DIRTYDATA.md §8c): the same plans
# with whole-stage codegen DISABLED (interpreted Catalyst expression
# evaluation, including the interpreted Projection/Predicate fallbacks) and
# the vectorized parquet/ORC readers DISABLED (row-at-a-time scan decode).
# Production clusters land on these paths without asking — codegen falls
# back when generated code exceeds the JIT's 8KB/64KB method limits or the
# constant pool overflows (classic on very wide aggregates), and the
# vectorized reader bails on schema evolution corner cases — so a result
# that differs interpreted-vs-compiled is a heisenbug that appears only on
# wide plans in production.  Float arithmetic ORDER is the usual suspect;
# the DECIMAL-exact recipe must make it moot.
EVALPATH = {
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    "spark.sql.parquet.enableVectorizedReader": "false",
    "spark.sql.orc.enableVectorizedReader": "false",
}

EVALPATH_PINNED = [
    # DECIMAL-exact accumulator tree through the interpreted agg path
    "q1_pricing_summary",
    # higher-order array lambdas (zip_with / aggregate folds) interpreted
    "x3_pq_adc_topk",
    # xxhash64 + scan-heavy dedup through the row-based parquet reader
    "x1_exact_dedup",
    # two-level window/sort pipeline
    "w18_peak_concurrency",
    # string/regex-heavy
    "x4_fingerprint",
    # Spark-4 VARIANT expressions
    "p19_variant_props",
]


@pytest.mark.parametrize("name", EVALPATH_PINNED)
def test_result_is_evaluation_path_invariant(spark, name):
    spec = REGISTRY[name]
    saved = {k: spark.conf.get(k, None) for k in EVALPATH}
    base = spec.fn(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    try:
        for k, v in EVALPATH.items():
            spark.conf.set(k, v)
        interp = spec.fn(spark, SF_DIR).toPandas()
        spark.catalog.clearCache()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert len(base) == len(interp), (len(base), len(interp))
    assert value_hash(base) == value_hash(interp), (
        f"{name}: result depends on the evaluation path — interpreted "
        "expressions / row-based scan changed the value hash vs "
        "codegen + vectorized"
    )


def _final_plan(df) -> str:
    """Executed plan AFTER materialization — under AQE the codegen spans
    only appear in the final adaptive plan, so inspecting before running
    shows `isFinalPlan=false` with no spans either way (vacuous)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_evalpath_actually_disables_codegen(spark):
    """Guard: under the EVALPATH confs an aggregate's FINAL executed plan
    must contain no WholeStageCodegen span — otherwise §8c tests the same
    compiled path twice and the module is vacuous."""
    saved = {k: spark.conf.get(k, None) for k in EVALPATH}
    agg = lambda: (  # noqa: E731
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .count()
    )
    try:
        for k, v in EVALPATH.items():
            spark.conf.set(k, v)
        plan = _final_plan(agg())
        assert "isFinalPlan=true" in plan, plan[:200]
        # AQE's final-plan rendering marks each codegen span as `*(n) Node`
        assert "WholeStageCodegen" not in plan and "*(" not in plan, plan[:500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # and with the confs restored, codegen is back (the default path)
    plan2 = _final_plan(agg())
    assert "WholeStageCodegen" in plan2 or "*(" in plan2, plan2[:500]
