"""Arrow/pandas seam invariance (round-10, r9 verdict ask #5 — the §9
environment-perturbation audit extended to the Python seams).

The timezone/locale axis found a real ORC bug in round 9; the Arrow
seams carry the same risk class across pyarrow/pandas versions: batch
boundaries move (``arrow.maxRecordsPerBatch``), pandas silently promotes
dtypes differently per version (int64 with a missing value -> float64 —
NaN-vs-NULL drift the value hash now distinguishes), and strict Arrow
conversion (``pandas.convertToArrowArraySafely``) turns silent lossy
casts into errors.  This module reruns each of the five seam CLASSES'
gating queries under a hostile seam profile and requires hash-identical
results:

* model inference  (``operators/inference.py``)   — x4_model_scores
* multimodal codec (``operators/multimodal.py``)  — x5_feature_extract
* UDTF chunker                                     — x4_chunk_documents_udtf
* buffered stateful streaming (sessions)           — stream_sessionization_disordered
* buffered stateful streaming (linear-recurrence)  — stream_user_ewma_disordered

The profile is applied BOTH as session conf and as a
``SPARK_GRAFT_EXTRA_CONF`` env pin: operator builders tune
``arrow.maxRecordsPerBatch`` themselves (inference/multimodal), and
``session.set_unless_pinned`` must yield to the audit pin — without the
env pin, the first seam query would silently undo the perturbation for
everything after it (the round-9 ADVICE finding this module regression-
guards).  The pandas copy-on-write axis needs a fresh JVM (worker env is
frozen at JVM start) and lives in scripts/run_audits.sh §9b.
"""

from __future__ import annotations

import os
import pathlib
import sys

import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from verify_local import value_hash  # noqa: E402

SEAM_PROFILE = {
    # hostile batch boundaries: many tiny Arrow batches per seam call
    "spark.sql.execution.arrow.maxRecordsPerBatch": "16",
    # strict conversion: a seam relying on a silent lossy pandas->Arrow
    # cast fails loudly here instead of drifting
    "spark.sql.execution.pandas.convertToArrowArraySafely": "true",
}

SEAM_QUERIES = [
    "x4_model_scores",
    "x5_feature_extract",
    "x4_chunk_documents_udtf",
    "stream_sessionization_disordered",
    "stream_user_ewma_disordered",
]


@pytest.mark.parametrize("name", SEAM_QUERIES)
def test_seam_result_is_arrow_profile_invariant(spark, name, monkeypatch):
    spec = REGISTRY[name]
    base = spec.fn(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    saved = {k: spark.conf.get(k, None) for k in SEAM_PROFILE}
    try:
        monkeypatch.setenv(
            "SPARK_GRAFT_EXTRA_CONF",
            ";".join(f"{k}={v}" for k, v in SEAM_PROFILE.items()),
        )
        for k, v in SEAM_PROFILE.items():
            spark.conf.set(k, v)
        pert = spec.fn(spark, SF_DIR).toPandas()
        spark.catalog.clearCache()
        # the env pin must have held through the whole run — an operator
        # builder that overwrote it would reintroduce the r9 ADVICE bug
        assert (
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
            == "16"
        ), "a seam builder overwrote the pinned Arrow batch size"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert len(base) == len(pert), (len(base), len(pert))
    assert value_hash(base) == value_hash(pert), (
        f"{name}: result depends on Arrow batch boundaries / pandas "
        "conversion strictness — a cross-version drift bug in waiting"
    )


def test_profile_actually_shrinks_arrow_batches(spark):
    """Guard against vacuity: under the profile, a mapInPandas over the
    documents table really does see many small batches."""
    import pandas as pd

    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").coalesce(1)

        def count_batches(batches):
            sizes = [len(b) for b in batches]
            yield pd.DataFrame({"n_batches": [len(sizes)], "max_sz": [max(sizes)]})

        row = (
            docs.mapInPandas(count_batches, "n_batches long, max_sz long")
            .collect()[0]
        )
        assert row["n_batches"] > 1
        assert row["max_sz"] <= 16
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", saved
            )
