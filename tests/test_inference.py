"""Batched model-inference seam (operators/inference.py) — the plumbing a
real classifier deployment rides on: one Arrow-batched Python hop,
model-batch re-chunking, NULL quarantine, registry dispatch."""

from __future__ import annotations

import pytest

from bigdatapipeline_steamreviews_spark.operators.inference import (
    MODEL_REGISTRY,
    model_scores,
)


def _docs(spark, rows=None):
    rows = rows if rows is not None else [
        (0, "short words here"),
        (1, "substantially lengthier vocabulary throughout"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "x " * 200),  # 200 tokens: exercises truncation to max_len
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_schema_and_quarantine(spark):
    """NULL text -> NULL n_tokens and score; empty/whitespace text -> 0
    tokens, NULL score (nothing to feed a model); real text scores in
    (-1, 1) (rational logistic range)."""
    out = {r["doc_id"]: r for r in model_scores(_docs(spark)).collect()}
    assert out[2]["n_tokens"] is None and out[2]["score"] is None
    assert out[3]["n_tokens"] == 0 and out[3]["score"] is None
    assert out[4]["n_tokens"] == 0 and out[4]["score"] is None
    for i in (0, 1):
        assert -1.0 < out[i]["score"] < 1.0
        assert out[i]["model"] == "rational-logistic-v1"
    # longer mean word length + long-token fraction => higher quality logit
    assert out[1]["score"] > out[0]["score"]


def test_truncation_to_max_len(spark):
    """Real models truncate to their context window BEFORE featurizing:
    a 200-token doc must report max_len tokens, and its score must equal
    a doc holding just the first max_len tokens."""
    out = {r["doc_id"]: r for r in model_scores(_docs(spark), max_len=64).collect()}
    assert out[5]["n_tokens"] == 64
    twin = _docs(spark, rows=[(9, "x " * 64)])
    twin_score = model_scores(twin, max_len=64).collect()[0]["score"]
    assert out[5]["score"] == twin_score


def test_exactly_one_arrow_python_hop(spark):
    """The seam's plan contract (r8 verdict ask #4): ONE vectorized
    Python operator — a single MapInPandas node, zero row-at-a-time
    BatchEvalPython — fed by a pruned (doc_id, text) projection."""
    plan = (
        model_scores(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "BatchEvalPython" not in plan


def test_model_batch_rechunking(spark):
    """batch_size bounds the FORWARD call's batch (the GPU memory knob),
    independent of Arrow transfer batches: a spy model must never see more
    than batch_size docs at once, and every doc exactly once."""
    def spy(token_lists):
        # The spy runs in the Python WORKER, not the driver — report each
        # forward call's batch size in-band, as the score itself.
        return [float(len(token_lists))] * len(token_lists)

    MODEL_REGISTRY["spy-v0"] = spy
    try:
        rows = [(i, f"doc number {i}") for i in range(50)]
        df = model_scores(
            _docs(spark, rows=rows).coalesce(1), model="spy-v0", batch_size=8
        )
        got = df.collect()
    finally:
        del MODEL_REGISTRY["spy-v0"]
    assert len(got) == 50
    assert {r["doc_id"] for r in got} == set(range(50))
    batch_sizes = [r["score"] for r in got]
    assert max(batch_sizes) <= 8.0, "a forward call exceeded batch_size"
    # 50 docs on one partition re-chunk to ceil(50/8) calls: six full
    # batches of 8 and one tail of 2 (Arrow may split the partition into
    # multiple transfer batches, which only makes chunks smaller — the
    # bound above is the contract; the exact split is asserted loosely).
    assert sum(batch_sizes) >= 50  # every doc counted in some full batch
    assert 2.0 in batch_sizes or min(batch_sizes) < 8.0


def test_unknown_model_raises_not_implemented(spark):
    """The deployment seam must be loud: an uninstalled model name is a
    missing-weights deployment error, never a silent fallback."""
    with pytest.raises(NotImplementedError, match="toxicity-xl"):
        model_scores(_docs(spark), model="toxicity-xl")
