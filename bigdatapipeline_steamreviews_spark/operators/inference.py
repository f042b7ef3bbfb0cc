"""Batched model-inference seam (r8 verdict ask #4) — the one LLM-curation
stage with no Catalyst builtin: scoring documents with a learned
quality/toxicity classifier.

Posture mirrors the multimodal codec seam (``operators/multimodal.py``):
everything Spark-architectural is REAL — Arrow-batched ``mapInPandas``,
model-batch re-chunking inside each Arrow batch (the GPU memory bound a
real forward pass lives under), tokenize→truncate→featurize→forward
pipeline shape, NULL quarantine, output schema — while the forward pass
itself dispatches through a model registry whose only installed entry is a
deterministic stub.  Real weights are a documented deployment seam: an
unknown model name raises ``NotImplementedError`` (a missing-model
deployment error), it never silently falls back.

The stub ("rational-logistic-v1") is built so the whole Python path is
oracle-checkable BITWISE: integer token features (exact), then a fixed
dag of IEEE-754 double ops — multiply/add/divide/abs only, NO
transcendentals (libm ``exp``/``log`` bit-patterns differ across engines;
``x/(1+|x|)`` is the logistic's rational cousin and every step of it is
exactly specified by IEEE).  DuckDB replays the identical expression tree
and the value hash gates exactly.

Scale notes:
* one Python hop, Arrow both ways; per-core throughput is the model's,
  not the serialization's (``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds transfer batches; ``batch_size`` bounds the model's).
* the scored output is (id, score) — join scores back to the corpus by id
  late, so document bodies never ride through Python twice.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["model_scores", "MODEL_REGISTRY"]

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("model", T.StringType(), False),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def _rational_logistic_v1(token_lists: list[list[str] | None]) -> list[float | None]:
    """The stub forward pass: exact integer features per document, then a
    fixed IEEE double expression.

    features (ints, exact):      n_tokens, total_len (codepoints), n_long
                                 (tokens with >= 6 codepoints)
    logits (doubles, IEEE-only): x = (-1.5 + (0.4 * mean_len))
                                     + (1.25 * long_frac)
    squash (rational logistic):  score = x / (1.0 + |x|)

    A None token list (NULL text) or an empty one (no tokens to feed a
    model) scores None — quarantine, never crash (the codec-seam rule).
    The oracle replays the same expression with the same parenthesization;
    every op is exactly specified by IEEE-754, so scores hash bitwise.
    """
    out: list[float | None] = []
    for toks in token_lists:
        if toks is None or not toks:
            out.append(None)
            continue
        n = np.float64(len(toks))
        total_len = np.float64(sum(len(t) for t in toks))
        n_long = np.float64(sum(1 for t in toks if len(t) >= 6))
        mean_len = total_len / n
        long_frac = n_long / n
        x = (np.float64(-1.5) + (np.float64(0.4) * mean_len)) + (
            np.float64(1.25) * long_frac
        )
        out.append(float(x / (np.float64(1.0) + np.abs(x))))
    return out


def _bpe_fertility_v1(token_lists: list[list[str] | None]) -> list[float | None]:
    """A REAL tokenizer behind the seam (r9 verdict ask #7 stretch): score
    = BPE fertility (pieces per whitespace token) under the shipped
    227-rank LARGE_MERGES table, computed by an INDEPENDENT Python BPE —
    an explicit left-to-right scan per rank, not the JVM fold's
    accumulator-string rebuild — so the pytest equivalence row
    (tests/test_bpe.py) cross-checks two formulations of the merge
    semantics; the JVM fold (itself DuckDB-oracle-gated) is the oracle.

    Vocabulary-bound like the distributed operator: per-word piece counts
    are memoized across the batch, so cost tracks DISTINCT words.  This
    is production-shaped: swap LARGE_MERGES for a real merges.txt and the
    seam scores documents with that tokenizer's exact counts."""
    from .bpe import LARGE_MERGES

    cache: dict[str, int] = {}

    def n_pieces(word: str) -> int:
        if word not in cache:
            syms = list(word)
            for a, b in LARGE_MERGES:
                i, out = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = len(syms)
        return cache[word]

    out: list[float | None] = []
    for toks in token_lists:
        if toks is None or not toks:
            out.append(None)
            continue
        pieces = sum(n_pieces(t) for t in toks)
        out.append(float(pieces) / float(len(toks)))
    return out


# The deployment seam: install a real classifier by registering its name
# here (value: tokens-batch -> scores).  Mirrors multimodal._decode_payload.
MODEL_REGISTRY: dict[str, Callable[[list], list]] = {
    "rational-logistic-v1": _rational_logistic_v1,
    "bpe-fertility-v1": _bpe_fertility_v1,
}


def _tokenize(text: str | None, max_len: int) -> list[str] | None:
    """Single-space split (identical semantics in every engine — Python
    ``str.split`` and regex ``\\s+`` classes disagree across engines on
    exotic unicode whitespace), empties dropped, truncated to ``max_len``
    (real models truncate to their context window before featurizing)."""
    if text is None:
        return None
    return [t for t in text.split(" ") if t != ""][:max_len]


def model_scores(
    docs: DataFrame,
    model: str = "rational-logistic-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 256,
    max_len: int = 64,
    arrow_batch_size: int = 2048,
) -> DataFrame:
    """Score every document with ``model`` through ONE Arrow-batched
    Python hop.  Returns (doc_id, model, n_tokens, score).

    ``batch_size`` is the MODEL's batch bound: each Arrow batch is
    re-chunked into model batches before the forward call, exactly where a
    GPU memory limit binds in a real deployment — the two knobs are
    independent (Arrow bounds transfer memory, batch_size bounds model
    memory) and the re-chunk loop is the real plumbing this seam exists to
    exercise.
    """
    if model not in MODEL_REGISTRY:
        raise NotImplementedError(
            f"no model {model!r} installed: real classifier weights are a "
            "deployment seam; register a forward fn at "
            "operators.inference.MODEL_REGISTRY"
        )
    forward = MODEL_REGISTRY[model]
    spark = docs.sparkSession
    from ..session import set_unless_pinned

    set_unless_pinned(
        spark, "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size)
    )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                toks = [_tokenize(t, max_len) for t in chunk[text_col]]
                scores = forward(toks)
                yield pd.DataFrame(
                    {
                        "doc_id": chunk[id_col].values,
                        "model": model,
                        # object dtype so missing values cross Arrow as
                        # NULLs (a float64 NaN is NOT null to Spark, and
                        # NaN-vs-NULL is exactly the kind of drift the
                        # oracle hash would catch).
                        "n_tokens": pd.Series(
                            [None if t is None else len(t) for t in toks],
                            dtype=object,
                            index=chunk.index,
                        ),
                        "score": pd.Series(
                            scores, dtype=object, index=chunk.index
                        ),
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(
        score_batches, schema=_SCORE_SCHEMA
    )
