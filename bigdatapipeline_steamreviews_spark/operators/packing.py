"""Sequence packing: lay documents end-to-end into fixed-token-budget
training sequences — the last operator a pretraining data pipeline runs
before the tokenizer hands batches to the trainer ("concat-and-chop").

Shape: the corpus is split into ``n_shards`` deterministic hash shards;
within each shard, documents are laid out in doc-id order and a running
token count assigns each document its (sequence, offset).  Sequences never
cross shards, so every shard packs independently — the window sort is
per-shard, NOT corpus-global.

Scale note (the knob that matters): one task sorts one shard, so
``n_shards`` is the parallelism lever — at 100 TB it is set to thousands
(shard ~ a few GB), exactly how production packers shard.  The default
here is small only because the fixture corpus is.  Packing quality is
unaffected by sharding: the only waste is <= one partial sequence per
shard, amortized to nothing at real shard sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Assign every document a (shard, seq, offset_in_seq) placement.

    ``sizes`` (optional): a (id_col, n_tokens) DataFrame supplying each
    document's token count from a real tokenizer — e.g.
    ``bpe_token_stats(...)`` — in which case ``docs``/``text_col`` are
    not consulted for counting and the layout is TOKENIZER-EXACT (the
    whitespace default over-packs by the tokenizer's fertility, ~1.2-3x
    depending on language/merges, which a production budget cannot
    absorb).  Layout math is identical either way.

    * shard: portable 60-bit md5 hash of the id, mod ``n_shards`` — the
      P15 deterministic-sampling recipe, identical on any engine/rerun;
    * within a shard, docs are laid out in ascending id order;
    * seq = floor(tokens_before / budget): a document starts in the
      sequence its cumulative offset lands in (documents longer than the
      remaining room simply continue into following sequences — the
      standard concat-and-chop; no padding, no document splitting logic
      beyond the offset arithmetic).

    Returns (doc_id, n_tokens, shard, seq, offset_in_seq).
    """
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % n_shards
    )
    if sizes is not None:
        sized = sizes.select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            shard.alias("shard"),
        )
    else:
        sized = docs.select(
            F.col(id_col),
            n_tokens.alias("n_tokens"),
            shard.alias("shard"),
        )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return sized.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(tokens_before / budget).cast("long").alias("seq"),
        (tokens_before % budget).alias("offset_in_seq"),
    )
