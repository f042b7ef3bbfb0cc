"""Unit tests for the round-2 training-pipeline operators: count-min
sketch, incremental dedup, cross-corpus LSH, label centroids, scalar
quantization, and sequence packing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.dedup import (
    cross_corpus_lsh_candidates,
    incremental_exact_dedup,
)
from bigdatapipeline_steamreviews_spark.operators.packing import pack_sequences
from bigdatapipeline_steamreviews_spark.operators.similarity import (
    label_centroids,
    scalar_quantize,
)
from bigdatapipeline_steamreviews_spark.operators.sketches import (
    cms_counter_table,
    cms_estimate,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"


def _tokens(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["token"])


def test_cms_estimate_never_undercounts(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    tok = _tokens(spark, words)
    counters = cms_counter_table(tok)
    cand = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], ["token"])
    est = {r.token: r.cms_est for r in cms_estimate(counters, cand).collect()}
    assert est["a"] >= 5 and est["b"] >= 3 and est["c"] >= 1
    # An unseen token can only overcount via collisions, never undercount.
    assert est["zzz"] >= 0


def test_cms_sketches_merge_by_addition(spark):
    """CMS(left) + CMS(right) == CMS(left ++ right) counter-for-counter —
    the property that makes the sketch incremental/streamable."""
    left = ["a"] * 4 + ["b"] * 2
    right = ["a"] * 1 + ["c"] * 3
    whole = cms_counter_table(_tokens(spark, left + right))
    parts = (
        cms_counter_table(_tokens(spark, left))
        .unionAll(cms_counter_table(_tokens(spark, right)))
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    w = {(r.row, r.bucket): r.c for r in whole.collect()}
    p = {(r.row, r.bucket): r.c for r in parts.collect()}
    assert w == p


def test_incremental_exact_dedup_flags(spark):
    base = spark.createDataFrame([(0, BASE), (2, "unique base doc")], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(1, BASE), (3, "a brand new document"), (5, "a brand new document")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in incremental_exact_dedup(batch, base).collect()}
    assert got[1].dup_of == 0 and not got[1].is_new  # exact dup of base doc 0
    assert got[3].is_new and got[3].dup_of is None  # new content, min-id row kept
    assert 5 not in got  # within-batch dup collapses to doc 3


def test_cross_corpus_lsh_finds_shared_content(spark):
    base = spark.createDataFrame(
        [(0, BASE), (2, "completely different words about spark query engines here")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(1, BASE.replace("today", "tonight")), (3, "unrelated fresh text with many novel tokens")],
        ["doc_id", "text"],
    )
    cands = {
        (r.batch_id, r.base_id)
        for r in cross_corpus_lsh_candidates(batch, base).collect()
    }
    assert (1, 0) in cands  # near-dup of a base doc
    assert all(b != 3 for b, _ in cands)  # novel doc matches nothing


def test_label_centroids_mean_and_counts(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [3.0, 2.0], 7),
            (2, [10.0, -4.0], 8),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.label: r for r in label_centroids(emb).collect()}
    assert got[7].centroid == [2.0, 1.0] and got[7].n_vecs == 2
    assert got[8].centroid == [10.0, -4.0] and got[8].n_vecs == 1


def test_scalar_quantize_roundtrip(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.5, 1.0]), (1, [2.0, 2.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in scalar_quantize(emb).collect()}
    assert got[0].codes == [0, 128, 255]  # endpoints exact, midpoint half-up
    assert got[0].vmin == 0.0 and got[0].vmax == 1.0
    # 0.5 reconstructs to 128/255 — error is the quantization residual.
    assert math.isclose(got[0].sq_err, (0.5 - 128 / 255) ** 2, rel_tol=1e-12)
    # Constant vector: degenerate scale, codes 0, exact reconstruction.
    assert got[1].codes == [0, 0, 0] and got[1].sq_err == 0.0


def test_pack_sequences_offsets_and_budget(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 * (i % 3 + 1)))) for i in range(40)],
        ["doc_id", "text"],
    )
    placed = pack_sequences(docs, budget=25, n_shards=4).collect()
    assert len(placed) == 40
    by_shard: dict[int, list] = {}
    for r in placed:
        assert 0 <= r.offset_in_seq < 25
        assert r.seq >= 0
        by_shard.setdefault(r.shard, []).append(r)
    # Within a shard, documents in id order tile the token stream exactly:
    # each doc starts where the previous one ended.
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        total = 0
        for r in rows:
            assert r.seq * 25 + r.offset_in_seq == total
            total += r.n_tokens


def test_chunk_documents_windows_and_overlap(spark):
    from bigdatapipeline_steamreviews_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(100))), (1, "short doc")],
        ["doc_id", "text"],
    )
    rows = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    long_chunks = sorted(by_doc[0], key=lambda r: r.chunk_id)
    # 100 tokens, stride 48: starts at 0, 48, 96.
    assert [r.start_token for r in long_chunks] == [0, 48, 96]
    assert [r.n_chunk_tokens for r in long_chunks] == [64, 52, 4]
    # Overlap: chunk 1 begins 16 tokens before chunk 0 ends.
    assert long_chunks[0].chunk_text.split(" ")[48:] == \
        long_chunks[1].chunk_text.split(" ")[:16]
    # Short doc still yields exactly one (partial) chunk.
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "short doc"


def test_gopher_rules_flags_and_keep(spark):
    from bigdatapipeline_steamreviews_spark.operators.text import gopher_rules

    long_good = "the " + "word " * 48 + "a"          # 50 tokens, 2 stopwords
    short = "the a tiny doc"                          # fails word count
    no_stops = "word " * 49 + "word"                  # 50 tokens, 0 stopwords
    symbols = "the a " + "£££ " * 47 + "!!!"          # >10% pure-symbol tokens
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, no_stops), (4, symbols)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].keep
    assert not got[2].keep and not got[2].f_word_count
    assert not got[3].keep and not got[3].f_stopwords
    assert not got[4].keep and not got[4].f_symbol_ratio
    assert not got[4].f_alpha_ratio


def test_temperature_mixture_weights_sqrt_scaling(spark):
    from bigdatapipeline_steamreviews_spark.operators.selection import (
        temperature_mixture_weights,
    )

    # Source A has 4x the tokens of B -> sqrt scaling gives 2:1, not 4:1.
    rows = [("A", 400), ("B", 100)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {r.source: r for r in temperature_mixture_weights(df).collect()}
    assert got["A"].total_size == 400 and got["B"].total_size == 100
    assert abs(got["A"].weight - 2 / 3) < 1e-9
    assert abs(got["B"].weight - 1 / 3) < 1e-9
    assert abs(got["A"].weight + got["B"].weight - 1.0) < 1e-12


def test_hll_streaming_registers_equal_batch(spark):
    # The property stream_hll_distinct_users relies on: registers built
    # from any partitioning/split of the input merge (max) to the same
    # table, so streaming state == batch registers.
    from bigdatapipeline_steamreviews_spark.operators.sketches import (
        hll_finalize,
        hll_register_table,
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("k")
    )
    whole = hll_register_table(df, "k", ["g"])
    halves = hll_register_table(df.filter("k < 500"), "k", ["g"]).unionAll(
        hll_register_table(df.filter("k >= 500"), "k", ["g"])
    )
    merged = halves.groupBy("g", "bucket").agg(F.max("m_rho").alias("m_rho"))
    a = sorted(hll_finalize(whole, ["g"]).collect())
    b = sorted(hll_finalize(merged, ["g"]).collect())
    assert a == b


def test_bpe_packing_differs_from_whitespace(spark):
    """Non-vacuity for x4_sequence_pack_bpe: with merges active the BPE
    piece counts exceed whitespace counts (fertility > 1), so the
    tokenizer-exact layout must place at least one document at a
    different (seq, offset) — and the sizes= path must still tile each
    shard's token stream exactly."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import bpe_token_stats
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(["other", "the", "standing"] * (i % 3 + 1))) for i in range(20)],
        ["doc_id", "text"],
    )
    sizes = bpe_token_stats(docs).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    ws = {r.doc_id: r for r in pack_sequences(docs, budget=25, n_shards=4).collect()}
    bp = {r.doc_id: r for r in pack_sequences(
        docs, budget=25, n_shards=4, sizes=sizes).collect()}
    assert set(ws) == set(bp)
    # fertility > 1 for every doc here (each word splits into >1 piece
    # under the default merges), so counts must strictly exceed.
    assert all(bp[d].n_tokens > ws[d].n_tokens for d in ws)
    assert any(
        (bp[d].seq, bp[d].offset_in_seq) != (ws[d].seq, ws[d].offset_in_seq)
        for d in ws
    )
    by_shard: dict[int, list] = {}
    for r in bp.values():
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        total = 0
        for r in rows:
            assert r.seq * 25 + r.offset_in_seq == total
            total += r.n_tokens
