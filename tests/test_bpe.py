"""BPE token accounting (operators/bpe.py): the merge-pass semantics that
make the count tokenizer-exact, pinned on adversarial words."""

from __future__ import annotations


def _encode(spark, words, merges=None):
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        bpe_encode_vocab,
    )

    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: r["n_bpe"]
        for r in bpe_encode_vocab(vocab, merges=merges).collect()
    }


def test_non_overlapping_leftmost_merge(spark):
    """BPE's within-rank rule: one left-to-right pass, merges never
    overlap.  'ttt' under (t,t) -> [tt, t], not [t, tt] and not a
    cascade; 'tttt' -> [tt, tt]."""
    out = _encode(spark, ["ttt", "tttt", "t", "tt"], merges=[("t", "t")])
    assert out == {"ttt": 2, "tttt": 2, "t": 1, "tt": 1}


def test_rank_order_priority(spark):
    """Earlier merges consume symbols before later ones see them: with
    ranks [(a,b), (b,c)], 'abc' becomes [ab, c] — the rank-2 (b,c) merge
    finds no 'b' left.  Reversing the table flips the outcome."""
    assert _encode(spark, ["abc"], merges=[("a", "b"), ("b", "c")]) == {"abc": 2}
    assert _encode(spark, ["abc"], merges=[("b", "c"), ("a", "b")]) == {"abc": 2}
    # and the merged pair feeds LATER ranks as a unit:
    assert _encode(
        spark, ["abc"], merges=[("a", "b"), ("ab", "c")]
    ) == {"abc": 1}


def test_multibyte_symbols(spark):
    """Symbols are codepoints: multibyte letters and astral-plane emoji
    are single symbols, and merges apply to them like any other."""
    out = _encode(
        spark, ["naïve", "🎮🎮x"], merges=[("ï", "v"), ("🎮", "🎮")]
    )
    assert out == {"naïve": 4, "🎮🎮x": 2}  # n,a,ïv,e / 🎮🎮,x


def test_default_merges_on_corpus_words(spark):
    """The shipped table produces real sub-word units on corpus
    vocabulary (hand-derived): the -> [the], theory -> [the,or,y],
    order -> [or,d,er], group -> [gro,u,p]."""
    out = _encode(spark, ["the", "theory", "order", "group"])
    assert out == {"the": 1, "theory": 3, "order": 3, "group": 3}


def test_stats_exclude_nulls_and_fertility(spark):
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        bpe_token_stats,
    )

    docs = spark.createDataFrame(
        [(0, "the data"), (1, None), (2, "  ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    assert set(rows) == {0}  # NULL and token-less docs excluded
    # the->1 piece, data->3 pieces (da,t,a)
    assert rows[0]["n_ws_tokens"] == 2
    assert rows[0]["n_bpe_tokens"] == 4
    assert rows[0]["fertility"] == 2.0


def test_plan_depth_constant_in_merges(spark):
    """The r9 ask-#2 gate: merge application must stay DATA at any table
    size — the fold-within-fold plan has the SAME shape at 12 ranks and
    at 227 (the former per-rank crossJoin chain grew one plan node per
    merge and would blow Catalyst at a real 50k merges.txt)."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        DEFAULT_MERGES,
        LARGE_MERGES,
        bpe_encode_vocab,
    )
    from bigdatapipeline_steamreviews_spark.plans.lint import plan_text

    assert len(LARGE_MERGES) >= 200
    vocab = spark.createDataFrame([("theory",), ("data",)], "word string")

    def shape(merges):
        # node-type sequence only: strip expression payloads, which
        # legitimately embed the (constant-folded) literals per plan
        return [
            line.strip().split("(")[0].split("[")[0]
            for line in plan_text(bpe_encode_vocab(vocab, merges=merges)).splitlines()
            if line.strip().startswith(("*", "+", ":"))
        ]

    assert shape(DEFAULT_MERGES) == shape(LARGE_MERGES)


def test_large_merges_subsumes_default_prefix(spark):
    """LARGE_MERGES extends DEFAULT_MERGES in rank order, so a word whose
    pieces only involve rank<=12 units encodes identically under both —
    and the guarded fold must not change any DEFAULT result."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        DEFAULT_MERGES,
        LARGE_MERGES,
    )

    assert LARGE_MERGES[: len(DEFAULT_MERGES)] == DEFAULT_MERGES
    # 'group' -> gro,u,p under DEFAULT; rank-13+ digraphs can consume the
    # leftovers further but never un-merge: piece counts only shrink.
    d = _encode(spark, ["the", "theory", "order", "group"])
    big = _encode(
        spark, ["the", "theory", "order", "group"], merges=LARGE_MERGES
    )
    for w in d:
        assert big[w] <= d[w]
    assert big["the"] == 1


def test_tokenizer_seam_matches_jvm_fold(spark):
    """r9 verdict ask #7 (stretch): the model-inference seam runs a REAL
    tokenizer — 'bpe-fertility-v1' counts pieces with an independent
    Python BPE scan over the same 227-rank merges table — and its
    fertility must agree BITWISE with the JVM fold per document (the JVM
    fold is DuckDB-oracle-gated, so it is the oracle here).  max_len is
    raised past every document so the seam's context-window truncation
    does not desync the token sets."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        LARGE_MERGES,
        bpe_token_stats,
    )
    from bigdatapipeline_steamreviews_spark.operators.inference import (
        model_scores,
    )
    from bigdatapipeline_steamreviews_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    jvm = {
        r["doc_id"]: r
        for r in bpe_token_stats(docs, merges=LARGE_MERGES).collect()
    }
    seam = {
        r["doc_id"]: r
        for r in model_scores(
            docs, model="bpe-fertility-v1", max_len=1_000_000
        ).collect()
    }
    assert len(jvm) > 0
    assert set(jvm) <= set(seam)  # seam keeps null/empty docs (score None)
    for doc_id, j in jvm.items():
        s = seam[doc_id]
        assert s["n_tokens"] == j["n_ws_tokens"], doc_id
        assert s["score"] == j["fertility"], doc_id  # bitwise
    for doc_id, s in seam.items():
        if doc_id not in jvm:  # NULL-text / token-less: quarantined
            assert s["score"] is None


def test_jvm_fold_matches_python_scan_on_adversarial_words(spark):
    """Cross-implementation sweep: ONE encode job over a batch of
    adversarial generated words (overlap runs, chained merges, merges at
    word boundaries, multibyte/astral symbols, all-fire and never-fire
    alphabets) must agree with the independent Python left-to-right
    scanner behind the 'bpe-fertility-v1' seam — two formulations of the
    merge semantics, under the full 227-rank table."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        LARGE_MERGES,
    )

    def py_count(word):
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
        return len(syms)

    words = set()
    # overlap runs of every merge pair, including self-pairs
    for a, b in LARGE_MERGES[:40]:
        words.add(a + b)
        words.add((a + b) * 3)
        words.add(b + a + b + a)
        words.add(a + a + b + b)
    # chained multi-symbol units and boundary placements
    words.update(
        ["the", "theory", "thethethe", "groupgroup", "dadada", "xthex",
         "ttttttt", "erererer", "naïvethé", "🎮th🎮", "a", "", "zzz",
         "thisisaverylongwordwithmanymergeablepairsinsideitsomewhere"]
    )
    words = sorted(w for w in words if w)
    got = _encode(spark, words, merges=LARGE_MERGES)
    want = {w: py_count(w) for w in words}
    assert got == want


def test_xl_merges_2048_ranks_bitwise_vs_python_model(spark):
    """r15 (r14 verdict ask #4): the 2,048-rank XL table through the same
    correctness gate — every piece count must equal an independent
    Python replay of the BPE semantics (per rank, one left-to-right
    non-overlapping pass), on corpus-style words plus the adversarial
    shapes the small-table tests pin.  Also: the fold-within-fold plan
    shape is STILL the 12-rank shape (depth O(1) in ranks at 2k)."""
    from bigdatapipeline_steamreviews_spark.operators.bpe import (
        DEFAULT_MERGES,
        XL_MERGES,
        bpe_encode_vocab,
    )
    from bigdatapipeline_steamreviews_spark.plans.lint import plan_text

    assert len(XL_MERGES) == 2048
    assert XL_MERGES[: len(DEFAULT_MERGES)] == DEFAULT_MERGES  # head stable

    def py_bpe(word, merges):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    words = [
        "the", "theory", "order", "group", "entertainment", "ttt",
        "tttt", "international", "reproducibility", "aaaaaa", "zzz",
        "thethethe", "antidisestablishmentarianism", "xylophone",
    ]
    got = _encode(spark, words, merges=XL_MERGES)
    assert got == {w: py_bpe(w, XL_MERGES) for w in words}
    # chained triples fire: XL-only (digraph, letter) ranks produce
    # longer units than the 12-rank head can
    assert got["entertainment"] < py_bpe("entertainment", DEFAULT_MERGES)

    vocab = spark.createDataFrame([("theory",), ("data",)], "word string")

    def shape(merges):
        return [
            line.strip().split("(")[0].split("[")[0]
            for line in plan_text(
                bpe_encode_vocab(vocab, merges=merges)
            ).splitlines()
            if line.strip().startswith(("*", "+", ":"))
        ]

    assert shape(DEFAULT_MERGES) == shape(XL_MERGES)
