"""X1/X2 — deduplication operators for training-data pipelines
(SURVEY.md §2.8): exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, and
SimHash.  Embedding-cosine near-dup lives in ``similarity.py``.

Scale notes (100 TB):
* **Exact dedup** groups on a 128-bit content digest, never on the raw
  text: the shuffle key is constant-width, and the digest groupBy is a
  partial-aggregatable operation (map-side combine kicks in).
* **Shingle self-joins** shuffle on the shingle string.  Ubiquitous
  shingles ("of the and") create hot keys; ``max_doc_freq`` drops shingles
  seen in more than N docs before the join — the standard df-pruning from
  set-similarity-join literature, and the difference between a join that
  finishes and one that doesn't at corpus scale.
* **MinHash+LSH** replaces the quadratic candidate space with
  bands-of-minhashes bucket joins: only documents agreeing on one full band
  ever meet.  k and bands tune the Jaccard-probability S-curve.
* All hashes are md5 (portable to the DuckDB oracle bit-for-bit); swap one
  choke point for xxhash64 when raw speed matters more than parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import word_shingles
from .partitioning import ensure_min_parallelism

__all__ = [
    "exact_dedup",
    "paragraph_spans",
    "paragraph_dedup",
    "shingle_table",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_band_table",
    "lsh_self_join",
    "lsh_cross_join",
    "lsh_candidate_pairs",
    "cross_corpus_lsh_candidates",
    "incremental_exact_dedup",
    "simhash_signatures",
    "connected_components",
    "bloom_filter_table",
    "bloom_probe",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """X1 — exact dedup: one surviving (minimum) id per distinct content
    digest, with the copy count.  Returns (keep_id, content_hash, n_copies).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "content_hash", "n_copies")
    )


def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exploded DISTINCT word-n-gram shingles: one (id, shingle) row per
    distinct shingle per document.  ``max_doc_freq`` prunes shingles that
    appear in more than that many documents (skew/hot-key control).
    """
    # Shingling expands rows ~(tokens-n+1)x; guarantee the explode and the
    # joins behind it run wide even when the scan yields few partitions
    # (broadcast joins add no exchange, so nothing downstream re-partitions).
    s = ensure_min_parallelism(df, id_col).select(
        F.col(id_col).alias("sid"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("sh"),
    )
    if max_doc_freq is not None:
        counts = s.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        # Broadcast the HOT set and anti-join, never the keep set: the
        # surviving vocabulary is Heaps-law unbounded at 100 TB (same OOM
        # class as a raw-vocab broadcast), while the pruned-out hot
        # shingles are bounded by total_rows / max_doc_freq — small by
        # construction, and exactly the rows we want to subtract.
        hot = counts.filter(F.col("df") > max_doc_freq).select("sh")
        s = s.join(F.broadcast(hot), "sh", "left_anti")
    return s


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_doc_freq: int | None = None,
    cache_shingles: bool = True,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """X2a — exact n-gram Jaccard similarity join.

    Classic set-similarity join: explode distinct shingles, self-join on
    the shingle (only pairs sharing >=1 shingle are ever materialized),
    count intersections, then Jaccard = inter / (|A| + |B| - inter).
    Returns (a_id, b_id, jaccard) with a_id < b_id, jaccard >= threshold.

    ``shingles`` accepts a prebuilt (sid, sh) posting table — the
    materialized-to-storage form a pipeline keeps between runs (see
    ``sources/staging.py``); when given, ``df``/shingling params are
    ignored and no in-session caching is needed (parquet IS the
    materialization).

    ``cache_shingles`` materializes the exploded shingle table once
    (``localCheckpoint``), which this plan otherwise computes THREE times
    (both self-join sides + the size table) — same self-join-recompute
    trap as the LSH banding join.  localCheckpoint over ``persist`` is a
    lifecycle decision: cached plans live in the session CacheManager
    until someone unpersists them (r1 leaked one block per registry
    sweep), while checkpoint blocks are reference-counted off the
    DataFrame and reclaimed by the ContextCleaner when it goes out of
    scope.  At 100 TB the same idea is "materialize the posting table to
    storage once, join from storage".
    """
    if shingles is not None:
        s = shingles
    else:
        s = shingle_table(df, text_col, id_col, n, max_doc_freq)
        if cache_shingles:
            s = s.localCheckpoint()
    sizes = s.groupBy("sid").agg(F.count(F.lit(1)).alias("nsh"))
    a, b = s.alias("a"), s.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.sid") < F.col("b.sid")))
        .groupBy(F.col("a.sid").alias("a_id"), F.col("b.sid").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na, nb = sizes.alias("na"), sizes.alias("nb")
    jac = (
        inter.join(na, F.col("a_id") == F.col("na.sid"))
        .join(nb, F.col("b_id") == F.col("nb.sid"))
        .select(
            "a_id",
            "b_id",
            (
                F.col("inter")
                / (F.col("na.nsh") + F.col("nb.nsh") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(min_jaccard))


# Carter-Wegman permutation family for MinHash: one strong base hash per
# shingle, then k affine maps h_i(x) = (a_i*x + b_i) mod P over the prime
# field.  P = 2^31-1 keeps a_i*x + b_i inside 63 bits (no BIGINT overflow
# in any engine); the fixed odd constants make signatures deterministic.
MINHASH_PRIME = 2_147_483_647
MINHASH_A = (1_299_721, 1_159_523_347, 741_103_597, 887_751_311,
             1_685_821_657, 723_471_131, 376_940_407, 986_048_563)
MINHASH_B = (15_485_863, 32_452_843, 86_028_121, 122_949_829,
             198_491_317, 295_075_153, 472_882_049, 533_000_401)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
) -> DataFrame:
    """X2b — k-permutation MinHash signatures over word shingles.

    Hash family: ONE md5 per shingle (truncated to 60 bits, reduced mod
    P = 2^31-1), then ``k`` affine permutations (a_i*x + b_i) mod P — the
    standard Carter-Wegman construction.  The expensive strong hash is
    paid once per shingle instead of once per (shingle, function): at k=8
    that is 8x less hashing than salted-md5-per-function, with the same
    MinHash estimator guarantees.  Integer mod arithmetic is bit-identical
    in every engine, so signatures stay oracle-portable.

    **Shuffle-free**: the whole signature is a per-row projection —
    base hashes via ``transform(shingles, md5-mod-P)`` (its own projection
    step: CollapseProject refuses to duplicate non-cheap collection
    expressions, so the md5 pass stays single), then ``array_min`` over
    each affine map — instead of the explode + groupBy(doc) formulation,
    which shuffles every (doc, shingle) row just to bring them back
    together.  At 100 TB that is the difference between a map-only stage
    and a corpus-sized shuffle.  (`ensure_min_parallelism` still applies
    for the LSH join that typically follows.)
    """
    c = F.col(text_col)
    # <n-token docs have no signature.  Expressed as a TOKEN-COUNT filter
    # (equivalent: the shingle list is non-empty iff tokens >= n), not as
    # size(shingles) > 0 — Catalyst pushes filters through the repartition
    # exchange by substituting the projected expression, so the latter
    # recomputed the whole shingle construction per row on the (possibly
    # single-task) scan side before the exchange ever fanned out; one
    # split-and-count per row is the cheap predicate that pushdown is
    # allowed to move.  (Profiled 4x on a 1-file sf0.1 corpus.)
    src = ensure_min_parallelism(
        df.filter(F.size(F.split(c, " ")) >= n), id_col
    )
    return minhash_sig_frame(src, text_col=text_col, id_col=id_col, n=n, k=k)


def minhash_sig_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    carry: tuple = (),
) -> DataFrame:
    """The per-row signature core of :func:`minhash_signatures`, shared
    with STREAMING consumers (r15 ``stream_curation_pipeline``): no
    ``ensure_min_parallelism`` probe (``df.rdd`` is illegal on a
    streaming frame) and ``carry`` threads extra columns through the
    staged selects.  One implementation for both planes — the batch
    signature index and a stream's per-arrival signatures can never
    drift.  Still drops <n-token docs (no shingles => no signature);
    batch callers pre-filter for pushdown, so the filter here is a
    no-op for them."""
    if k > len(MINHASH_A):
        raise ValueError(f"k <= {len(MINHASH_A)} supported (got {k})")
    c = F.col(text_col)
    p = F.lit(MINHASH_PRIME).cast("long")
    keep = [F.col(x) for x in carry]
    shingled = df.filter(F.size(F.split(c, " ")) >= n).select(
        F.col(id_col),
        *keep,
        F.array_distinct(word_shingles(c, n)).alias("__sh"),
    )
    based = shingled.select(
        F.col(id_col),
        *keep,
        F.transform(
            F.col("__sh"),
            lambda s: F.pmod(
                F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), p
            ),
        ).alias("__hs"),
    )
    def affine(i: int):
        # NB: must return a ONE-arg lambda — a two-arg lambda makes
        # F.transform pass the ARRAY INDEX as the second argument.
        a = F.lit(MINHASH_A[i]).cast("long")
        b = F.lit(MINHASH_B[i]).cast("long")
        return lambda x: F.pmod(a * x + b, p)

    mins = [
        F.array_min(F.transform(F.col("__hs"), affine(i))).alias(f"h{i}")
        for i in range(k)
    ]
    return based.select(F.col(id_col), *keep, *mins)


def lsh_band_key(bi: int, r: int) -> Column:
    """Band ``bi``'s LSH key over signature columns ``h{bi*r}..h{bi*r+r-1}``
    — md5 over the pipe-joined minhashes.  Shared by :func:`lsh_band_table`
    (the persisted index) and streaming per-arrival band keys
    (``stream_curation_pipeline``), so the two can never drift."""
    parts = [F.col(f"h{bi * r + j}") for j in range(r)]
    return F.md5(F.concat_ws("|", *parts))


def lsh_band_table(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The banded signature table behind every LSH join: one
    (bid, band, key) row per document per band, where key is md5 over the
    band's minhashes — a constant-width join key regardless of shingle
    sizes.  Shared by the self-join (within-corpus dedup) and the
    two-corpus join (incremental dedup against an existing corpus)."""
    r = k // bands
    band_cols = []
    for bi in range(bands):
        band_cols.append(
            F.struct(
                F.lit(bi).alias("band"),
                lsh_band_key(bi, r).alias("key"),
            )
        )
    return sigs.select(
        F.col(id_col).alias("bid"), F.explode(F.array(*band_cols)).alias("b")
    ).select("bid", F.col("b.band").alias("band"), F.col("b.key").alias("key"))


def lsh_self_join(band_table: DataFrame) -> DataFrame:
    """The LSH bucket self-join over a (bid, band, key) band table:
    documents agreeing on any full band become candidate pairs.  Returns
    distinct (a_id, b_id), a < b.  The band key is a constant-width md5,
    so the join shuffles fixed-size keys regardless of shingle sizes.

    Callers pass either an in-session band table (see
    :func:`lsh_candidate_pairs`) or one read back from storage — the
    materialized signature table a pipeline keeps between dedup runs
    (``sources/staging.py``)."""
    a, b = band_table.alias("a"), band_table.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.bid") < F.col("b.bid")),
        )
        .select(F.col("a.bid").alias("a_id"), F.col("b.bid").alias("b_id"))
        .distinct()
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    cache_signatures: bool = True,
) -> DataFrame:
    """X2b — LSH banding: documents agreeing on every minhash within any
    band become candidate pairs.  Returns distinct (a_id, b_id), a < b.

    ``cache_signatures`` materializes the banded signature table once
    (``localCheckpoint``) before the self-join: a self-join plans its
    subtree TWICE, and the subtree here is the expensive part
    (k x |shingles| md5 calls per document), so without it every
    signature is computed twice.  Measured ~3x on the join phase at
    sf0.1.  localCheckpoint instead of persist so the blocks are
    reclaimed when the DataFrame goes out of scope (persist'd plans sat
    in the CacheManager forever in r1 — one leaked cache per sweep); the
    table is tiny (id + band + one md5 per band).  At 100 TB the same
    idea is "materialize the signature table once, join from storage" —
    which is exactly what the registered query does via
    ``sources/staging.py`` + :func:`lsh_self_join`.
    """
    exploded = lsh_band_table(sigs, id_col, k, bands)
    if cache_signatures:
        exploded = exploded.localCheckpoint()
    return lsh_self_join(exploded)


def paragraph_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
) -> DataFrame:
    """The exploded fixed-width span table behind :func:`paragraph_dedup`:
    one (doc_id, span_idx, span, h) row per ``span_words``-word span, spans
    generated with pure array expressions (split -> sequence -> slice ->
    array_join) — no UDF.  This is the table a pipeline materializes to
    storage and reuses (``sources/staging.py``); ``paragraph_dedup``
    accepts it prebuilt."""
    w = F.split(F.col(text_col), " ")
    n_spans = F.greatest(
        F.ceil(F.size(w) / F.lit(float(span_words))).cast("int"), F.lit(1)
    )
    spans_arr = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(
            F.slice(w, i * span_words + 1, span_words), " "
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans_arr).alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        "span",
        F.md5(F.col("span")).alias("h"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
    cache_spans: bool = True,
    spans: DataFrame | None = None,
) -> DataFrame:
    """X1, sub-document grain — exact dedup of fixed-width word spans
    ("paragraphs") across the whole corpus, with per-document reassembly
    of the surviving text (the RefinedWeb/CCNet-style pass that strips
    boilerplate repeated across documents without dropping whole docs).

    Shape, built for 100 TB:
    * spans are generated per-row with pure array expressions (split →
      sequence → slice → array_join), exploded once — no UDF;
    * the global keep/drop decision is a **groupBy(span digest) +
      min(struct(id, span_idx))** — partial-aggregatable (map-side
      combine), constant-width shuffle key, NO corpus-wide window;
    * the keeper set joins back on the digest (hash equi-join), and
      reassembly is a per-document sort of its own surviving spans
      (collect_list bounded by document length, never corpus length).

    First occurrence (minimum ``(doc_id, span_idx)``) survives; every
    later identical span anywhere in the corpus is dropped.  Returns
    (doc_id, n_spans, n_kept, cleaned_text) — cleaned_text '' when every
    span of a document was seen earlier.

    ``spans`` accepts the prebuilt span table (one materialized to
    storage via the ``sources/staging.py`` pattern — the 100 TB form);
    when given, ``df``/span params are ignored and no in-session caching
    happens (parquet IS the materialization).  Otherwise ``cache_spans``
    localCheckpoints the exploded span table (used 3x below: keeper,
    join-back, counts).  Checkpoint blocks are pinned to executor storage
    and are NOT fault-tolerant — the right call at test scale where
    recompute costs more than storage, the wrong one for a corpus-sized
    span table on a real cluster.  The keeper join aliases its digest
    (``kh``) so correctness never depends on Spark's same-exprId
    self-join disambiguation either way.
    """
    if spans is None:
        spans = paragraph_spans(df, text_col, id_col, span_words)
        if cache_spans:
            spans = spans.localCheckpoint()  # used 3x (keeper, join-back, counts)
    keeper = spans.groupBy("h").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("k")
    ).select(
        F.col("h").alias("kh"),
        F.col("k.doc_id").alias("k_doc"),
        F.col("k.span_idx").alias("k_idx"),
    )
    kept = spans.join(
        keeper,
        (spans.h == keeper.kh)
        & (spans.doc_id == keeper.k_doc)
        & (spans.span_idx == keeper.k_idx),
    ).select("doc_id", "span_idx", "span")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    counts = spans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    return counts.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


def incremental_exact_dedup(
    batch: DataFrame,
    base: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X1, incremental form — dedup a NEW batch against an EXISTING
    corpus, the shape every continuously-ingesting training pipeline
    actually runs (the one-shot ``exact_dedup`` re-reads the world).

    Both sides reduce to (digest, min id) before meeting: the batch keeps
    one candidate row per distinct digest and the base is its digest
    dictionary — at 100 TB that dictionary is the thing a pipeline keeps
    materialized between runs, and the join is digest-keyed (constant
    width) rather than content-keyed.  A left join marks each distinct
    batch document as new (``dup_of`` null) or as a duplicate of the
    surviving base id.

    Returns (doc_id, content_hash, dup_of, is_new) — one row per distinct
    batch digest, doc_id = the batch's min id for that digest.
    """
    batch_d = batch.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(F.col(id_col)).alias("doc_id")
    )
    base_d = base.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(F.col(id_col)).alias("dup_of")
    )
    return batch_d.join(base_d, "content_hash", "left").select(
        "doc_id",
        "content_hash",
        "dup_of",
        F.col("dup_of").isNull().alias("is_new"),
    )


def cross_corpus_lsh_candidates(
    batch: DataFrame,
    base: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """X2, incremental form — near-duplicate CANDIDATES of a new batch
    against an existing corpus: batch documents sharing any full LSH band
    with a base document.

    Same banded-signature machinery as the self-join dedup, but the join
    is batch x base instead of corpus x corpus — candidate volume scales
    with the batch, and the base's band table is exactly the artifact a
    pipeline materializes once and reuses every ingest (here it is
    recomputed because the fixture has no persisted index; the operator
    accepts any (bid, band, key)-shaped base side).

    Returns distinct (batch_id, base_id).
    """
    batch_bands = lsh_band_table(
        minhash_signatures(batch, text_col, id_col, n, k), id_col, k, bands
    )
    base_bands = lsh_band_table(
        minhash_signatures(base, text_col, id_col, n, k), id_col, k, bands
    )
    return lsh_cross_join(batch_bands, base_bands)


def lsh_cross_join(batch_bands: DataFrame, base_bands: DataFrame) -> DataFrame:
    """The two-corpus LSH bucket join over (bid, band, key) band tables —
    a document's band keys depend only on its own text, so the base side
    can be (and at scale, is) a persisted index read back from storage
    and the batch side a fresh ingest.  Returns distinct
    (batch_id, base_id)."""
    b, c = batch_bands.alias("b"), base_bands.alias("c")
    return (
        b.join(
            c,
            (F.col("b.band") == F.col("c.band")) & (F.col("b.key") == F.col("c.key")),
        )
        .select(F.col("b.bid").alias("batch_id"), F.col("c.bid").alias("base_id"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Dedup-cluster formation: connected components over candidate pairs,
    labelling every node with the minimum id in its component.

    This is the step after any near-dup pair generator (LSH, Jaccard,
    embedding buckets): pairs only say "a ~ b"; keeping one survivor per
    *transitive* duplicate group needs components.  Iterative min-label
    propagation with **pointer jumping**: each round every node takes the
    min over its neighbors' labels (one hop), then follows its own label's
    label (lbl := min(lbl, lbl[lbl]) — the path-halving step), so label
    distance-to-root roughly doubles per round and a diameter-D chain
    converges in O(log D) rounds instead of O(D).  Near-dup components
    are shallow (stars, short chains), so 2-4 rounds is typical; the
    doubling is insurance for the pathological deep chain.  (The
    alternating large-star/small-star scheme of Kiveris et al.,
    "Connected Components in MapReduce and Beyond", is the edge-rewriting
    cousin; label doubling gets the same logarithmic bound while keeping
    the edge set immutable.)

    Scale notes: each round is two shuffle joins (edges x labels on node
    id; labels x labels for the jump) + one min-aggregate;
    ``localCheckpoint`` truncates the growing lineage each round so plan
    compilation stays O(1) per round.  The convergence test is a
    driver-side existence check on changed labels — one tiny action per
    round, the standard pattern for iterative dataflow (GraphX does the
    same under the hood).

    Raises ``RuntimeError`` if a fixpoint is not reached in ``max_iter``
    rounds — silently returning partial labels would fail any downstream
    exactness gate with no hint at the cause.  With doubling, hitting the
    default bound requires a component of diameter ~2^25.
    """
    # Undirected edge list, both directions.
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    edges = fwd.unionAll(rev).distinct().localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.node2, "left"
        ).select(
            "node",
            F.col("lbl").alias("old_lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                "lbl1"
            ),
        )
        # Pointer jumping: follow the (freshly stepped) label chain one more
        # hop — lbl := min(lbl1, lbl1[lbl1]).
        a, b = stepped.alias("a"), stepped.alias("b")
        new_labels = (
            a.join(b, F.col("a.lbl1") == F.col("b.node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.least(
                    F.col("a.lbl1"),
                    F.coalesce(F.col("b.lbl1"), F.col("a.lbl1")),
                ).alias("lbl"),
                (
                    F.least(
                        F.col("a.lbl1"),
                        F.coalesce(F.col("b.lbl1"), F.col("a.lbl1")),
                    )
                    < F.col("a.old_lbl")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds 2^rounds — raise max_iter"
        )

    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def _hex_digit(h: Column, pos: int) -> Column:
    """Value 0-15 of one hex digit of a hash string (1-based position)."""
    return F.conv(F.substring(h, pos, 1), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """X2c — SimHash: per-bit majority vote over token hashes.

    Each distinct token votes +1/-1 on every bit of its md5; the signature
    sets bit j iff the vote sum is positive.  Near-duplicate texts differ
    in few tokens, so their signatures differ in few bits.  Uses pure
    arithmetic (div/mod) for bit extraction — portable across engines.

    **Shuffle-free**: token hashes are materialized once per row
    (``transform(tokens, md5)``), then each bit's vote is a sequential
    ``aggregate`` fold over that array — replacing the explode +
    groupBy(doc) formulation that shuffled every (doc, token) row.
    """
    # Scoreable text only (NULL text has no tokens; the engines disagree
    # on every downstream null-token expression — r6 audit).
    df = df.filter(F.col(text_col).isNotNull())
    hashed = ensure_min_parallelism(df, id_col).select(
        F.col(id_col),
        F.transform(
            F.array_distinct(F.split(F.col(text_col), " ")), F.md5
        ).alias("__hs"),
    )

    def vote(j: int) -> Column:
        def bit_vote(acc: Column, h: Column) -> Column:
            digit = _hex_digit(h, 1 + j // 4)
            bit = (digit / F.lit(2 ** (3 - j % 4))).cast("long") % 2
            return acc + (bit * 2 - 1)

        return F.aggregate(F.col("__hs"), F.lit(0).cast("long"), bit_vote)

    sig = None
    for j in range(bits):
        term = (vote(j) > 0).cast("long") * F.lit(2**j)
        sig = term if sig is None else sig + term
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def prefix_filtered_jaccard_pairs(
    shingles: DataFrame, min_jaccard: float = 0.5
) -> DataFrame:
    """Prefix-filtered exact set-similarity join (PPJoin-family, Bayardo
    et al. WWW'07 / Xiao et al. "Efficient Similarity Joins"): the same
    (a_id, b_id, jaccard >= t) output as the plain posting self-join,
    from far fewer candidates.

    Every document's shingle set is ordered by GLOBAL document frequency
    (rarest first, ties on the shingle string); for Jaccard >= t two sets
    must overlap in o = ceil(t/(1+t)·(|a|+|b|)) elements, so each set's
    first |s| - ceil(t·|s|) + 1 shingles (its PREFIX) must share at least
    one element with the other's — joining on prefix shingles alone is
    therefore COMPLETE, and because prefixes hold each document's rarest
    shingles, the join keys are exactly the ones with the shortest
    posting lists.  A length filter (t·|a| <= |b| and t·|b| <= |a|)
    prunes further before the candidate pairs are verified with an exact
    intersection count restricted to the candidate set.

    Scale contrast with ``ngram_jaccard_pairs``: the plain join's hot-key
    cost is the square of the LONGEST posting list (df-pruning mitigates
    by dropping hot shingles — changing the semantics); prefix filtering
    keeps exact semantics while joining only on rare shingles.  The
    candidate count is asserted strictly smaller in
    ``test_dedup_similarity.py``.
    """
    s = shingles  # (sid, sh)
    sizes = s.groupBy("sid").agg(F.count(F.lit(1)).alias("nsh"))
    dfreq = s.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("sid").orderBy("df", "sh")
    prefix_len = (
        F.col("nsh") - F.ceil(F.lit(min_jaccard) * F.col("nsh")) + 1
    )
    prefix = (
        s.join(dfreq, "sh")
        .join(sizes, "sid")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_len)
        .select("sid", "sh", "nsh")
    )
    a = prefix.select(
        F.col("sid").alias("a_id"), "sh", F.col("nsh").alias("na")
    )
    b = prefix.select(
        F.col("sid").alias("b_id"),
        F.col("sh").alias("shb"),
        F.col("nsh").alias("nb"),
    )
    cands = (
        a.join(b, (F.col("sh") == F.col("shb")) & (F.col("a_id") < F.col("b_id")))
        .filter(
            (F.col("nb") >= F.lit(min_jaccard) * F.col("na"))
            & (F.col("na") >= F.lit(min_jaccard) * F.col("nb"))
        )
        .select("a_id", "b_id", "na", "nb")
        .distinct()
    )
    pa = s.select(F.col("sid").alias("a_id"), "sh")
    pb = s.select(F.col("sid").alias("b_id"), "sh")
    inter = (
        cands.join(pa, "a_id")
        .join(pb, ["b_id", "sh"])
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership (approximate incremental dedup at corpus scale)
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 62  # bits per packed long; 62 dodges sign-bit overflow
#                        semantics that differ across engines at 1<<63


def _bloom_positions(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of ``k_hashes`` bit positions in ``[0, m_bits)`` for a key —
    independent md5 draws (salted by hash index), bit-identical in every
    engine, so the filter AND its false positives are deterministic."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda j: F.conv(
            F.substring(
                F.md5(F.concat_ws("|", key.cast("string"), j.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % m_bits,
    )


def bloom_filter_table(
    keys: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """Build a Bloom filter over ``keys`` as a PACKED TABLE
    ``(word_idx, bits)`` — ``m_bits / 62`` longs, OR-folded distributively.

    bit_or is commutative/associative, so the build is one map-side
    explode (k positions per key) + a partial-aggregatable groupBy on
    ``word_idx`` — the filter for a 10^10-key corpus is ~m/62 rows built
    in one scan, and it BROADCASTS to probers (the point: membership
    tests against the historical corpus without joining the corpus).
    """
    pos = keys.select(
        F.explode(_bloom_positions(F.col(key_col), m_bits, k_hashes)).alias(
            "__p"
        )
    )
    return (
        pos.select(
            (F.col("__p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
            # shiftleft's numBits parameter is literal-only in the Python
            # API; the SQL form takes a column.
            F.expr(
                f"shiftleft(1L, CAST(__p % {_BLOOM_WORD_BITS} AS INT))"
            ).alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__bit)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Test each row's key against a packed Bloom filter: adds
    ``maybe_member`` (true iff ALL k bits are set — no false negatives;
    false positives at the standard (1 - e^{-kn/m})^k rate, and
    deterministic here because the hashes are).

    Duplicate keys are the NORM in a dedup probe stream, so the per-key
    verdict aggregates with ``min(hit)`` — true iff every one of the k
    bit-probes hit — which is invariant to how many rows share the key
    (a ``sum == k`` formulation double-counts collapsed duplicates and
    fabricates false NEGATIVES, breaking the filter's one guarantee).
    NULL keys never match the hash path; they survive the left join back
    with ``maybe_member = false`` rather than being dropped.

    The probe explodes each key into its k (word, bit) lookups, joins the
    ~m/62-row filter BROADCAST, and min-reduces hits per key — the corpus
    being probed is scanned once; the only shuffle is the key groupBy,
    map-side-combined to one row per distinct key.
    """
    probes = df.select(
        F.col(key_col).alias("__key"),
        F.explode(
            _bloom_positions(F.col(key_col), m_bits, k_hashes)
        ).alias("__p"),
    ).select(
        "__key",
        (F.col("__p") / _BLOOM_WORD_BITS).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(1L, CAST(__p % {_BLOOM_WORD_BITS} AS INT))"
        ).alias("__bit"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__key",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__bit"))
                == F.col("__bit")
            ).cast("int").alias("__hit"),
        )
        .groupBy("__key")
        .agg((F.min("__hit") == 1).alias("__maybe"))
    )
    return (
        df.join(hits, df[key_col] == hits["__key"], "left")
        .drop("__key")
        .withColumn("maybe_member", F.coalesce(F.col("__maybe"), F.lit(False)))
        .drop("__maybe")
    )


def token_window_dedup(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """X1 — exact duplicated-SPAN detection: fixed-k token windows.

    The suffix-array ExactSubstr dedup of Lee et al. ("Deduplicating
    Training Data Makes Language Models Better") removes any repeated
    substring of >= N tokens; its standard distributed relaxation hashes
    every k-token window, keeps the lexicographically-first occurrence
    of each window, and marks every token covered by a *non-keeper*
    occurrence as duplicated.  Per doc, the duplicated-token count is the
    measure a curation pipeline thresholds on (trim or drop).

    Scale shape: the window table is ~|corpus tokens| rows of
    (16-byte digest, doc_id, position) — constant width, never the text
    itself.  Keeper election is one groupBy(digest) with a map-side
    partial min(struct); the only corpus-wide shuffle pair is that
    groupBy plus the digest equi-join back.  Interval-union coverage is
    a per-doc window (partitioned by doc_id, bounded by doc length).
    No corpus-wide ordering anywhere.

    Returns (doc_id, n_tokens, n_dup_tokens, dup_bp) with dup_bp the
    duplicated fraction in integer basis points (exact arithmetic, no
    float round-trip in the gate).  ``id_col``/``text_col`` name the
    input columns (whitespace tokenization; the output id column is
    always ``doc_id``).

    Composition of :func:`window_digest_table` (the expensive
    explode+md5 pass, STAGEABLE — see ``queries_text._staged_span_wins``)
    and :func:`span_dedup_from_windows` (keeper election + interval
    union), so repeated runs can join from a persisted digest table
    instead of re-hashing the corpus.
    """
    wins = window_digest_table(docs, k=k, id_col=id_col, text_col=text_col)
    return span_dedup_from_windows(
        docs, wins, k=k, id_col=id_col, text_col=text_col
    )


def window_digest_table(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, i, h): md5 digest of every k-token window — the
    fingerprint-keyed index span dedup runs on.  ~|corpus tokens| rows of
    constant width (16-byte digest + two ints), never the text itself;
    one corpus scan, all map-side.  Persist it (``staged_parquet``) and
    every downstream keeper election/join reads storage instead of
    re-paying the explode+md5 pass."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("t")
    ).select("doc_id", "t", F.size("t").alias("n_tokens"))
    starts = F.when(
        F.col("n_tokens") >= k,
        F.sequence(F.lit(1), F.col("n_tokens") - (k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return toks.select(
        "doc_id",
        F.explode(starts).alias("i"),
        "t",
    ).select(
        "doc_id",
        "i",
        F.md5(F.concat_ws(" ", F.slice("t", F.col("i"), k))).alias("h"),
    )


def span_dedup_from_windows(
    docs: DataFrame,
    wins: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span dedup given a prebuilt (doc_id, i, h) window-digest table —
    see :func:`token_window_dedup` for the semantics and scale shape.
    When ``wins`` is a staged parquet, the keeper election scans storage;
    the only touch of ``docs`` is the final per-doc token-count join.

    Keeper election is ONE digest-partitioned window
    (``min(struct) over partitionBy(h)``), not a groupBy + join back:
    the join formulation shuffles the window table twice (partial-agg
    shuffle, then the SortMergeJoin re-shuffle) for zero skew benefit —
    a boilerplate digest repeated millions of times co-locates all its
    occurrences in one task under EITHER plan (SMJ sorts by h too), so
    the second shuffle buys nothing.  Measured ~30% faster at sf0.1.
    """
    from pyspark.sql import Window as W

    dups = (
        wins.withColumn(
            "kp", F.min(F.struct("doc_id", "i")).over(W.partitionBy("h"))
        )
        .filter(
            ~(
                (F.col("doc_id") == F.col("kp.doc_id"))
                & (F.col("i") == F.col("kp.i"))
            )
        )
        .select("doc_id", F.col("i").alias("s"), (F.col("i") + (k - 1)).alias("e"))
    )
    prev = W.partitionBy("doc_id").orderBy("s").rowsBetween(
        W.unboundedPreceding, -1
    )
    cov = dups.withColumn("pe", F.max("e").over(prev)).select(
        "doc_id",
        F.greatest(
            F.lit(0),
            F.col("e") - F.greatest(F.col("s") - 1, F.coalesce(F.col("pe"), F.lit(0))),
        ).alias("covered"),
    )
    per_doc = cov.groupBy("doc_id").agg(
        F.sum("covered").cast("long").alias("n_dup")
    )
    n_toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(text_col, " ")).cast("long").alias("n_tokens"),
    )
    return (
        n_toks.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.expr("(coalesce(n_dup, 0) * 10000) div n_tokens").alias("dup_bp"),
        )
    )
