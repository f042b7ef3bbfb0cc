"""Portable sketches: approximate aggregates whose *algorithm* is pinned,
not just their answer's error bound.

Spark's builtin ``approx_count_distinct`` is a fine HyperLogLog — but its
register layout is engine-private, so two engines (or two Spark versions)
can disagree on the estimate, and nothing but an error-bound test can check
it.  Here the sketch is expressed in portable integer/bit builtins (md5,
bin, %, pow) that every engine evaluates identically, so the SAME algorithm
runs as a DuckDB oracle and the estimate hash-matches bitwise — the
engine's "approximate ops are still deterministic, testable ops" claim.

Scale shape: one narrow shuffle keyed by (group, bucket) carrying a single
max per bucket — register state is ``m`` longs per group regardless of
input size, the whole point of HLL at 100 TB.  All expressions are
whole-stage-codegen'd; no UDFs, no driver state.

Reference connection: the serving layer keeps a distinct-key dictionary
(`visualizer.py:81-82`, SURVEY.md A8); this is its sublinear-memory scale
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hll_register_table",
    "hll_finalize",
    "hll_distinct",
    "HLL_P",
    "hll_alpha_numerator",
    "CMS_DEPTH",
    "CMS_WIDTH",
    "cms_bucket",
    "cms_counter_table",
    "cms_estimate",
    "QSK_K",
    "QSK_QS",
    "qsk_hash",
    "qsk_pool",
    "qsk_merge",
    "qsk_quantiles",
]

# Sketch geometry: m = 2^p buckets; a 60-bit md5-derived hash splits into
# p bucket bits + (60-p) rank bits.
HLL_P = 6
_M = 1 << HLL_P
_RANK_BITS = 60 - HLL_P  # 54
_RHO_MAX = _RANK_BITS + 1  # 55


def hll_alpha_numerator() -> float:
    """alpha_m * m^2 * 2^RHO_MAX, folded into one double literal so both
    engines evaluate one multiply-free division (order-independent)."""
    alpha = 0.7213 / (1.0 + 1.079 / _M)
    return alpha * _M * _M * float(1 << _RHO_MAX)


def _hash60(col: Column) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 of the string
    form — the same recipe as deterministic sampling (P15), identical in
    every engine that has md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hll_register_table(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """Register state: per (group, bucket), the max rank rho (position of
    the leftmost 1-bit in the rank field; all-zeros -> RHO_MAX)."""
    h = _hash60(F.col(key))
    w = F.shiftright(h, HLL_P)  # rank bits
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = (F.lit(_RHO_MAX) - bitlen).cast("long")
    return (
        df.select(*group_cols, (h % _M).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_finalize(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Turn a register table (group_cols, bucket, m_rho) into per-group raw
    estimates.  Split from ``hll_distinct`` so INCREMENTALLY-maintained
    registers finalize the same way: a streaming groupBy(group, bucket)
    max(rho) is exactly this table, kept current by the state store, and
    because registers only ever grow monotonically (max), the streaming
    state after any prefix equals the batch registers over that prefix —
    the sketch *is* the streaming-friendly representation.

    Output: group_cols + hll_raw (double), empty_buckets, n_buckets."""
    # Harmonic mean in exact integer arithmetic: sum of 2^(RHO_MAX - rho)
    # per present bucket, plus 2^RHO_MAX per absent bucket; max total is
    # m * 2^RHO_MAX = 2^61 — inside int64.
    term = F.pow(F.lit(2.0), F.lit(_RHO_MAX) - F.col("m_rho")).cast("long")
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    s_total = F.col("s_present") + (F.lit(_M) - F.col("n_buckets")) * F.lit(
        1 << _RHO_MAX
    ).cast("long")
    return per_group.select(
        *group_cols,
        (F.lit(hll_alpha_numerator()) / s_total.cast("double")).alias("hll_raw"),
        (F.lit(_M) - F.col("n_buckets")).cast("long").alias("empty_buckets"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
    )


def hll_distinct(df: DataFrame, key: str, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group (no small-range correction: the
    correction needs ln(), whose last ulp is libm-specific and would break
    bitwise portability — callers wanting corrected small-n estimates apply
    it on the returned (raw, empty_buckets) pair, as the tests do).

    Output: group_cols + hll_raw (double), empty_buckets, n_buckets."""
    return hll_finalize(hll_register_table(df, key, group_cols), group_cols)


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation.
# ---------------------------------------------------------------------------

# Sketch geometry: depth d independent hash rows x width w counters.  Small
# here because the fixture vocabulary is small; at corpus scale w grows to
# ~e/eps counters (eps = tolerable overcount fraction of total mass) and the
# sketch stays d*w longs REGARDLESS of vocabulary size — that is the point:
# exact per-token counts at 100 TB need a vocabulary-sized shuffle, the CMS
# needs a constant-size one.
CMS_DEPTH = 3
CMS_WIDTH = 64


def cms_bucket(token: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Hash row ``row``'s counter index for a token: the portable 60-bit
    md5 hash (same recipe as P15 sampling / HLL) with a per-row salt,
    reduced mod width.  Bit-identical in every engine with md5."""
    salted = F.concat(F.lit(f"cms{row}:"), token)
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long") % width
    )


def cms_counter_table(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch itself: per (row, bucket), the number of token
    occurrences hashing there.  One narrow groupBy on a (tinyint, long)
    key — partial aggregation collapses each map task's contribution to at
    most d*w rows before the shuffle, so the exchanged volume is constant
    in input size.  Counters are plain sums => sketches from different
    partitions/days/corpora MERGE by adding, the property that makes CMS a
    streaming/incremental structure."""
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(F.col(token_col), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        tokens.select(entries.alias("e"))
        .select(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point queries against the sketch: est(token) = min over rows of the
    token's counter — the classic CMS upper-bound estimate (never under,
    over only on collisions).  The counter table is d*w rows => broadcast;
    the probe is a map-side join however many candidates there are."""
    probes = candidates.select(
        F.col(token_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(F.col(token_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select(token_col, F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: hash-ordered bottom-k row sample.
# ---------------------------------------------------------------------------

# The sketch family's missing member (HLL = distinct, CMS = frequency,
# KMV = distinct-with-merge): QUANTILES.  KLL/GK — the usual streaming
# summaries — buffer and compact, so their state depends on arrival
# ORDER: two partitionings of the same corpus produce different (both
# valid) sketches, which breaks the two properties every sketch in this
# file pins — bitwise cross-engine reproducibility (the DuckDB oracle)
# and merged-per-group == whole-corpus EXACTLY (the a11 rollup
# property).  The mergeable-summaries literature (Agarwal, Cormode,
# Huang, Phillips, Wei, Yi — PODS 2012) includes the random-sample
# summary alongside GK precisely because it is the one with a
# one-way-mergeable, order-independent form; making the sample
# HASH-ORDERED (keep the k rows whose salted md5 is smallest — the
# row-sampling analogue of KMV's k-minimum-values) makes it fully
# deterministic:
#
# * the pool is a function of the row SET, not the scan order — any
#   partitioning, any engine, same k rows bitwise;
# * per-group pools merge EXACTLY: every row in the global bottom-k is
#   by definition in its own group's bottom-k, so bottom-k(union of
#   group pools) == bottom-k(corpus) — the oracle computes the global
#   sketch straight from raw rows while Spark merges per-group pools,
#   and the hash-match IS the rollup proof, cross-engine;
# * the pool is a simple random sample of size k (md5 is uniform), so
#   the value at sample rank ceil(q*k) has true rank within eps*n of
#   q*n with probability >= 1 - 2*exp(-2*k*eps^2) (Hoeffding on the
#   hypergeometric) — the same O(sqrt(1/k)) rank-error regime as a
#   same-size KLL level-0 compactor, traded deliberately: KLL's
#   log^2-factor space advantage for exact mergeability + portability.
#
# Scale shape: the rank<=k filter compiles to WindowGroupLimit, so each
# map task ships at most k rows per group into the shuffle — the
# exchanged volume is (partitions x groups x k) regardless of corpus
# size, and every downstream window runs over the <= groups*k pooled
# rows, never the corpus.  k is small here (fixture scale, like
# CMS_WIDTH); at 100 TB size k ~ ln(2/delta)/(2*eps^2) for the target
# rank error — 26k rows per group for eps=0.01 at delta=1e-3, still a
# constant.
QSK_K = 256
QSK_QS = ((0.25, "q25"), (0.5, "q50"), (0.9, "q90"), (0.99, "q99"))


def qsk_hash(id_col: Column) -> Column:
    """Deterministic 60-bit row hash: the family's md5 recipe with a
    'qsk:' salt so the sample is independent of KMV/P15 draws that hash
    the same id columns."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("qsk:"), id_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def qsk_pool(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    k: int = QSK_K,
) -> DataFrame:
    """The sketch state: per group, the k rows with the smallest row
    hash, carrying (hv, v).  NULL values and NULL ids are excluded (a
    quantile over NULLs is undefined; a NULL id cannot be hashed
    deterministically).  Ties on hv break by v so the kept VALUE
    multiset is deterministic even under (astronomically unlikely)
    60-bit collisions at the pool boundary."""
    w = Window.partitionBy(*group_cols).orderBy("hv", "v")
    return (
        df.filter(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .select(
            *group_cols,
            qsk_hash(F.col(id_col)).alias("hv"),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def qsk_merge(pools: DataFrame, k: int = QSK_K) -> DataFrame:
    """Merge per-group pools into the global sketch: bottom-k by (hv, v)
    of the UNION of pools — exactly equal to the bottom-k of the raw
    corpus (every global-bottom-k row is in its group's bottom-k), the
    property that lets 10,000 partition sketches roll up to any grouping
    without re-reading data.  The window is unpartitioned but its input
    is the <= groups*k pooled rows (WindowGroupLimit-bounded below),
    never the corpus."""
    w = Window.orderBy("hv", "v")
    return (
        pools.select("hv", "v")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def qsk_quantiles(
    pool: DataFrame,
    group_cols: list[str],
    qs: tuple[tuple[float, str], ...] = QSK_QS,
) -> DataFrame:
    """Query the sketch: per group, the pool value at sample rank
    ceil(q * n_kept) for each requested quantile (n_kept < k means the
    group was smaller than the pool — the 'sketch' holds every row and
    the quantile is EXACT).  Output: group_cols + n_kept + one column
    per quantile.  Estimates are corpus values passed through untouched
    (no float arithmetic), so they hash bitwise; the only arithmetic is
    q * n_kept, one IEEE multiply identical in both engines."""
    if group_cols:
        wq = Window.partitionBy(*group_cols).orderBy("v")
    else:
        wq = Window.orderBy("v")
    wn = wq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = pool.withColumn("rnk", F.row_number().over(wq)).withColumn(
        "n_all", F.count(F.lit(1)).over(wn)
    )
    qcols = [
        F.max(
            F.when(
                F.col("rnk")
                == F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n_all"))),
                F.col("v"),
            )
        ).alias(alias)
        for q, alias in qs
    ]
    n_kept = F.count(F.lit(1)).cast("long").alias("n_kept")
    if group_cols:
        return ranked.groupBy(*group_cols).agg(n_kept, *qcols)
    return ranked.agg(n_kept, *qcols)


def hll_corrected(raw: float, empty_buckets: int) -> float:
    """Small-range (linear counting) correction, host-side: when the raw
    estimate is small and empty buckets remain, linear counting is the
    better estimator (Flajolet et al. 2007)."""
    import math

    if raw <= 2.5 * _M and empty_buckets > 0:
        return _M * math.log(_M / empty_buckets)
    return raw
