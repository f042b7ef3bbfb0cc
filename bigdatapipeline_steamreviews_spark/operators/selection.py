"""Distributed exact selection: nearest-rank quantile thresholds without a
corpus-wide sort.

``Window.orderBy(...)`` with no partitioning funnels every row through ONE
task — the classic scale-killer the r1 quality filter shipped with.  Exact
rank selection doesn't need a global sort: it needs the one value at rank
r, and a two-phase bucketed search finds it touching the corpus only with
map-side work:

1. one aggregate for (min, max, count) — defines rank r = ceil(q*n) and a
   uniform value grid of ``n_buckets`` cells;
2. one partial-aggregatable groupBy counting rows per cell — B rows out;
3. a running sum over the B-row cell table (window over buckets, not rows)
   locates the cell containing rank r and the residual rank k within it;
4. a row-number window over ONLY that cell's rows (~n/B of the corpus,
   broadcast-joined down before the window) yields the k-th smallest value
   exactly.

Every corpus-sized stage is a scan + partial aggregate; the only ordered
windows run over the bucket table (<= n_buckets rows) and one cell.  The
result is bit-identical to ``row_number() OVER (ORDER BY col)`` nearest-rank
selection — this is an exactness-preserving replacement, not an
approximation like ``percentile_approx`` (use that when rank tolerance is
acceptable; use this when an oracle compares exact).

Degenerate distributions (every value identical — the one case where a
value grid cannot split) short-circuit through a union branch that returns
the constant without any per-row window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_quantile_threshold",
    "equi_depth_boundaries",
    "temperature_mixture_weights",
]


def exact_quantile_threshold(
    df: DataFrame,
    col: str | Column,
    q: float,
    n_buckets: int = 1024,
) -> DataFrame:
    """One-row DataFrame ``(threshold double)`` holding the exact
    nearest-rank ``q``-quantile of ``col`` (the value at rank
    ``ceil(q * count)``, 1-based, ascending).  Empty input yields an empty
    (zero-row) result.  Fully lazy — compose with ``F.broadcast`` +
    ``crossJoin`` to filter the corpus against it in one pass.
    """
    from ..caching import persisted_intermediate

    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("double").alias("__v")).filter(F.col("__v").isNotNull())
    # (min, max, count) feeds the degenerate branch, the grid broadcast
    # and the rank arithmetic — each consumer would re-run this full
    # corpus aggregate (a second/third corpus scan at scale; r16, guide
    # §1.2 step 1).  One row, persisted.
    stats = persisted_intermediate(
        vals.agg(
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        ),
        bound="1 row (global min/max/count)",
    )

    # Branch A: all values identical (or a single row) — the threshold is
    # that constant at every rank.
    degenerate = stats.filter(
        (F.col("__n") > 0) & (F.col("__mn") == F.col("__mx"))
    ).select(F.col("__mn").alias("threshold"))

    # Branch B: bucketed two-phase selection over a real value range.
    spread = stats.filter(F.col("__mn") != F.col("__mx"))
    with_b = vals.crossJoin(F.broadcast(spread)).withColumn(
        "__b",
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col("__v") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * n_buckets
            ),
        ).cast("int"),
    )
    # The cell-count table locates the target cell AND (via the running
    # sum) the residual rank; without the persist the corpus-wide count
    # pass re-runs once per consumer lineage (r16).  <= n_buckets rows.
    bucket_counts = persisted_intermediate(
        with_b.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt")),
        bound=f"<= {n_buckets} cell-count rows",
    )
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        bucket_counts.withColumn("__cum", F.sum("__cnt").over(wb))
        .withColumn("__before", F.col("__cum") - F.col("__cnt"))
        .crossJoin(F.broadcast(spread.select("__n")))
        .withColumn("__r", F.ceil(F.lit(q) * F.col("__n")).cast("long"))
    )
    target = cum.filter(
        (F.col("__cum") >= F.col("__r")) & (F.col("__before") < F.col("__r"))
    ).select(
        F.col("__b").alias("__tb"),
        (F.col("__r") - F.col("__before")).alias("__k"),
    )
    # Only the target cell's rows reach the ordered window.
    cands = with_b.join(F.broadcast(target), F.col("__b") == F.col("__tb"))
    wk = Window.orderBy("__v")
    picked = (
        cands.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") == F.col("__k"))
        .select(F.col("__v").alias("threshold"))
    )
    return degenerate.unionAll(picked)


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    size_col: str | Column = "n_tokens",
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus source — the
    domain-mixing computation (UnifiedQA/XLM-R-style alpha-smoothing,
    alpha = 0.5): w_i = sqrt(tokens_i) / sum_j sqrt(tokens_j).  Upweights
    small sources relative to proportional sampling so a training mix
    isn't dominated by the largest crawl slice.

    Bit-exact across engines and partitionings: sqrt is IEEE-754
    correctly-rounded everywhere, the scaled value is snapped to an
    INTEGER (floor(sqrt * 1e8 + 0.5) — exact int64 on both sides), the
    denominator is an integer sum (order-independent), and the weight is
    one int64->double division.  No decimal<->double round-trips to
    disagree on.

    Scale shape: one partial-aggregatable groupBy over the corpus down to
    |sources| rows, then a broadcast of the 1-row denominator — the corpus
    is touched exactly once, map-side.

    Output: group_col, n_docs, total_size, weight (sums to ~1.0).
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size).cast("long").alias("total_size"),
    )
    scaled = per.withColumn(
        "__sk",
        F.floor(F.sqrt(F.col("total_size").cast("double")) * 1e8 + F.lit(0.5)).cast(
            "long"
        ),
    )
    denom = scaled.agg(F.sum("__sk").alias("__denom"))
    return (
        scaled.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            "n_docs",
            "total_size",
            (F.col("__sk").cast("double") / F.col("__denom").cast("double")).alias(
                "weight"
            ),
        )
    )


def equi_depth_boundaries(
    df: DataFrame,
    col: str | Column,
    n_out: int = 10,
    n_cells: int = 1024,
) -> DataFrame:
    """All ``n_out - 1`` nearest-rank quantile boundaries of ``col`` in ONE
    two-phase pass: rows ``(i, boundary)`` for ``i = 1..n_out-1``, where
    ``boundary_i`` is the value at rank ``ceil(i * n / n_out)`` ascending.

    The multi-rank generalization of :func:`exact_quantile_threshold`
    (same cell grid, same running-sum location), with two scale upgrades:
    ranks are computed in exact integer arithmetic ``(i*n + D-1) div D``
    (no float ceil at 10^12 rows), and the per-cell selection window is
    PARTITIONED by (rank, cell) — every ordered window in the plan runs
    over either the <= ``n_cells``-row cell table or one cell's rows,
    never the corpus, even when several ranks land in distinct cells.

    Degenerate input (all values equal) returns that constant at every
    rank; empty input returns no rows.
    """
    from ..caching import persisted_intermediate

    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("double").alias("__v")).filter(F.col("__v").isNotNull())
    # Same multi-consumer corpus aggregate as exact_quantile_threshold
    # (ranks, degenerate branch, grid broadcast x2 lineages) — persisted
    # so the corpus is aggregated once (r16, measured 1.20 -> 0.97 s on
    # a20 together with the cell-count persist below).
    stats = persisted_intermediate(
        vals.agg(
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        ),
        bound="1 row (global min/max/count)",
    )
    ranks = (
        stats.select(
            F.explode(F.sequence(F.lit(1), F.lit(n_out - 1))).alias("i"),
            "__mn",
            "__mx",
            "__n",
        )
        .withColumn(
            "__r",
            F.expr(f"(i * __n + {n_out - 1}) DIV {n_out}"),
        )
        .filter(F.col("__n") > 0)
    )

    degenerate = ranks.filter(F.col("__mn") == F.col("__mx")).select(
        "i", F.col("__mn").alias("boundary")
    )

    spread = stats.filter(F.col("__mn") != F.col("__mx"))
    with_b = vals.crossJoin(F.broadcast(spread)).withColumn(
        "__b",
        F.least(
            F.lit(n_cells - 1),
            F.floor(
                (F.col("__v") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * n_cells
            ),
        ).cast("int"),
    )
    # Located once, consumed by every rank's target join AND the per-cell
    # candidate prune — persisted so the corpus-wide cell count runs once.
    cell_counts = persisted_intermediate(
        with_b.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt")),
        bound=f"<= {n_cells} cell-count rows",
    )
    wb = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cell_counts.withColumn("__cum", F.sum("__cnt").over(wb)).withColumn(
        "__before", F.col("__cum") - F.col("__cnt")
    )
    targets = (
        ranks.filter(F.col("__mn") != F.col("__mx"))
        .join(
            F.broadcast(cum),
            (F.col("__cum") >= F.col("__r")) & (F.col("__before") < F.col("__r")),
        )
        .select(
            "i",
            F.col("__b").alias("__tb"),
            (F.col("__r") - F.col("__before")).alias("__k"),
        )
    )
    cands = with_b.select("__v", "__b").join(
        F.broadcast(targets), F.col("__b") == F.col("__tb")
    )
    wk = Window.partitionBy("i", "__tb").orderBy("__v")
    picked = (
        cands.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") == F.col("__k"))
        .select("i", F.col("__v").alias("boundary"))
    )
    return degenerate.unionAll(picked)
