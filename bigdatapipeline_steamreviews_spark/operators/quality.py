"""Data-quality operators: one-pass column profiling, declarative
constraint checking, winsorized robust statistics, skew-resistant per-key
sampling, and sliding distinct counts.

Builder extensions beyond the reference's surface: the reference ingests
its CSV feed with no validation step at all (``summarizer.py:40-58`` parses
positionally and aggregates whatever arrives), which is exactly the gap a
100 TB training-data pipeline cannot afford — Deequ/Great-Expectations-style
profile + constraint gates run between ingest and training.  Everything
here is pure DataFrame composition (no UDFs, no collect): profiles are one
aggregation pass, constraint counts are partial-aggregatable, and the
per-key sampler is a two-phase window that survives heavy-key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    timestamp_cols: Sequence[str] = (),
) -> DataFrame:
    """Deequ-style one-pass column profile: for every listed column emit
    ``(col, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str)`` — numeric/timestamp columns fill the ``_num`` pair
    (timestamps as epoch seconds), string columns the ``_str`` pair.

    One ``agg`` computes every metric in a single scan; the multiple
    ``countDistinct`` aggregates plan as one Expand + hash aggregate (the
    standard multi-distinct strategy — rows × n_cols intermediate, all
    partial-aggregated map-side, no per-column rescan).  The one-row
    result is then exploded into the per-column report, so the whole
    profile is scan → expand-agg → generate: no joins, no windows, no
    second pass over the fact table.
    """
    ordered = [*numeric_cols, *timestamp_cols, *string_cols]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in ordered:
        col = F.col(c)
        aggs += [
            F.coalesce(F.sum(F.isnull(col).cast("long")), F.lit(0)).alias(f"__nulls_{c}"),
            F.countDistinct(col).alias(f"__nd_{c}"),
        ]
        if c in string_cols:
            aggs += [F.min(col).alias(f"__min_{c}"), F.max(col).alias(f"__max_{c}")]
        else:
            v = (
                F.unix_timestamp(col).cast("double")
                if c in timestamp_cols
                else col.cast("double")
            )
            aggs += [F.min(v).alias(f"__min_{c}"), F.max(v).alias(f"__max_{c}")]
    row = df.agg(*aggs)

    null_num = F.lit(None).cast("double")
    null_str = F.lit(None).cast("string")
    structs = []
    for c in ordered:
        is_str = c in string_cols
        structs.append(
            F.struct(
                F.lit(c).alias("col"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (null_num if is_str else F.col(f"__min_{c}")).alias("min_num"),
                (null_num if is_str else F.col(f"__max_{c}")).alias("max_num"),
                (F.col(f"__min_{c}") if is_str else null_str).alias("min_str"),
                (F.col(f"__max_{c}") if is_str else null_str).alias("max_str"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def constraint_report(rule_counts: Sequence[tuple[str, DataFrame]]) -> DataFrame:
    """Union per-rule violation counts into a ``(rule, n_violations,
    status)`` report.  Each entry is a one-row DataFrame with an
    ``n_violations`` column (an anti-join count, a conditional count, a
    uniqueness delta — whatever the rule needs); rules evaluate
    independently, so Spark runs them as parallel jobs over a shared
    scan where the plans allow.  ``status`` is a string, not a boolean,
    to keep the report's value-hash portable across engines."""
    out = None
    for name, cnt in rule_counts:
        d = cnt.select(
            F.lit(name).alias("rule"),
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        )
        out = d if out is None else out.unionByName(d)
    return out.withColumn(
        "status", F.when(F.col("n_violations") == 0, "pass").otherwise("fail")
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized (clamped-tail) mean per group: values below the
    nearest-rank ``lo`` percentile are raised to it, values above ``hi``
    lowered to it, then the exact-decimal mean — the robust location
    estimate a quality pipeline reports when a handful of garbage rows
    would otherwise drag a plain mean.

    Nearest-rank percentiles (actual data values, not interpolations) keep
    the result bit-exact across engines; the tiny per-group percentile
    table broadcast-joins back onto the fact, so the whole thing is the
    percentile window + one broadcast join + one partial-aggregatable
    groupBy — no second sort, no skew sensitivity beyond the window's.
    """
    from .analytic import nearest_rank_percentiles

    plo, phi = f"p{int(lo * 100)}", f"p{int(hi * 100)}"
    # Non-null measures only, same convention as the percentile operator:
    # Spark's greatest/least IGNORE nulls, so an unfiltered NULL value
    # would silently clamp to the upper bound instead of being excluded.
    df = df.filter(F.col(value_col).isNotNull())
    pct = nearest_rank_percentiles(df, list(group_cols), value_col, tiebreak_col, (lo, hi))
    clamped = df.join(F.broadcast(pct), list(group_cols)).withColumn(
        "__w", F.greatest(F.col(plo), F.least(F.col(phi), F.col(value_col)))
    )
    from ..functions import avg_exact

    return clamped.groupBy(*group_cols).agg(
        F.max(plo).alias(plo),
        F.max(phi).alias(phi),
        F.max("n_rows").alias("n_rows"),
        avg_exact(F.col("__w")).alias("winsorized_mean"),
    )


def per_key_top_hash(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Skew-resistant deterministic per-key top-k under ``order_cols``:
    phase 1 ranks within (key, input-partition) and keeps each group's
    first ``k`` — a heavy key is spread across all scan partitions, so no
    single sort group ever exceeds ~|partition| rows — phase 2 ranks the
    ≤ k·P survivors per key globally.  Correct because every global
    top-k row is necessarily within its (key, partition) group's top-k,
    so phase 1 never drops a survivor; with a content-hash as the order
    column this is the deterministic reservoir sample (same rows on any
    engine, any partitioning, any rerun — ``rand()`` reservoirs are not).
    """
    keys = list(key_cols)
    w1 = Window.partitionBy(*keys, "__part").orderBy(*order_cols)
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    pruned = (
        df.withColumn("__part", F.spark_partition_id())
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__part", "__rn1")
    )
    return pruned.withColumn(rank_name, F.row_number().over(w2)).filter(
        F.col(rank_name) <= k
    )


def sliding_distinct_count(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    out_count: str = "n_distinct",
) -> DataFrame:
    """Trailing ``window_days``-day distinct-id count per observed day —
    the rolling-actives metric COUNT(DISTINCT) window frames cannot
    express and collect_set-over-window cannot survive at scale (a
    100 M-distinct day would materialize the whole set per row).

    Scale shape: dedup to (day, id) pairs first (the only full-cardinality
    shuffle), then explode each pair to the ``window_days`` window-ends it
    feeds — a fixed small fan-out, partial-aggregatable — and count
    distinct per window end.  Window ends are clipped to observed days via
    a broadcast semi-join so the output matches the range-join oracle.
    """
    day = F.date_trunc("day", F.col(ts_col))
    pairs = df.select(day.alias("day"), F.col(id_col).alias("__id")).distinct()
    days = pairs.select("day").distinct().withColumnRenamed("day", "win_end")
    expanded = pairs.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {window_days - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("win_end"),
        "__id",
    )
    clipped = expanded.join(F.broadcast(days), "win_end", "leftsemi")
    return clipped.groupBy("win_end").agg(F.countDistinct("__id").alias(out_count))

# Shared NULL-total events-row checksum serialization — ONE definition for
# the batch (dq_table_checksum) and streaming (stream_table_checksum)
# fingerprints, because the serialization IS the cross-replica contract: a
# change that lands in only one copy silently diverges the two checksums.
# Every field coalesces to an out-of-alphabet chr(1) sentinel (concat_ws-
# style null SKIPPING makes (a, NULL, b) collide with (a, b, NULL);
# ||-style null PROPAGATION silently drops any row containing a NULL from
# the fingerprint).
def events_checksum_row_hash() -> Column:
    """60-bit md5-derived per-row hash of the stable events serialization
    (NULL-total), as a Column over (event_id, user_id, ts, value)."""
    sentinel = F.lit("\x01")
    serial = F.concat_ws(
        "|",
        F.coalesce(F.col("event_id").cast("string"), sentinel),
        F.coalesce(F.col("user_id").cast("string"), sentinel),
        F.coalesce(
            F.floor(F.unix_timestamp(F.col("ts"))).cast("long").cast("string"),
            sentinel,
        ),
        F.coalesce(
            F.floor(F.col("value") * 1000).cast("long").cast("string"), sentinel
        ),
    )
    return F.conv(F.substring(F.md5(serial), 1, 15), 16, 10).cast("long")


EVENTS_CHECKSUM_ORACLE_EXPR = """bit_xor(('0x' || substr(md5(
           coalesce(event_id::VARCHAR, chr(1)) || '|'
           || coalesce(user_id::VARCHAR, chr(1)) || '|'
           || coalesce(CAST(floor(epoch(ts)) AS BIGINT)::VARCHAR, chr(1)) || '|'
           || coalesce(CAST(floor(value * 1000) AS BIGINT)::VARCHAR, chr(1))
       ), 1, 15))::BIGINT)"""


def blob_reconciliation(docs: DataFrame, blobs: DataFrame) -> DataFrame:
    """Catalog-vs-object-store reconciliation: FULL OUTER join of a
    document table ``(doc_id, text)`` against a blob listing
    ``(b_doc_id, blob_bytes)`` (binaryFile metadata — path-derived id +
    listing length, payload never read), every pair classified:

    * ``ok``                     — payload present, byte length matches;
    * ``quarantined_no_payload`` — NULL/empty text, no blob (the x5
      quarantine convention: absent is honest, size-0 is a trap —
      Spark's binaryFile source silently DROPS zero-byte files,
      DIRTYDATA.md §2);
    * ``missing_blob``           — payload expected, no blob found (what
      a zero-byte placeholder would surface as, post-drop);
    * ``orphan_blob``            — a blob with no catalog row, or one
      for a doc the catalog says has no payload;
    * ``size_mismatch``          — blob present, wrong byte length
      (truncation / encoding corruption).

    Returns ``(status, n_docs, total_bytes)`` sorted by status — a
    metadata-sized shuffle join at any scale.  The registered query
    (``dq_blob_reconciliation``) gates the healthy classes against its
    oracle; ``tests/test_quality.py`` exercises every discrepancy class
    with synthetic frames, since a healthy lake never produces them.
    """
    no_payload = F.col("text").isNull() | (F.col("text") == "")
    joined = docs.join(blobs, docs.doc_id == blobs.b_doc_id, "full_outer")
    return (
        joined.select(
            F.when(F.col("doc_id").isNull(), "orphan_blob")
            .when(F.col("b_doc_id").isNull() & no_payload, "quarantined_no_payload")
            .when(F.col("b_doc_id").isNull(), "missing_blob")
            .when(no_payload, "orphan_blob")  # blob exists for a no-payload doc
            .when(F.octet_length(F.col("text")) == F.col("blob_bytes"), "ok")
            .otherwise("size_mismatch")
            .alias("status"),
            F.coalesce(F.col("blob_bytes"), F.lit(0)).alias("n_bytes"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("status")
    )
