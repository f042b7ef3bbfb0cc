"""Mergeable quantile sketch (a23/a24): rank-error bound, exact merge
identity, exact-when-small, and order-independence — the properties the
sketch trades KLL/GK's space advantage for (operators/sketches.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.sketches import (
    QSK_K,
    QSK_QS,
    qsk_merge,
    qsk_pool,
    qsk_quantiles,
)
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from tests.conftest import SF_DIR

SF001 = "/root/testdata/sf0.01"  # 10k events: sampling genuinely active


def _events(spark, sf=SF001):
    return load_table(spark, sf, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    )


def test_qsk_rank_error_within_hoeffding_bound(spark):
    """The estimate at each q must have true rank within eps*n of q*n,
    eps = sqrt(ln(2/delta) / (2k)) at delta=1e-3 — the Hoeffding bound
    for a simple random sample of size k (mergeable-summaries, PODS
    2012).  The sample is deterministic (hash-ordered), so this is a
    fixed assertion, not a flaky probabilistic one."""
    ev = _events(spark)
    pool = qsk_pool(ev, "value", "event_id", ["event_type"])
    est = {
        r["event_type"]: r.asDict()
        for r in qsk_quantiles(pool, ["event_type"]).collect()
    }
    group_n = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    eps = math.sqrt(math.log(2 / 1e-3) / (2 * QSK_K))
    rows = ev.select("event_type", F.col("value").cast("double").alias("v"))
    for etype, e in est.items():
        n = group_n[etype]
        assert n > QSK_K, "fixture too small for the bound to be meaningful"
        for q, alias in QSK_QS:
            v_hat = e[alias]
            # true rank of the estimate: # of group values <= v_hat
            rank = rows.filter(
                (F.col("event_type") == etype) & (F.col("v") <= F.lit(v_hat))
            ).count()
            assert abs(rank / n - q) <= eps, (
                f"{etype} {alias}: rank {rank}/{n} vs q={q}, eps={eps:.3f}"
            )


def test_qsk_merge_equals_whole_corpus_sketch(spark):
    """bottom-k(union of per-group pools) == bottom-k(raw corpus), row
    for row — the exact-merge identity a24's cross-engine oracle rests
    on (the oracle sketches raw rows; Spark merges group pools)."""
    ev = _events(spark)
    merged = qsk_merge(qsk_pool(ev, "value", "event_id", ["event_type"]))
    direct = qsk_pool(ev, "value", "event_id", [])  # corpus-wide bottom-k
    sym_diff = merged.exceptAll(direct).union(direct.exceptAll(merged))
    assert sym_diff.count() == 0
    assert merged.count() == QSK_K


def test_qsk_exact_when_group_smaller_than_k(spark):
    """A group with fewer than k rows keeps EVERY row, so each quantile
    is the exact order statistic — the n_kept < k contract."""
    ev = _events(spark, SF_DIR).filter(F.col("event_type") == "purchase")
    n = ev.count()
    assert 0 < n <= QSK_K
    got = qsk_quantiles(
        qsk_pool(ev, "value", "event_id", ["event_type"]), ["event_type"]
    ).first()
    assert got["n_kept"] == n
    vals = sorted(r["value"] for r in ev.select("value").collect())
    for q, alias in QSK_QS:
        assert got[alias] == vals[max(1, math.ceil(q * n)) - 1]


def test_qsk_pool_is_partitioning_independent(spark):
    """The pool is a function of the row SET: a 1-partition and a
    17-partition layout of the same rows produce the identical sketch
    (KLL/GK, being compaction-ordered, would not)."""
    ev = _events(spark, SF_DIR).select("event_type", "event_id", "value")
    one = qsk_pool(ev.coalesce(1), "value", "event_id", ["event_type"])
    many = qsk_pool(ev.repartition(17), "value", "event_id", ["event_type"])
    assert one.exceptAll(many).union(many.exceptAll(one)).count() == 0


def test_streaming_qsk_final_state_equals_batch_sketch(spark):
    """Round-14 birth gate: the streaming bottom-k pool's final state,
    queried for quantiles, equals the batch a23 sketch EXACTLY (same
    rows, bitwise) — the merge identity bottom_k(bottom_k(A) ∪ B) ==
    bottom_k(A ∪ B) across whatever micro-batch slicing the replay
    produced.  The registered query shares a23's DuckDB oracle; this
    pins the equivalence engine-internally too (no oracle in the
    loop)."""
    from bigdatapipeline_steamreviews_spark import queries

    regs = queries()
    streamed = regs["stream_quantile_sketch"](spark, SF_DIR).collect()
    batch = regs["a23_quantile_sketch"](spark, SF_DIR).collect()
    assert len(streamed) > 1  # several event_type groups: non-vacuous
    assert streamed == batch


def test_streaming_qsk_pool_state_is_bounded_and_versioned(spark):
    """The emission trace carries <= k rows per (group, version), the
    version stamp n_seen is strictly monotone per group, and the FINAL
    version's pool equals the batch qsk_pool multiset — i.e. state
    really is the fixed-width sketch, not a growing buffer."""
    import tempfile

    from bigdatapipeline_steamreviews_spark.queries_streaming import (
        _stage_events_chunks,
    )
    from bigdatapipeline_steamreviews_spark.streaming.qsketch import (
        streaming_qsk_pools,
    )
    from bigdatapipeline_steamreviews_spark.streaming.summarizer import (
        events_file_stream,
        run_to_memory_table,
    )

    stage = _stage_events_chunks(spark, SF_DIR)
    stream = events_file_stream(spark, stage, max_files_per_trigger=2)
    ckpt = tempfile.mkdtemp(prefix="qsk_test_ckpt_")
    trace = run_to_memory_table(
        streaming_qsk_pools(stream), "qsk_trace_test", ckpt, "update",
        shuffle_partitions=8,
    ).collect()
    by_group: dict = {}
    for r in trace:
        by_group.setdefault(r["event_type"], {}).setdefault(
            r["n_seen"], []
        ).append((r["hv"], r["v"]))
    assert by_group
    batch_pool = qsk_pool(
        load_table(spark, SF_DIR, "events"), "value", "event_id",
        ["event_type"],
    ).collect()
    batch_by_group: dict = {}
    for r in batch_pool:
        batch_by_group.setdefault(r["event_type"], []).append(
            (r["hv"], r["v"])
        )
    for etype, versions in by_group.items():
        for n_seen, rows in versions.items():
            assert len(rows) <= QSK_K
        final = sorted(versions[max(versions)])
        assert final == sorted(batch_by_group[etype])
