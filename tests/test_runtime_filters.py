"""Runtime bloom-filter join reduction (InjectRuntimeFilter): the knob a
1000-executor cluster turns on so a selective dimension predicate prunes
the fact scan at RUNTIME, before the shuffle — Spark builds a bloom
filter from the filtered creation side and stamps might_contain onto the
application side's scan.

The default thresholds (creation side >= 10 MB plan size / application
side >= 10 GB scan) are sized for production, so sf0.1 plans never
trigger it silently; these tests lower the thresholds to prove the
ENGINE'S PLANS are runtime-filterable — equi-join keys exposed, no
intervening barrier — and that results are unchanged with the filter
injected (it is a pure reduction, bloom false positives re-checked by
the join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"

_RF_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the application-side gate (default 10 GB) is a LOWER bound — lowered
    # so a 60k-row corpus can demonstrate the plan; the creation-side gate
    # (default 10 MB) is an UPPER bound the filtered orders slice already
    # satisfies, so it stays at its production value
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # broadcast joins don't need (and suppress) runtime filters; force SMJ
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def rf_spark(spark):
    old = {k: spark.conf.get(k, None) for k in _RF_CONFS}
    for k, v in _RF_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _filtered_join(spark):
    """The q3 shape: fact-fact join where one side carries a selective
    predicate — the textbook runtime-filter beneficiary."""
    li = load_table(spark, SF001, "lineitem")
    orders = load_table(spark, SF001, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
    )


def test_selective_fact_join_accepts_runtime_bloom_filter(rf_spark):
    """With the production knob on, the optimizer must inject a bloom
    filter: bloom_filter_agg on the filtered creation side and
    might_contain guarding the fact scan.  If this stops holding (a
    projection/barrier hiding the join keys), the engine's hot join
    shape has silently become runtime-unfilterable at scale."""
    df = _filtered_join(rf_spark)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in optimized, optimized[:2000]
    assert "might_contain" in optimized, optimized[:2000]


def test_runtime_bloom_filter_preserves_results(rf_spark):
    """The injected filter is a pure scan reduction: aggregates with the
    filter on must equal the same plan with the rule disabled."""
    with_filter = {
        (r["o_orderpriority"], r["n"])
        for r in _filtered_join(rf_spark).collect()
    }
    rf_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        without = {
            (r["o_orderpriority"], r["n"])
            for r in _filtered_join(rf_spark).collect()
        }
    finally:
        rf_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert with_filter == without and with_filter
