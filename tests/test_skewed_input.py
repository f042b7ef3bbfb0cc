"""Key-skew robustness: real Steam-shaped data is zipf-distributed (one
blockbuster app, a few whale users), and the 100 TB failure mode of
shuffled joins / per-key state / per-key top-k under skew is a straggler
reducer — which at test scale shows up only as a CORRECTNESS question:
do the skew-safe formulations (salting, WindowGroupLimit top-k,
per-key state) still match their oracles when ~50% of the key column
collapses onto one hot key?

The corpus comes from ``scripts/adversarial_data.py skew`` (content-
hash-derived masks, machine-reproducible): 50% of events.user_id and
orders.o_custkey onto one customer key, 50% of documents.source onto
one label.  The full 215-query differential sweep on this corpus is
recorded in DIRTYDATA.md §3; this test pins the operators whose design
exists BECAUSE of skew, plus salted-vs-naive result parity.
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb
import pytest

from bigdatapipeline_steamreviews_spark import REGISTRY, queries
from bigdatapipeline_steamreviews_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_DIR

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from adversarial_data import CORPUS_VERSION  # noqa: E402
from verify_local import compare  # noqa: E402

# Version-suffixed (r7 advice): a skew-column-set change must land in a
# fresh dir — a stale corpus fails test_corpus_is_actually_skewed
# confusingly instead of rebuilding.
SKEW_DIR = f"/tmp/spark_graft_sf_skew_test_{CORPUS_VERSION}"

# The operators whose 100 TB design is skew-motivated.
PROBE = [
    "j3_salted_segment_stats",       # explicit salted join on the hot key
    "flagship_daily_summary",        # groupBy carrying the hot user
    "w4_topk_orders_per_customer",   # per-key top-k over the hot custkey
    "w2_session_stats",              # per-user session windows
    "serving_topn_users",            # global top-N dominated by one user
    "x1_dup_rate_by_source",         # per-source rollup, one hot source
    "a21_modal_order_month",         # per-group argmax with a hot group
    "dq_key_skew_report",            # the skew detector itself, on skew
]


@pytest.fixture(scope="module")
def skew_dir(spark):
    if not os.path.exists(os.path.join(SKEW_DIR, "_DONE")):
        from adversarial_data import _skew, write_flat

        for t in TABLE_NAMES:
            df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            write_flat(_skew(spark, df, t, SF_DIR), SKEW_DIR, t)
        open(os.path.join(SKEW_DIR, "_DONE"), "w").close()
    return SKEW_DIR


@pytest.fixture(scope="module")
def duck(skew_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{skew_dir}/{t}.parquet'"
        )
    return con


def test_corpus_is_actually_skewed(spark, skew_dir):
    """Guard the fixture: the hot user must hold ~half the events — a
    silently-unskewed corpus would make every test below vacuous."""
    from pyspark.sql import functions as F

    for table, key, label in (
        ("events", "user_id", "hot user"),
        ("lineitem", "l_partkey", "hot part"),
    ):
        df = spark.read.parquet(f"{skew_dir}/{table}.parquet")
        top, total = (
            df.groupBy(key)
            .count()
            .agg(F.max("count"), F.sum("count"))
            .collect()[0]
        )
        assert top / total > 0.4, f"{label} holds only {top}/{total}"


@pytest.mark.parametrize("name", PROBE)
def test_skew_sensitive_queries_match_oracle(spark, skew_dir, duck, name):
    queries()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, skew_dir).toPandas()
    spark.catalog.clearCache()
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert problems == [], problems


def test_salted_join_equals_naive_join_under_skew(spark, skew_dir):
    """Salting is pure routing: on the skewed corpus the salted join's
    aggregate must be row-identical to the plain shuffled join's."""
    from pyspark.sql import functions as F

    from bigdatapipeline_steamreviews_spark.functions import sum_exact
    from bigdatapipeline_steamreviews_spark.operators.partitioning import salted_join

    e = spark.read.parquet(f"{skew_dir}/events.parquet").select("user_id", "value")
    c = spark.read.parquet(f"{skew_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    def agg(joined):
        return {
            r.segment: (r.n_events, str(r.total_value))
            for r in joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum_exact("value").alias("total_value"),
            )
            .collect()
        }

    assert agg(salted_join(e, c, "user_id", n_salts=8)) == agg(e.join(c, "user_id"))


def test_aqe_skew_join_splits_hot_partition(spark, skew_dir):
    """AQE's automatic skew-join split — the runtime complement to the
    explicit ``salted_join`` (round-12 verdict ask #6): on the skewed
    corpus, a PLAIN shuffled join with
    ``spark.sql.adaptive.skewJoin.enabled`` must (a) mark the join
    ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead skewed`` in
    the FINAL adaptive plan — i.e. the OptimizeSkewedJoin rule actually
    fired and split the hot partition — and (b) produce the identical
    aggregate as the salted formulation.  Thresholds are scaled down to
    the test corpus (the rule keys on absolute COMPRESSED partition
    bytes, default 256 MB; the production default fires at real scale —
    see PERF.md's x30 skew probe).  Two non-obvious preconditions this
    test documents by needing them:

    * a skewed reduce partition is split along MAP-side shuffle-block
      boundaries, so the big side must arrive from >1 map task — a
      single-file single-row-group parquet scan is one map task and the
      hot partition is one unsplittable block (hence the
      ``repartition(16)``; at real scale thousands of input splits make
      this automatic);
    * AQE decides from runtime shuffle statistics, so the final plan
      exists only after materialization (the §8c lesson).
    """
    from pyspark.sql import functions as F

    from bigdatapipeline_steamreviews_spark.functions import sum_exact
    from bigdatapipeline_steamreviews_spark.operators.partitioning import (
        salted_join,
    )

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        e = (
            spark.read.parquet(f"{skew_dir}/events.parquet")
            .select("user_id", "value")
            .repartition(16)  # >1 map task, see docstring
        )
        c = spark.read.parquet(f"{skew_dir}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )

        def agg(joined):
            return joined.groupBy(
                F.col("c_mktsegment").alias("segment")
            ).agg(
                F.count(F.lit(1)).alias("n_events"),
                sum_exact("value").alias("total_value"),
            )

        naive = agg(e.join(c, "user_id"))
        got = {
            r.segment: (r.n_events, str(r.total_value))
            for r in naive.collect()
        }
        plan = naive._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan and "AQEShuffleRead skewed" in plan, (
            "AQE did not split the hot partition — check thresholds vs "
            "corpus size:\n" + plan[:2000]
        )

        want = {
            r.segment: (r.n_events, str(r.total_value))
            for r in agg(salted_join(e, c, "user_id", n_salts=8)).collect()
        }
        assert got == want, "AQE skew split changed the aggregate"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
