"""Physical-layout scale claims, made checkable: bucketed tables join with
no exchange and no sort; partitioned serving tables prune to the matching
directories under time-drilldown filters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatapipeline_steamreviews_spark.operators.serving import with_date_parts
from bigdatapipeline_steamreviews_spark.sources.layout import (
    read_partitioned,
    write_bucketed_table,
    write_partitioned,
)
from bigdatapipeline_steamreviews_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "orders_b", "o_orderkey", 4, str(base / "orders_b"))
    write_bucketed_table(l, "lineitem_b", "l_orderkey", 4, str(base / "lineitem_b"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange_or_sort(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    o, l = spark.table(o_name), spark.table(l_name)
    joined = o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Both sides pre-shuffled on the join key at write time: the
    # sort-merge join runs with NO exchange on either side — the shuffle
    # (the expensive stage at 100 TB) was paid once by the write and is
    # amortized over every future join.  (Per-bucket sorts remain: Spark
    # only trusts sortBy file order when each bucket is a single file.)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan
    # And the answer is still the join's answer.
    assert joined.count() == l.count()


def test_unbucketed_join_pays_the_exchanges(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = (
        o.hint("merge")
        .join(l, o.o_orderkey == l.l_orderkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The contrast case: same join over plain parquet shuffles both sides.
    assert plan.count("Exchange hashpartitioning") == 2


def test_partitioned_serving_table_prunes(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serving_parted") / "daily")
    daily = with_date_parts(
        load_table(spark, SF_DIR, "orders").select(
            F.col("o_orderdate").alias("time"), "o_orderkey", "o_totalprice"
        ),
        "time",
    )
    write_partitioned(daily, path, "time_year", "time_month")

    back = read_partitioned(spark, path).filter(
        (F.col("time_year") == 1995) & (F.col("time_month") == 3)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # Drilldown filters must land in PartitionFilters (directory pruning),
    # not in post-scan Filter nodes reading the whole table.
    assert "PartitionFilters" in plan
    assert "time_year#" in plan.split("PartitionFilters", 1)[1][:400]
    expected = daily.filter(
        (F.col("time_year") == 1995) & (F.col("time_month") == 3)
    ).count()
    assert back.count() == expected
