"""Spark-4-native surface: VARIANT props ingestion + SQL pipe front-end.

Both queries are oracle-gated (scripts/verify_local.py); these tests pin
the properties the oracle can't see: the variant path stays JVM-side (no
Python UDF in the plan), and the three front-ends (Column API via the
sql_ classic view, pipe SQL) agree bitwise on the same session.
"""

from __future__ import annotations

from bigdatapipeline_steamreviews_spark.queries_relational import (
    sql_q1_pricing_summary,
)
from bigdatapipeline_steamreviews_spark.queries_spark4 import (
    p19_variant_props,
    sql_pipe_pricing_summary,
)

SF_DIR = "/root/testdata/sf0.001"


def test_variant_query_stays_jvm_side(spark):
    df = p19_variant_props(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert rows, "variant query returned no groups"
    for r in rows:
        # every synthetic props blob carries k and nothing at $.absent
        assert r.n_with_k == r.n_events
        assert r.n_absent_path == 0
        assert r.k_min <= r.k_max


def test_pipe_sql_matches_classic_sql_bitwise(spark):
    classic = sql_q1_pricing_summary(spark, SF_DIR)
    piped = sql_pipe_pricing_summary(spark, SF_DIR)
    assert classic.columns == piped.columns
    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    a = sorted(classic.collect(), key=key)
    b = sorted(piped.collect(), key=key)
    assert a == b  # Row equality is exact, doubles included
