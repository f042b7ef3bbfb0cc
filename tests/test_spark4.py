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


def test_lateral_topk_decorrelates_to_rank_limit(spark):
    """The LATERAL ORDER BY/LIMIT subquery must compile to a partitioned
    rank-limit (WindowGroupLimit map-side pruning + one exchange), not a
    per-customer nested-loop re-scan of orders."""
    from bigdatapipeline_steamreviews_spark.queries_relational import (
        j7_lateral_topk_orders,
    )

    plan = (
        j7_lateral_topk_orders(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recursive_ewma_matches_scalar_fold(spark):
    """The recursive-CTE EWMA must equal a scalar IEEE fold over each
    user's (ts, event_id)-ordered first-32 values BITWISE (Python floats
    are the same doubles; 0.5*x + 0.5*acc is the identical op sequence)."""
    from bigdatapipeline_steamreviews_spark.queries_relational import (
        sql_recursive_user_ewma,
    )
    from bigdatapipeline_steamreviews_spark.sources.tables import load_table

    rec = {r.user_id: (r.ewma, r.n_events) for r in
           sql_recursive_user_ewma(spark, SF_DIR).collect()}

    raw = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .filter("value IS NOT NULL")
        .collect()
    )
    by_user = {}
    for r in sorted(raw, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    assert set(rec) == set(by_user)
    for uid, vals in by_user.items():
        vals = vals[:32]
        acc = vals[0]
        for x in vals[1:]:
            acc = 0.5 * x + 0.5 * acc
        assert rec[uid] == (acc, len(vals)), f"user {uid} diverged"
