"""Plan auditing: the engine's scale rules, runnable against any DataFrame.

The 100 TB discipline this repo writes into its operators (broadcast the
dims, never cartesian, keep the hot path in codegen, never funnel a corpus
through one ordered window) is only enforceable if it can be CHECKED — in
tests, in CI, or interactively before shipping a query.  This package turns
those rules into a lint over the compiled physical plan:

    from bigdatapipeline_steamreviews_spark import plans
    findings = plans.audit(df)       # [] when clean
    plans.assert_clean(df)           # raises with the findings otherwise

Heuristics operate on the executed-plan text — the same artifact a human
reads from ``df.explain("formatted")`` — so they are cheap, dependency-free,
and match what plan-shape tests already assert (tests/test_plans.py runs
``audit`` across every registered batch query).
"""

from .lint import Finding, assert_clean, audit, audit_text, plan_text

__all__ = ["Finding", "audit", "audit_text", "assert_clean", "plan_text"]
