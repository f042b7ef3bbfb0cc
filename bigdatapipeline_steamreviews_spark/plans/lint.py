"""Physical-plan lint rules (see package docstring for intent).

Each rule is a (name, detector, rationale) over the executed-plan string.
Detectors are TEXT heuristics by design: they check the same rendering a
human audits with ``.explain``, need no private Spark APIs, and stay stable
across minor versions.  A finding is a scale smell, not always a bug — the
caller decides (e.g. a deliberate BroadcastNestedLoopJoin of a 1-row
aggregate is fine and is NOT flagged; a CartesianProduct never is).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["Finding", "plan_text", "audit", "assert_clean"]


@dataclass(frozen=True)
class Finding:
    rule: str
    detail: str


def plan_text(df: DataFrame) -> str:
    """The executed physical plan as text (what .explain prints)."""
    return df._jdf.queryExecution().executedPlan().toString()


def _cartesian_product(plan: str) -> str | None:
    if "CartesianProduct" in plan:
        return (
            "CartesianProduct: an O(n*m) shuffled cross join — a join "
            "condition was lost or could not push into a hash join"
        )
    return None


def _python_row_eval(plan: str) -> str | None:
    if "BatchEvalPython" in plan:
        return (
            "BatchEvalPython: row-at-a-time Python UDF on the data path — "
            "10-100x slower than builtin expressions or Arrow-batched "
            "pandas UDFs"
        )
    return None


def _single_partition_window(plan: str) -> str | None:
    # A Window fed by Exchange SinglePartition funnels its whole input
    # through one task. Legitimate for bucket/vocab-sized inputs; always
    # worth an explicit decision, so flagged when a Window node's OWN
    # input exchange is SinglePartition.  Children print below the parent,
    # so the window's input exchange is the first Exchange line after the
    # Window line (a hash-partitioned window shows hashpartitioning
    # there; unrelated exchanges deeper in the tree come later).
    if "Exchange SinglePartition" not in plan:
        return None
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "WindowGroupLimit" in line:
            continue
        for below in lines[i + 1 :]:
            if "Exchange" in below:
                if "SinglePartition" in below:
                    return (
                        "Window over Exchange SinglePartition: every input "
                        "row passes through ONE task — acceptable only for "
                        "pre-aggregated (vocabulary/bucket-sized) inputs"
                    )
                break
    return None


_RULES = (
    ("cartesian-product", _cartesian_product),
    ("python-row-eval", _python_row_eval),
    ("single-partition-window", _single_partition_window),
)


def audit(df: DataFrame, allow: tuple[str, ...] = ()) -> list[Finding]:
    """Run every lint rule against ``df``'s compiled plan; return findings
    (empty list = clean).  ``allow`` suppresses named rules for plans where
    the smell is a documented decision (e.g. a vocabulary-sized ranking
    window legitimately trips ``single-partition-window``)."""
    plan = plan_text(df)
    findings = []
    for rule, detect in _RULES:
        if rule in allow:
            continue
        detail = detect(plan)
        if detail is not None:
            findings.append(Finding(rule, detail))
    return findings


def assert_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``AssertionError`` listing findings unless the plan is clean."""
    findings = audit(df, allow)
    if findings:
        raise AssertionError(
            "plan lint failed:\n"
            + "\n".join(f"  [{f.rule}] {f.detail}" for f in findings)
        )
