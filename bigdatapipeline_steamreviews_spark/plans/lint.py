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

__all__ = ["Finding", "plan_text", "audit", "audit_text", "assert_clean"]


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


def _name_start(line: str) -> int:
    """Index where a plan line's node name begins (past the tree-drawing
    prefix of spaces, ``+- `` connectors and ``:``/``|`` rails)."""
    i = 0
    while i < len(line) and line[i] in " +-:|":
        i += 1
    return i


def _top_level_bracket_groups(s: str) -> list[str]:
    """The contents of ``[...]`` groups opening at nesting depth 0 in
    ``s`` — the argument lists of a plan node's simpleString.  ``Window``
    prints ``[windowExprs], [partitionSpec], [orderSpec]``, but EMPTY
    specs are omitted from the rendering, so two groups is ambiguous:
    partition-only (count/sum over a partition, no order) or order-only
    (unpartitioned ranking).  Callers disambiguate by content — an order
    spec always carries ``ASC NULLS``/``DESC NULLS`` tokens."""
    depth = 0
    groups: list[str] = []
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
            if depth == 0 and start >= 0:
                groups.append(s[start:i])
                start = -1
    return groups


def _is_order_spec(group: str) -> bool:
    return " ASC NULLS " in f" {group} " or " DESC NULLS " in f" {group} "


_BOUNDED_INPUT_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "AggregateInPandas",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalLimit",
    "WindowGroupLimit",
)

# Python/Arrow stages with ARBITRARY fan-out: the UDF may return any
# number of rows per input group/batch, so nothing below them can
# vouch for the output's row count — a bounded aggregate under a
# MapInPandas proves nothing about what the pandas fn emits above it.
# Treated like Generate: conservatively UNBOUNDED (round-13 ADVICE fix
# — the pass-through fallback let these silence the unpartitioned-
# window rule, the same false-negative class the round-12 fix closed
# for Generate/Join/Union).  False positives go to the allowlist with
# the boundedness documented, never a silent pass.  AggregateInPandas
# is NOT here: it is a grouped reduction (one row per key) and sits in
# _BOUNDED_INPUT_NODES, which is checked first.
_REEXPANDING_PYTHON_NODES = (
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
    "MapInPandas",
    "MapInArrow",
    "EvalPythonUDTF",  # BatchEvalPythonUDTF / ArrowEvalPythonUDTF
)


def _children(lines: list[str], i: int) -> list[int]:
    """Indices of the DIRECT children of the plan node at ``lines[i]``:
    the minimally-indented lines inside its subtree (Spark's tree text
    indents each child level by a fixed step, siblings equally)."""
    start = _name_start(lines[i])
    out: list[int] = []
    child_indent = None
    for j in range(i + 1, len(lines)):
        if not lines[j].strip():
            continue
        d = _name_start(lines[j])
        if d <= start:
            break
        if child_indent is None or d < child_indent:
            child_indent = d
            out = [j]
        elif d == child_indent:
            out.append(j)
    return out


def _subtree_bounded(lines: list[str], i: int) -> bool:
    """Structural boundedness of the plan subtree rooted at ``lines[i]``
    — "output row count does not scale with the corpus", the property
    that makes an unpartitioned Window above it safe.  Recursive, with
    row-RE-EXPANDING operators handled honestly (round-12 ADVICE fix —
    the round-11 version accepted a bounded node ANYWHERE below the
    Window, so an aggregate under an explode or a fan-out join silenced
    the rule while bounding nothing):

    - aggregate / limit / WindowGroupLimit nodes bound their subtree
      (the round-11 approximation: a keyed aggregate is 'bounded' by its
      key cardinality — documented, kept);
    - a JOIN (any flavor, incl. CartesianProduct) is bounded iff ALL its
      children are: bounded x bounded stays bounded (the day-spine /
      bucket-table pattern), anything x corpus does not;
    - a UNION is a sum of its children — bounded iff ALL of them are
      (an aggregate unioned with a corpus scan bounds nothing);
    - a Generate is bounded only for a ``sequence(...)`` spine over a
      bounded input — a value-range expansion (calendar days), not a
      data re-expansion; ``explode(collect_list(...))`` re-inflates to
      corpus scale and is unbounded no matter what sits below it.
      (Known approximation: a sequence computed in an upstream Project
      and exploded as a named column prints ``Generate explode(col)``
      and is conservatively treated as unbounded — a false POSITIVE,
      fixed by an allowlist entry, never a silent pass);
    - a pandas/Arrow map or flatMap stage (MapInPandas,
      FlatMapGroupsInPandas*, MapInArrow, python UDTF eval) has
      arbitrary fan-out — the UDF decides the output row count — so it
      is conservatively unbounded regardless of its input (round-13
      ADVICE fix; AggregateInPandas, a one-row-per-key reduction, stays
      in the bounded set);
    - leaves (file scans, stream sources) are unbounded; other nodes
      pass their child's verdict through.

    Node names are read past any whole-stage-codegen star (``*(5)
    SortMergeJoin``) — non-AQE and final adaptive plans render them
    starred, and a head parse that stopped at ``*`` would silently
    degrade the Join/Generate/Union rules to the permissive
    any-child fallback.
    """
    line = lines[i]
    name = line[_name_start(line):]
    if name.startswith("*("):
        name = name.split(") ", 1)[1] if ") " in name else name
    if any(node in name for node in _BOUNDED_INPUT_NODES):
        return True
    if any(node in name for node in _REEXPANDING_PYTHON_NODES):
        return False
    kids = _children(lines, i)
    head = name.split(" ", 1)[0].split("(", 1)[0]
    if head == "Generate":
        return "sequence(" in name and all(
            _subtree_bounded(lines, k) for k in kids
        )
    if "Join" in head or head in ("CartesianProduct", "Union"):
        return bool(kids) and all(_subtree_bounded(lines, k) for k in kids)
    if not kids:
        return False
    return any(_subtree_bounded(lines, k) for k in kids)


def _unpartitioned_window(plan: str) -> str | None:
    # A Window with NO partition spec serializes its entire input through
    # one task (the "WARN WindowExec: No Partition Defined" at runtime).
    # That is fine — and common — when the input is structurally bounded:
    # an aggregate output (vocab tables, bucket tables, day spines) or a
    # limit.  It is a 100-TB outage when a corpus-scale frame flows in, so
    # flag any unpartitioned Window whose input subtree is not bounded
    # per _subtree_bounded (round-11: pins the boundedness the round-10
    # verdict found documented-but-unenforced; round-12: recursive
    # re-expansion-aware boundedness).  Differs from
    # single-partition-window: that keys on the input Exchange, which
    # vanishes when the input is already single-partition (post-limit,
    # 1-row aggregate) — this keys on the Window node itself.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        start = _name_start(line)
        if not line[start:].startswith("Window ") or "WindowGroupLimit" in line:
            continue
        groups = _top_level_bracket_groups(line[start:])
        if len(groups) >= 3:
            continue  # [exprs], [partitionSpec], [orderSpec]
        if len(groups) == 2 and not _is_order_spec(groups[1]):
            continue  # [exprs], [partitionSpec] — partitioned, no order
        if not all(_subtree_bounded(lines, k) for k in _children(lines, i)):
            return (
                "Window with no partition spec over a subtree that is not "
                "structurally bounded (an aggregate/limit below may be "
                "re-expanded by an explode/join/union/pandas-flatMap above "
                "it): the whole (possibly corpus-scale) input funnels "
                "through ONE task — partition the window, or bound its "
                "input, or allowlist with the boundedness documented"
            )
    return None


_RULES = (
    ("cartesian-product", _cartesian_product),
    ("python-row-eval", _python_row_eval),
    ("single-partition-window", _single_partition_window),
    ("unpartitioned-window", _unpartitioned_window),
)


def audit(df: DataFrame, allow: tuple[str, ...] = ()) -> list[Finding]:
    """Run every lint rule against ``df``'s compiled plan; return findings
    (empty list = clean).  ``allow`` suppresses named rules for plans where
    the smell is a documented decision (e.g. a vocabulary-sized ranking
    window legitimately trips ``single-partition-window``)."""
    return audit_text(plan_text(df), allow)


def audit_text(plan: str, allow: tuple[str, ...] = ()) -> list[Finding]:
    """:func:`audit` over already-derived plan text — the rules are pure
    functions of the text, so a caller that has compiled the registry's
    plans once (the drift-snapshot pass) can lint from the same pass
    instead of re-invoking every query (round-14 suite wall-time fix:
    the two registry-wide gates each re-derived all ~213 plans)."""
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
