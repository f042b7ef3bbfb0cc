"""Query registry: every implemented operator from SURVEY.md §2 as a named
(PySpark query, DuckDB oracle SQL) pair.

This is the engine's public query surface *and* its correctness contract:
the driver runs each ``QuerySpec.fn(spark, sf_dir)`` against
``QuerySpec.oracle`` (ANSI SQL on the same parquet, executed by DuckDB) and
hash-compares results.  Column aliases therefore match exactly on both sides.

Oracle-portability conventions (see functions.columns for the Spark halves):
* doubles aggregate through exact DECIMAL(28,10) then one cast to double,
  so sums/avgs are bitwise identical regardless of partitioning;
* hashes are md5-based (bit-identical in every engine);
* every query has a deterministic output (explicit tie-breaks on key
  columns) so value-hash comparison is stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators.aggregations import daily_summary
from .sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    """One registered query: Spark implementation + DuckDB oracle + docs."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    survey_ids: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    survey_ids: tuple[str, ...],
    description: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        REGISTRY[name] = QuerySpec(fn, oracle, survey_ids, description or fn.__doc__ or "")
        return fn

    return deco


# Shared SQL fragments: deterministic sum/mean — exact decimal sum, then a
# string round-trip to double (correctly rounded in every engine; a direct
# decimal->double cast is not once the scaled int exceeds 2^53), then for
# mean one double division (mirror of functions.columns.avg_exact/sum_exact).
def _sum_exact_sql(expr: str) -> str:
    return f"((sum(CAST({expr} AS DECIMAL(28,10)))::VARCHAR)::DOUBLE)"


def _avg_exact_sql(expr: str) -> str:
    return f"({_sum_exact_sql(expr)} / count({expr}))"


def _count_if_sql(pred: str) -> str:
    return f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"


# ---------------------------------------------------------------------------
# Flagship: A1-A4 windowed daily summary (the reference's core query).
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT
  event_type,
  date_trunc('day', ts) + INTERVAL 1 DAY AS time,
  {_avg_exact_sql('value')} AS A_value,
  {_avg_exact_sql('value / 60.0')} AS A_value_hours,
  {_avg_exact_sql("json_extract_string(props, '$.k')")} AS A_k,
  count(value) AS T_events,
  {_count_if_sql('value > 100.0')} AS T_high,
  {_count_if_sql('value < 50.0')} AS T_low,
  {_count_if_sql("event_type IN ('purchase', 'signup')")} AS T_conversions
FROM events
GROUP BY 1, 2
"""


@register(
    "flagship_daily_summary",
    FLAGSHIP_ORACLE,
    ("A1", "A2", "A3", "A4", "P2", "P4", "P5", "P6", "P8", "T1"),
    "Reference summarizer core: 1-day tumbling-window groupBy(event_type) "
    "with avg/count/count-if aggregates (summarizer.py:61-100).",
)
def flagship_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_summary(load_table(spark, sf_dir, "events"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    _ensure_all_registered()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (omitting non-SQL-expressible)."""
    _ensure_all_registered()
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


_loaded = False

# Registration-order policy.  The driver's correctness harness checks a
# bounded window of queries in registration order (round 1 recorded exactly
# the first 50 of 75), so the order below is a verification-coverage
# decision, not cosmetics.  Rank, ascending:
#
#   1. the flagship (also the ``entry()`` smoke query);
#   2. RED queries — checked by the driver in some past round but never
#      green (a diagnosed failure whose fix must be re-proven takes the
#      very next window);
#   3. a 1:1 INTERLEAVE of (a) queries with no driver row in ANY past
#      ``CORRECTNESS_r*.json`` (a newly added operator earns its
#      driver-checked gate row in the round it is born) and (b) everything
#      else by STALENESS (the last round with a green driver row,
#      ascending).  The interleave is the r5 lesson: a pure
#      never-checked-first policy let one round's ~99 new registrations
#      consume the whole 50-slot window and starve the stale backlog
#      indefinitely.  Alternating slots guarantees each bucket at least
#      ~half the window regardless of how many queries a round adds, so
#      re-verification debt drains even while the surface grows; when one
#      bucket empties, all slots flow to the other.
#
# Staleness rotation (not family-first) is what moves the window: after an
# environment break is fixed, the un-broken queries are exactly the stale
# ones, and they must re-enter the checked window no matter which family
# they're in.  Hard driver signal thus accumulates over the whole registry
# instead of re-checking a fixed prefix forever.  Within each bucket the
# north-star surface (X1-X5, streaming, review) breaks ties ahead of the
# relational/analytic extension shapes.
#
# NB the repo-root ``CORRECTNESS_r*.json`` driver artifacts are therefore a
# LOAD-BEARING input to registration order: deleting one makes its greens
# look stale (harmless — they re-queue for checking), but an artifact that
# goes unparseable silently drops a whole round's signal (it is skipped,
# by design, rather than crashing import).  The ``reg_index`` tie-break
# keeps the order deterministic regardless.
_PRIORITY_PREFIXES = ("x1_", "x2_", "x3_", "x4_", "x5_", "stream_", "review_")

# Within the never-driver-checked bucket, the surfaces with zero hard
# driver signal for their whole FAMILY (the dq_* data-quality queries, the
# src_* scan variants, and the p19 VARIANT twin) take the front slots —
# every other never-checked name at least has driver-green siblings
# exercising the same operator code, so these convert the most soft
# evidence to hard per window slot (r6 verdict ask #1).
_NEVER_FIRST_PREFIXES = ("src_", "dq_", "p19_")

# Registration-growth cap: at most this many new query registrations per
# round once the r6/r7 freeze lifts.  The r5 failure mode was ~99 births
# in one round consuming the driver's entire ~50-slot window; the 1:1
# interleave halves that risk, but a birth burst still displaces stale
# rechecks one-for-one.  Ten births/round keeps >=80% of the window
# burning verification debt.  Enforced by
# tests/test_registry_order.py::test_births_per_round_within_cap against
# the previous round's committed LOCAL_VERIFY sweep.
MAX_BIRTHS_PER_ROUND = 10


def _driver_signal(root=None) -> tuple[dict[str, int], set]:
    """(last_green, ever_checked): last_green maps name -> most recent round
    whose CORRECTNESS_r{N}.json has a fully green row (no err; every
    *_match flag present is True); ever_checked is every name with ANY
    driver row (green or red).  Reads the repo-root driver artifacts;
    absent/unparseable files mean no signal."""
    import json
    import re
    from pathlib import Path

    root = Path(root) if root is not None else Path(__file__).resolve().parents[1]
    last_green: dict[str, int] = {}
    ever_checked: set = set()
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r0*(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ever_checked.add(name)
            if row.get("err"):
                continue
            flags = [
                row[k]
                for k in ("rows_match", "schema_match", "hash_match")
                if row.get(k) is not None
            ]
            if flags and all(flags):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, ever_checked


def _last_green_rounds(root=None) -> dict[str, int]:
    """Green-rounds half of :func:`_driver_signal` (kept for tests)."""
    return _driver_signal(root)[0]


def _ensure_all_registered() -> None:
    """Import every module that contributes @register'ed queries, then fix
    the registration order per the policy above (stable within groups)."""
    global _loaded
    if _loaded:
        return
    from . import queries_serving  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_analytic  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_reviews  # noqa: F401
    from . import queries_sources  # noqa: F401
    from . import queries_quality  # noqa: F401
    from . import queries_spark4  # noqa: F401

    last_green, ever_checked = _driver_signal()
    reg_index = {name: i for i, name in enumerate(REGISTRY)}

    def tiebreak(name: str) -> tuple:
        priority = 0 if name.startswith(_PRIORITY_PREFIXES) else 1
        return (priority, reg_index[name])

    names = [n for n in REGISTRY if n != "flagship_daily_summary"]
    red = sorted(
        (n for n in names if n in ever_checked and n not in last_green), key=tiebreak
    )
    never = sorted(
        (n for n in names if n not in ever_checked),
        key=lambda n: (0 if n.startswith(_NEVER_FIRST_PREFIXES) else 1, *tiebreak(n)),
    )
    stale = sorted(
        (n for n in names if n in last_green),
        key=lambda n: (last_green[n], *tiebreak(n)),
    )

    ordered = ["flagship_daily_summary"] + red
    a, b = iter(never), iter(stale)
    take_never = True
    nv, st = next(a, None), next(b, None)
    while nv is not None or st is not None:
        if take_never and nv is not None:
            ordered.append(nv)
            nv = next(a, None)
        elif st is not None:
            ordered.append(st)
            st = next(b, None)
        else:
            ordered.append(nv)
            nv = next(a, None)
        take_never = not take_never

    for name in ordered:
        REGISTRY[name] = REGISTRY.pop(name)

    _loaded = True


def _min_label_sql(rounds: int = 12, edges: str = "edges") -> str:
    """Oracle-side connected components WITHOUT a recursive CTE: ``rounds``
    statically-unrolled one-hop min-label propagation steps over an
    ``edges(src, dst)`` CTE, ending in ``cl(node, cluster_id)``.

    The natural transitive-closure recursion (``reach(node, lbl)`` with
    UNION) carries EVERY reachable label per node — O(n^2) rows on a
    single n-node component, which made the entity-resolution oracle
    unrunnable at sf0.1 (one 15,000-node component -> 225M label pairs).
    Plain propagation keeps exactly one label per node per round; each
    round is one join + group over |edges| rows, and convergence takes
    diameter rounds (measured 6 at sf0.1; ``rounds`` carries 2x margin).
    Exactness stays loud, not silent: if a graph ever needs more than
    ``rounds`` hops, the oracle's labels are stale and the hash gate
    FAILS against Spark's run-to-fixpoint operator — the fix is raising
    ``rounds``, visible in the failing row.

    Each level is MATERIALIZED: levels are referenced twice (carry +
    neighbor min), and inlined CTEs would re-expand the whole prefix
    exponentially.
    """
    parts = [
        f"l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM {edges})"
    ]
    for k in range(rounds):
        parts.append(
            f"""l{k + 1} AS MATERIALIZED (
  SELECT l.node, least(l.lbl, coalesce(m.mn, l.lbl)) AS lbl
  FROM l{k} l LEFT JOIN (
    SELECT e.dst AS node, min(x.lbl) AS mn
    FROM {edges} e JOIN l{k} x ON x.node = e.src GROUP BY e.dst
  ) m ON m.node = l.node
)"""
        )
    parts.append(f"cl AS (SELECT node, lbl AS cluster_id FROM l{rounds})")
    return ",\n".join(parts)
