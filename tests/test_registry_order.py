"""Registration-order policy tests (registry.py).

The driver checks a bounded window of queries in registration order, so
ordering is a verification-coverage mechanism: the flagship first, then
RED queries (driver-checked but never green — a diagnosed fix must be
re-proven in the very next window), then a 1:1 interleave of
never-driver-checked births and stalest-green rechecks, so neither a
burst of new registrations nor a deep stale backlog can starve the
other out of the window (the r5 failure mode).
"""

from __future__ import annotations

import json

from bigdatapipeline_steamreviews_spark import registry
from bigdatapipeline_steamreviews_spark.registry import (
    _PRIORITY_PREFIXES,
    _driver_signal,
    _last_green_rounds,
    queries,
)


def test_last_green_rounds_parses_driver_artifacts(tmp_path):
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}
    red_hash = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    errored = {"rows_match": False, "schema_match": False, "hash_match": False, "err": "boom"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": green, "b": red_hash, "c": rows_only, "d": green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"a": green, "b": green, "e": errored})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json {")

    got = _last_green_rounds(tmp_path)
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_last_green_rounds_empty_dir(tmp_path):
    assert _last_green_rounds(tmp_path) == {}


def test_flagship_registers_first():
    assert next(iter(queries())) == "flagship_daily_summary"


def test_red_queries_take_the_front_of_the_window():
    """Against the real repo artifacts: any query the driver has checked
    but NEVER passed sorts immediately after the flagship — a diagnosed
    failure's fix is re-proven in the very next round's window."""
    names = list(queries())
    last_green, ever_checked = _driver_signal()
    red = {n for n in names if n in ever_checked and n not in last_green}
    if not red:
        return
    positions = {n: i for i, n in enumerate(names)}
    max_red = max(positions[n] for n in red)
    non_red_after_flagship = [
        positions[n] for n in names[1:] if n not in red
    ]
    assert max_red < min(non_red_after_flagship)


def test_window_interleaves_births_and_stale_rechecks():
    """The r5 lesson, pinned: while BOTH buckets (never-driver-checked
    births; stalest-green rechecks) are non-empty, every prefix of the
    post-red order contains a balanced mix (counts differ by at most 1),
    so neither bucket can starve the other out of the driver's ~50-slot
    window."""
    names = list(queries())
    last_green, ever_checked = _driver_signal()
    tail = [
        n
        for n in names[1:]
        if not (n in ever_checked and n not in last_green)  # drop red
    ]
    n_never = sum(1 for n in tail if n not in ever_checked)
    n_stale = len(tail) - n_never
    seen_never = seen_stale = 0
    for n in tail:
        if n not in ever_checked:
            seen_never += 1
        else:
            seen_stale += 1
        if seen_never < n_never and seen_stale < n_stale:
            assert abs(seen_never - seen_stale) <= 1, (
                f"unbalanced prefix at {n}: "
                f"{seen_never} births vs {seen_stale} rechecks"
            )


def test_stale_rechecks_are_stalest_first():
    """Within the recheck bucket, a query last green in round k outranks
    one last green in round k+1 — the rotation that burns the backlog."""
    names = list(queries())
    last_green = _last_green_rounds()
    rounds_in_order = [last_green[n] for n in names[1:] if n in last_green]
    assert rounds_in_order == sorted(rounds_in_order)


def test_priority_surface_outranks_relational_tail_within_same_staleness():
    from bigdatapipeline_steamreviews_spark.registry import (
        _NEVER_FIRST_PREFIXES,
    )

    names = list(queries())
    last_green = _last_green_rounds()
    by_staleness: dict[tuple, list[str]] = {}
    for i, n in enumerate(names[1:]):
        key = (n in last_green, last_green.get(n, 0))
        by_staleness.setdefault(key, []).append(n)
    for group in by_staleness.values():
        seen_tail = False
        for n in group:
            if n.startswith(_PRIORITY_PREFIXES):
                assert not seen_tail, f"priority query {n} sorted after tail"
            elif not n.startswith(_NEVER_FIRST_PREFIXES):
                # zero-signal families (src_/dq_/p19_) legitimately FRONT
                # the never bucket (r6 ask #1) — they are not 'tail', so
                # a priority birth sorting after one is policy, not a bug
                seen_tail = True


def test_every_query_has_oracle_or_documented_exception():
    """Every registered query is either oracle-backed or one of the known
    non-SQL-expressible rows-only entries."""
    queries()
    rows_only = {n for n, s in registry.REGISTRY.items() if s.oracle is None}
    assert rows_only <= {
        "x3_cosine_topk_ivf",
        "stream_sessionization",
        "stream_daily_summary_watermarked",
    }, f"unexpected rows-only queries: {rows_only}"


def test_documented_counts_match_registry():
    """README.md and COVERAGE.md state the registry size in prose; the r4
    verdict caught them undercounting after new registrations.  Pin the
    documented numbers to the live registry: every count-like claim in
    those files must mention the actual number, and the actual
    query/oracle counts must be equal (full oracle coverage)."""
    import re
    from pathlib import Path

    q = queries()
    oracles = {n for n, s in registry.REGISTRY.items() if s.oracle is not None}
    assert len(oracles) == len(q), "a registered query lost its oracle"

    root = Path(__file__).resolve().parent.parent
    n = str(len(q))
    for doc in ("README.md", "COVERAGE.md"):
        text = (root / doc).read_text()
        claims = re.findall(r"\b1\d\d\b(?= named queries| DuckDB| queries| registered)", text)
        for c in claims:
            assert c == n, f"{doc} claims {c} queries; registry has {n}"
        assert n in text, f"{doc} no longer states the registry size {n}"


def test_zero_signal_families_front_the_never_bucket():
    """Within the never-driver-checked bucket, names from families with
    zero hard driver signal anywhere (src_*, dq_*, p19_*) sort before
    never-checked names whose operator families already have driver-green
    siblings — they convert the most soft evidence per window slot."""
    from bigdatapipeline_steamreviews_spark.registry import _NEVER_FIRST_PREFIXES

    names = list(queries())
    _, ever_checked = _driver_signal()
    never_in_order = [n for n in names[1:] if n not in ever_checked]
    seen_other = False
    for n in never_in_order:
        if n.startswith(_NEVER_FIRST_PREFIXES):
            assert not seen_other, f"zero-signal query {n} sorted after other births"
        else:
            seen_other = True


def test_births_per_round_within_cap():
    """Registration-growth policy (r6 verdict ask #5): at most
    MAX_BIRTHS_PER_ROUND new registrations per round.  'New this round'
    means present in the registry but absent from the newest committed
    LOCAL_VERIFY_r*.json sweep — the sweep is re-stamped and committed
    whenever the registry changes, so the last round's artifact is the
    baseline.  Skips when no sweep artifact exists (fresh clone)."""
    import re
    from pathlib import Path

    from bigdatapipeline_steamreviews_spark.registry import MAX_BIRTHS_PER_ROUND

    root = Path(__file__).resolve().parent.parent
    sweeps = {}
    for path in root.glob("LOCAL_VERIFY_r*.json"):
        m = re.search(r"_r0*(\d+)(?:_|\.json$)", path.name)
        if m:
            sweeps.setdefault(int(m.group(1)), []).append(path)
    if not sweeps:
        return
    # Anchor the baseline EXPLICITLY on the last completed driver round
    # (the newest CORRECTNESS_r*.json: the driver stamps it when a round
    # closes), not on file-list position (r7 advice): "second-newest
    # sweep" conflates two rounds of births the moment the current round
    # stamps its sweep early or a past round closed without stamping.
    # The baseline is the newest sweep at-or-before that round; if a
    # round ever closed sweep-less, the nearest earlier sweep over-counts
    # births — a cap trip that is loud, never a silent undercount.
    driver_rounds = [
        int(m.group(1))
        for p in root.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"_r0*(\d+)\.json$", p.name))
    ]
    last_driver_round = max(driver_rounds) if driver_rounds else max(sweeps)
    candidates = [r for r in sweeps if r <= last_driver_round]
    prev_round = max(candidates) if candidates else min(sweeps)
    baseline: set = set()
    for path in sweeps[prev_round]:
        baseline |= set(json.loads(path.read_text())["results"])
    births = set(queries()) - baseline
    assert len(births) <= MAX_BIRTHS_PER_ROUND, (
        f"{len(births)} queries registered since the round-{prev_round} sweep "
        f"exceed the {MAX_BIRTHS_PER_ROUND}/round cap: {sorted(births)}"
    )


def test_bench_r1_comparable_prefix_is_pinned():
    """The first 20 entries of BENCH_QUERIES are the r1-comparable series:
    the 0.74x-vs-baseline claim rests on this prefix matching
    BENCH_r01.json's query set AND order.  Reordering or substituting any
    of the first 20 must fail here, not silently skew the comparison."""
    from pathlib import Path

    from bench import BENCH_QUERIES

    root = Path(__file__).resolve().parent.parent
    r1 = json.loads((root / "BENCH_r01.json").read_text())["parsed"]["queries"]
    assert BENCH_QUERIES[:20] == list(r1), (
        "BENCH_QUERIES[:20] no longer matches the BENCH_r01.json series"
    )


def test_bench_queries_are_registered():
    """Every bench headline query must exist in the registry — a renamed
    or dropped query must fail HERE, not as a silent bench error entry
    (the round-3 failure class)."""
    from bench import BENCH_QUERIES

    missing = set(BENCH_QUERIES) - set(queries())
    assert not missing, f"bench references unregistered queries: {missing}"
