"""bench.py artifact-shape tests (no Spark session needed).

The driver records bench.py's single JSON line as BENCH_r{N}.json and the
judge reads ``value`` as the headline total.  The contract under failure:
a partial query set must NEVER produce a numeric total (it would read as
a perf win), while a warmup-only error must not void an otherwise
complete run.
"""

from __future__ import annotations

import json

from bench import build_output


def test_complete_run_reports_total():
    out = build_output({"q1": 1.5, "q2": 2.25}, {}, 2, "/root/testdata/sf0.1")
    assert out["value"] == 3.75
    assert out["n_completed"] == 2
    assert out["n_queries"] == 2
    assert out["sf"] == 0.1
    assert "incomplete" not in out
    assert "errors" not in out


def test_partial_run_nulls_the_total():
    out = build_output(
        {"q1": 1.5}, {"q2": "AnalysisException: boom"}, 2, "/root/testdata/sf0.1"
    )
    assert out["value"] is None
    assert out["incomplete"] is True
    assert out["n_completed"] == 1
    assert out["errors"] == {"q2": "AnalysisException: boom"}
    # per-query times for the completed queries are still recorded
    assert out["queries"] == {"q1": 1.5}


def test_warmup_only_error_keeps_the_total():
    out = build_output(
        {"q1": 1.5, "q2": 2.0},
        {"__warmup__": "Py4JError: x"},
        2,
        "/root/testdata/sf0.1",
    )
    assert out["value"] == 3.5
    assert "incomplete" not in out
    assert out["errors"] == {"__warmup__": "Py4JError: x"}


def test_output_is_json_serializable():
    out = build_output({}, {"q1": "err"}, 1, "/root/testdata/sf0.01")
    assert json.loads(json.dumps(out)) == out
    assert out["value"] is None


def test_samples_and_spread_are_recorded():
    """r7 verdict What's-wrong #1: the artifact itself must carry the
    per-query variance band (all samples + max-min spread), so a headline
    swing can be attributed to contention vs code from BENCH_r{N}.json
    alone.  ``value``/``queries`` stay the best-of-N minima — the
    r1-comparable series must not change meaning."""
    out = build_output(
        {"q1": 1.5, "q2": 2.0},
        {},
        2,
        "/root/testdata/sf0.1",
        samples={"q1": [1.8, 1.5, 1.6], "q2": [2.0, 2.4, 2.2]},
    )
    assert out["value"] == 3.5  # still the sum of minima
    assert out["samples"] == {"q1": [1.8, 1.5, 1.6], "q2": [2.0, 2.4, 2.2]}
    assert out["spread"] == {"q1": 0.3, "q2": 0.4}
    assert json.loads(json.dumps(out)) == out


def test_samples_are_optional_for_backward_shape():
    out = build_output({"q1": 1.0}, {}, 1, "/root/testdata/sf0.1")
    assert "samples" not in out and "spread" not in out
