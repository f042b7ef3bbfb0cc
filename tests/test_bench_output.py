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
