"""The bench CI contract: rc stays 0 for isolated failures (the round
driver treats rc != 0 as a total abort), but failures are loud — per-query
stderr lines, a SUMMARY line, and the JSON n_err field a CI consumer must
check."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_all_green_run():
    payload, rc, lines = bench.summarize({"q1": 1.5, "q2": 0.5}, {}, 2, "0.1")
    assert rc == 0 and lines == []
    assert payload["value"] == 2.0
    assert payload["n_ok"] == 2 and payload["n_err"] == 0
    assert payload["queries"] == {"q1": 1.5, "q2": 0.5}
    assert payload["sf"] == 0.1


def test_single_failure_keeps_rc0_but_is_loud():
    payload, rc, lines = bench.summarize(
        {"q1": 1.0, "q2": 2.0}, {"q3": "ValueError: boom"}, 4, "0.1"
    )
    assert rc == 0  # isolated failure must never abort the round's signal
    assert payload["n_err"] == 1 and payload["queries"]["q3"] == {"err": "ValueError: boom"}
    assert any(line.startswith("bench: ERROR q3:") for line in lines)
    assert lines[-1].startswith("bench: SUMMARY n_err=1 of 4")


def test_broad_collapse_fails_rc():
    _, rc, lines = bench.summarize(
        {"q1": 1.0}, {"q2": "e", "q3": "e", "q4": "e"}, 4, "0.1"
    )
    assert rc == 1  # fewer than half produced a timing: total abort is right
    assert lines[-1].startswith("bench: SUMMARY n_err=3")


def test_summary_absent_when_clean():
    _, _, lines = bench.summarize({"q1": 1.0}, {}, 1, "weird-sf")
    assert lines == []
