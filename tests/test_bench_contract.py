"""Driver-contract tests for bench.py's headline emission.

The driver parses the LAST line of the merged stdout/stderr tail as the
graded JSON record (BENCH_r01.json is the known-good shape; round 3's
early print produced ``parsed: null``). These tests pin the success path
(JSON line last, exactly one), the budget-skip path (a ``skipped`` field
names what did not run — VERDICT r3 weakness #6), and the failure path,
without touching jax or the TPU.
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_BENCH = Path(__file__).resolve().parents[1] / "bench.py"


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(bench_mod, capsys, fns, budget):
    # deadline=0 disables the wall-clock thread; signal handlers no-op off
    # the main thread, and pytest runs on the main thread anyway
    emitter = bench_mod._HeadlineEmitter(
        {"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 1.0},
        deadline=0.0)
    emitter.run_secondaries(tuple(fns), budget=budget)
    return emitter, capsys.readouterr()


def test_success_path_json_is_last_and_only_stdout_line(bench_mod, capsys):
    ran = []
    _, cap = _run(bench_mod, capsys, [lambda: ran.append(1)], budget=1e9)
    lines = [l for l in cap.out.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be exactly one JSON line: {lines}"
    rec = json.loads(lines[-1])
    assert rec["value"] == 1.0 and rec["vs_baseline"] == 1.0
    assert "skipped" not in rec  # complete run carries no skip marker
    assert ran == [1]


def test_budget_skip_is_named_in_the_json_line(bench_mod, capsys):
    def never_runs():  # pragma: no cover - must be skipped
        raise AssertionError("budget guard failed")

    # budget=0: we're already past it when run_secondaries checks
    _, cap = _run(bench_mod, capsys, [never_runs], budget=0.0)
    rec = json.loads(cap.out.splitlines()[-1])
    assert rec["skipped"] == ["budget:never_runs"]
    assert "skipping never_runs" in cap.err


def test_secondary_failure_is_named_but_does_not_sink_the_line(bench_mod, capsys):
    def boom():
        raise RuntimeError("secondary crash")

    ran = []
    _, cap = _run(bench_mod, capsys, [boom, lambda: ran.append(1)], budget=1e9)
    rec = json.loads(cap.out.splitlines()[-1])
    assert rec["skipped"] == ["failed:boom"]
    assert ran == [1], "a failed secondary must not stop later ones"


def test_emit_is_idempotent(bench_mod, capsys):
    emitter = bench_mod._HeadlineEmitter(
        {"metric": "m", "value": 2.0, "unit": "u", "vs_baseline": 0.5},
        deadline=0.0)
    emitter.emit()
    emitter.emit()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1


def test_stderr_log_lines_never_reach_stdout(bench_mod, capsys):
    bench_mod.log("[bench] some secondary detail")
    _, cap = _run(bench_mod, capsys, [], budget=1e9)
    assert "[bench]" not in cap.out
