"""Regression tests for bench.py's orchestrator.

Rounds 2 and 3 both lost driver-captured results to orchestration:
the merged headline printed only at the very end, and wait_device
retried an unresponsive tunnel until the driver's own timeout killed
everything (BENCH_r03.json rc=124, parsed=null). These tests pin the
fixed contract: the headline is emitted to stdout the moment the fox
phase returns, every later phase is strictly additive, and device
probing gives up after a bounded number of attempts.

No device is touched: subprocess.run is monkeypatched.
"""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


FOX_LINE = json.dumps({
    "metric": "fox_nerf_psnr_at_budget", "value": 27.0, "unit": "dB",
    "vs_baseline": 0.9, "extra": {"steps": 1408},
})


class _Result:
    def __init__(self, stdout="", returncode=0):
        self.stdout = stdout
        self.returncode = returncode


def _parse_json_lines(captured: str):
    out = []
    for ln in captured.splitlines():
        if ln.startswith("{"):
            out.append(json.loads(ln))
    return out


def _run_orchestrate(monkeypatch, capsys, behavior):
    """behavior(phase) -> _Result | raise subprocess.TimeoutExpired."""
    calls = {"probes": 0}

    def fake_run(cmd, **kw):
        env = kw.get("env") or {}
        phase = env.get("BENCH_PHASE")
        if phase is None:  # the wait_device probe
            calls["probes"] += 1
            return behavior("__probe__")
        return behavior(phase)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "FOX", str(Path(__file__)))  # exists
    bench.orchestrate()
    return _parse_json_lines(capsys.readouterr().out), calls


def test_headline_emitted_immediately_after_fox(monkeypatch, capsys):
    """A hang in ANY later phase must not lose the fox headline: it is
    printed right after the fox child returns, before the next phase
    starts."""
    seen = []

    def behavior(phase):
        seen.append(phase)
        if phase == "__probe__":
            return _Result(returncode=0)
        if phase == "fox":
            return _Result(stdout=FOX_LINE + "\n")
        # every other phase "hangs" until its timeout with no output
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    assert lines, "no JSON emitted"
    # first emission carries the fox headline already
    assert lines[0]["metric"] == "fox_nerf_psnr_at_budget"
    assert lines[0]["value"] == 27.0
    # the LAST line (what the driver parses) still carries it
    assert lines[-1]["metric"] == "fox_nerf_psnr_at_budget"
    assert lines[-1]["value"] == 27.0


def test_later_phases_are_additive(monkeypatch, capsys):
    def behavior(phase):
        if phase == "__probe__":
            return _Result(returncode=0)
        if phase == "fox":
            return _Result(stdout=FOX_LINE + "\n")
        return _Result(stdout=json.dumps({"ok": phase}) + "\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    final = lines[-1]
    assert final["value"] == 27.0
    for phase in bench.PHASES:
        if phase == "fox":
            continue
        assert final["extra"][phase] == {"ok": phase}
    # and the phase results arrived incrementally, not only at the end
    assert len(lines) >= len(bench.PHASES)


def test_wait_device_gives_up_bounded(monkeypatch, capsys):
    """An unresponsive device after fox must stop the run with the
    captured headline after a BOUNDED number of probes (round 3 spun
    here until the driver killed it)."""

    def behavior(phase):
        if phase == "__probe__":
            return _Result(returncode=1)  # device never answers
        if phase == "fox":
            return _Result(stdout=FOX_LINE + "\n")
        raise AssertionError("phase must not start on a dead device")

    lines, calls = _run_orchestrate(monkeypatch, capsys, behavior)
    assert calls["probes"] <= 4
    assert lines[-1]["value"] == 27.0


def test_fox_timeout_salvages_partial_headline(monkeypatch, capsys):
    """A fox child killed at its timeout after printing the provisional
    headline still yields a parsed result."""

    def behavior(phase):
        if phase == "__probe__":
            return _Result(returncode=0)
        if phase == "fox":
            raise subprocess.TimeoutExpired(
                cmd="bench", timeout=1, output=(FOX_LINE + "\n").encode())
        return _Result(stdout=json.dumps({"ok": phase}) + "\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    assert lines[-1]["metric"] == "fox_nerf_psnr_at_budget"
    assert lines[-1]["value"] == 27.0
    assert "error" in lines[0] or "error" in lines[-1]


def test_total_budget_skips_remaining_phases(monkeypatch, capsys):
    """Once the global budget is spent, no further phase starts, and
    the merged headline is still the last line."""
    monkeypatch.setenv("BENCH_TOTAL_S", "0")  # budget exhausted at once
    started = []

    def behavior(phase):
        if phase == "__probe__":
            return _Result(returncode=0)
        started.append(phase)
        if phase == "fox":
            return _Result(stdout=FOX_LINE + "\n")
        return _Result(stdout="{}\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    assert started == ["fox"]  # fox always runs; nothing after
    assert lines[-1]["value"] == 27.0
