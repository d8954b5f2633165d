"""Regression tests for bench.py's orchestrator.

Rounds 2-4 all lost driver-captured results to orchestration: the
merged headline printed only at the very end (r2/r3), and round 4's
`subprocess.PIPE` buffered the fox child's provisional headline until
phase completion — so the driver's kill mid-phase lost everything
(BENCH_r04.json rc=124, parsed=null). These tests pin the fixed
contract at two levels:

1. REAL child processes (BENCH_ONLY=selftest): child emissions are
   streamed to the orchestrator's stdout as they happen, so killing
   the orchestrator mid-phase (the driver's kill) still leaves a
   parseable merged headline on record — the exact failure mode the
   round-4 fakes could not see.
2. In-process fakes for control-flow invariants: t=0 pending emission,
   additive extras, bounded device probing, global-budget skipping.
"""

import io
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

BENCH_PY = str(Path(__file__).resolve().parents[1] / "bench.py")

FOX_LINE = json.dumps({
    "metric": "fox_nerf_psnr_at_budget", "value": 27.0, "unit": "dB",
    "vs_baseline": 0.9, "extra": {"steps": 1408},
})


def _parse_json_lines(captured: str):
    out = []
    for ln in captured.splitlines():
        if ln.startswith("{"):
            out.append(json.loads(ln))
    return out


# --------------------------------------------------------------------
# Level 1: real child processes through the real streaming pipe
# --------------------------------------------------------------------

def _spawn_orchestrator(extra_env):
    env = {**os.environ, **extra_env}
    env.pop("BENCH_PHASE", None)
    return subprocess.Popen([sys.executable, BENCH_PY], env=env,
                            stdout=subprocess.PIPE, text=True)


def test_kill_orchestrator_mid_phase_keeps_streamed_headline():
    """THE round-4 failure mode: the driver SIGKILLs the whole tree
    mid-phase. The child's emissions must already be on the
    orchestrator's stdout — nothing buffered until phase completion."""
    p = _spawn_orchestrator({"BENCH_ONLY": "selftest",
                             "BENCH_SELFTEST_SLEEP_S": "600"})
    lines, child_pid = [], None
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            ln = p.stdout.readline()
            if not ln:
                break
            if not ln.startswith("{"):
                continue
            lines.append(json.loads(ln))
            st = lines[-1].get("extra", {}).get("selftest")
            if isinstance(st, dict) and st.get("selftest") == "alive":
                child_pid = st.get("pid")
                break
        # the driver's kill, mid-phase, while the child still sleeps
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=30)
    finally:
        if child_pid:
            try:
                os.killpg(os.getpgid(child_pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError, OSError):
                pass
        if p.poll() is None:
            p.kill()
    assert lines, "orchestrator never emitted anything"
    # t=0 pending headline arrived before any phase finished
    assert lines[0]["metric"] in ("bench_pending", "fox_nerf_psnr_at_budget")
    # the mid-phase child emission was streamed through before the kill
    last = lines[-1]
    assert last["extra"]["selftest"]["selftest"] == "alive"


def test_phase_timeout_kills_child_and_keeps_captured():
    """A phase overrunning its timeout is killed (whole process group)
    and everything it streamed before the kill is kept."""
    p = _spawn_orchestrator({"BENCH_ONLY": "selftest",
                             "BENCH_SELFTEST_SLEEP_S": "600",
                             "BENCH_PHASE_TMO": "3"})
    out, _ = p.communicate(timeout=120)
    lines = _parse_json_lines(out)
    assert p.returncode == 0
    last = lines[-1]
    assert last["extra"]["selftest"]["selftest"] == "alive"
    assert last["extra"]["phase_status"]["selftest"].startswith("killed")


# --------------------------------------------------------------------
# Level 2: in-process control-flow invariants (fake Popen)
# --------------------------------------------------------------------

class _FakePopen:
    """Stands in for a phase child: yields stdout lines, then either
    returns rc or 'hangs' (raises TimeoutExpired from wait)."""

    def __init__(self, stdout_lines="", rc=0, hang=False):
        self.stdout = io.StringIO(stdout_lines)
        self.pid = -99999  # os.getpgid fails -> falls back to kill()
        self._rc = rc
        self._hang = hang
        self.returncode = rc

    def wait(self, timeout=None):
        if self._hang:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)
        return self._rc

    def kill(self):
        pass


def _run_orchestrate(monkeypatch, capsys, behavior, probe_rc=0):
    """behavior(phase) -> _FakePopen. Probes via subprocess.run."""
    calls = {"probes": 0, "started": []}

    class _ProbeResult:
        def __init__(self, rc):
            self.returncode = rc

    def fake_run(cmd, **kw):
        calls["probes"] += 1
        return _ProbeResult(probe_rc)

    def fake_popen(cmd, **kw):
        phase = (kw.get("env") or {}).get("BENCH_PHASE")
        calls["started"].append(phase)
        return behavior(phase)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "FOX", str(Path(__file__)))  # exists
    bench.orchestrate()
    return _parse_json_lines(capsys.readouterr().out), calls


def test_pending_headline_at_t0_and_fox_merges(monkeypatch, capsys):
    """The FIRST emission happens before any phase runs (a kill during
    the first phase can never leave parsed=null), and the fox child's
    streamed line replaces it."""

    def behavior(phase):
        if phase == "fox":
            return _FakePopen(FOX_LINE + "\n")
        return _FakePopen(json.dumps({"ok": phase}) + "\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    assert lines[0]["metric"] == "bench_pending"
    assert lines[0]["value"] == 0.0
    assert lines[-1]["metric"] == "fox_nerf_psnr_at_budget"
    assert lines[-1]["value"] == 27.0


def test_later_phases_are_additive(monkeypatch, capsys):
    def behavior(phase):
        if phase == "fox":
            return _FakePopen(FOX_LINE + "\n")
        return _FakePopen(json.dumps({"ok": phase}) + "\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    final = lines[-1]
    assert final["value"] == 27.0
    for phase in bench.PHASES:
        if phase in ("fox", "selftest"):
            continue
        assert final["extra"][phase] == {"ok": phase}
    # and the phase results arrived incrementally, not only at the end
    assert len(lines) > len(bench.PHASES)


def test_wait_device_gives_up_bounded(monkeypatch, capsys):
    """An unresponsive device after fox must stop the run with the
    captured headline after a BOUNDED number of probes (round 3 spun
    here until the driver killed it)."""

    def behavior(phase):
        if phase == "fox":
            return _FakePopen(FOX_LINE + "\n")
        raise AssertionError("phase must not start on a dead device")

    lines, calls = _run_orchestrate(monkeypatch, capsys, behavior,
                                    probe_rc=1)
    assert calls["probes"] <= 4
    assert lines[-1]["value"] == 27.0


def test_fox_timeout_keeps_streamed_provisional(monkeypatch, capsys):
    """A fox child killed at its timeout after streaming a provisional
    headline still yields that headline in the merged output."""

    def behavior(phase):
        if phase == "fox":
            return _FakePopen(FOX_LINE + "\n", hang=True)
        return _FakePopen(json.dumps({"ok": phase}) + "\n")

    lines, _ = _run_orchestrate(monkeypatch, capsys, behavior)
    assert lines[-1]["metric"] == "fox_nerf_psnr_at_budget"
    assert lines[-1]["value"] == 27.0
    assert lines[-1]["extra"]["phase_status"]["fox"].startswith("killed")


def test_total_budget_skips_remaining_phases(monkeypatch, capsys):
    """Once the global budget is spent, no further phase starts, and
    the merged headline is still the last line."""
    monkeypatch.setenv("BENCH_TOTAL_S", "0")  # budget exhausted at once

    def behavior(phase):
        if phase == "fox":
            return _FakePopen(FOX_LINE + "\n")
        return _FakePopen("{}\n")

    lines, calls = _run_orchestrate(monkeypatch, capsys, behavior)
    assert calls["started"] == ["fox"]  # fox always runs; nothing after
    assert lines[-1]["value"] == 27.0
