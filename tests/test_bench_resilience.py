"""bench.py outage resilience (round-5 ask #1).

The TPU tunnel's failure mode is an indefinite hang inside backend init
(CLAUDE.md), which blanked the driver's BENCH_r04 record. bench.py now runs
a supervise() parent that never imports jax itself: it probes the backend in
a killable subprocess (own process group, so tunnel helper processes die
with it), retries within a bounded budget, distinguishes hangs from hard
env failures, and emits ONE structured JSON line on final failure. These
tests exercise the supervisor's control flow with the expensive pieces
monkeypatched, plus the real probe/group-kill against live subprocesses.
"""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_run_group_kills_whole_group_on_timeout():
    """A hung child AND its own children must die at the timeout — orphaned
    tunnel helpers otherwise poison every retry in the budget."""
    bench = _load_bench()
    t0 = time.monotonic()
    # child spawns a grandchild in the same (new) session, then hangs. A
    # shell child, not a Python one: interpreter startup on a loaded box
    # runs 2.5-5 s (measured), which outlives any snappy timeout and kills
    # the child before it ever prints the grandchild pid.
    rc, out, _ = bench._run_group(
        ["/bin/sh", "-c", "sleep 600 & echo $!; wait"],
        timeout_s=2.0,
    )
    assert rc is None  # timeout, not exit
    assert time.monotonic() - t0 < 30
    grandchild_pid = int(out.strip().splitlines()[0])
    # the grandchild was in the killed process group
    for _ in range(50):
        alive = (
            subprocess.run(
                ["kill", "-0", str(grandchild_pid)], capture_output=True
            ).returncode
            == 0
        )
        if not alive:
            break
        time.sleep(0.1)
    assert not alive, "grandchild survived the group kill"


def test_probe_discriminates_hang_from_hard_error(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(
        bench, "_run_group", lambda cmd, t: (None, "", "")
    )
    assert bench._probe_backend(1.0) == "timeout"
    monkeypatch.setattr(
        bench, "_run_group", lambda cmd, t: (1, "", "ImportError: no jax")
    )
    assert bench._probe_backend(1.0) == "error"
    monkeypatch.setattr(bench, "_run_group", lambda cmd, t: (0, "", ""))
    assert bench._probe_backend(1.0) == "ok"


def test_probe_passes_on_live_backend(monkeypatch):
    bench = _load_bench()
    # The probe child inherits this process's env. Force it onto the CPU
    # backend (filter the axon sitecustomize out of PYTHONPATH — CLAUDE.md
    # recipe) so the test exercises "backend comes up fine" regardless of
    # the real tunnel's state of the day.
    import os

    kept = [
        p
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    monkeypatch.setenv("PYTHONPATH", os.pathsep.join(kept))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._probe_backend(300.0) == "ok"


def test_supervise_emits_structured_failure_line(monkeypatch, capsys):
    """Dead tunnel for the whole budget -> ONE parseable JSON line with
    error=tpu_unavailable and exit code 0 (the driver must get a parsed
    record, not a traceback + rc=1)."""
    bench = _load_bench()
    monkeypatch.setenv("MMR_BENCH_BUDGET_S", "0.2")
    probes = []

    def probe(t):
        probes.append(t)
        return "timeout"

    monkeypatch.setattr(bench, "_probe_backend", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench.supervise()
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None
    # attempts reported == probes actually made
    assert rec["attempts"] == len(probes) >= 1


def test_supervise_fails_fast_on_hard_backend_error(monkeypatch, capsys):
    """A deterministic env failure (import error) must NOT burn the outage
    budget nor be mislabeled tpu_unavailable."""
    bench = _load_bench()
    monkeypatch.setenv("MMR_BENCH_BUDGET_S", "900")
    calls = []

    def probe(t):
        calls.append(t)
        return "error"

    monkeypatch.setattr(bench, "_probe_backend", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    t0 = time.monotonic()
    assert bench.supervise() == 0
    assert time.monotonic() - t0 < 30
    assert len(calls) == 2  # confirmed twice, then fail fast
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["error"] == "backend_error"


def test_supervise_retries_then_succeeds(monkeypatch, capsys):
    """Probe fails twice (outage), then recovers; the measurement line from
    the child must be relayed verbatim."""
    bench = _load_bench()
    monkeypatch.setenv("MMR_BENCH_BUDGET_S", "60")
    probes = iter(["timeout", "timeout", "ok"])
    monkeypatch.setattr(bench, "_probe_backend", lambda t: next(probes))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    payload = json.dumps({"metric": "m", "value": 1.0, "unit": "u"})
    monkeypatch.setattr(bench, "_run_child", lambda t: payload)
    assert bench.supervise() == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out == [payload]


def test_bench_child_runs_end_to_end_on_cpu(monkeypatch):
    """The REAL measurement child (`bench.py --child`) in smoke mode on the
    CPU backend: config build, jitted init, compiled main-phase steps, and
    the JSON record all execute. Guards the flagship bench path against
    bitrot between (possibly tunnel-blocked) rounds."""
    import os

    env = dict(os.environ)
    kept = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([str(REPO), *kept])
    env["JAX_PLATFORMS"] = "cpu"
    env["MMR_BENCH_SMOKE"] = "1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--child"],
        capture_output=True,
        text=True,
        timeout=480,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")][-1]
    rec = json.loads(line)
    assert rec["smoke"] is True
    assert rec["platform"] == "cpu"  # the honesty guard records the backend
    assert rec["value"] > 0


def test_run_child_extracts_last_json_line(monkeypatch):
    """The child may print compile-cache chatter around the record; the
    supervisor must still find the JSON line, and reject garbage/rc!=0."""
    bench = _load_bench()
    good = "warming up\nnot { json\n" + json.dumps({"value": 2}) + "\n"
    monkeypatch.setattr(bench, "_run_group", lambda cmd, t: (0, good, ""))
    assert json.loads(bench._run_child(5))["value"] == 2
    monkeypatch.setattr(
        bench, "_run_group", lambda cmd, t: (0, "no json at all\n", "")
    )
    assert bench._run_child(5) is None
    monkeypatch.setattr(
        bench, "_run_group", lambda cmd, t: (1, json.dumps({"value": 3}), "")
    )
    assert bench._run_child(5) is None
    monkeypatch.setattr(
        bench, "_run_group", lambda cmd, t: (None, "", "")
    )
    assert bench._run_child(5) is None
