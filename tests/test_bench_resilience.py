"""bench.py outage resilience (round-5 ask #1).

The TPU tunnel's failure mode is an indefinite hang inside backend init
(CLAUDE.md), which blanked the driver's BENCH_r04 record. bench.py now runs
a supervise() parent that never imports jax itself: it probes the backend in
a killable subprocess, retries within a bounded budget, and emits ONE
structured JSON line on final failure. These tests exercise the supervisor's
control flow with the expensive pieces monkeypatched, plus the real probe
against a subprocess that hangs (simulating the tunnel's observed behavior).
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_times_out_on_hanging_backend(monkeypatch):
    """A backend whose init hangs forever must be detected within the
    timeout, not hung on — the exact BENCH_r04 failure mode."""
    bench = _load_bench()
    # stand in a hanging `import jax` with a sleeping child
    real_run = bench.subprocess.run

    def fake_run(cmd, **kw):
        assert kw.get("timeout") is not None
        return real_run(
            [sys.executable, "-c", "import time; time.sleep(60)"], **kw
        )

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    import time

    t0 = time.monotonic()
    assert bench._probe_backend(1.0) is False
    assert time.monotonic() - t0 < 10


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
    assert bench._probe_backend(300.0) is True


def test_supervise_emits_structured_failure_line(monkeypatch, capsys):
    """Dead tunnel for the whole budget -> ONE parseable JSON line with an
    `error` key and exit code 0 (the driver must get a parsed record, not a
    traceback + rc=1)."""
    bench = _load_bench()
    monkeypatch.setenv("MMR_BENCH_BUDGET_S", "0.2")
    monkeypatch.setattr(bench, "_probe_backend", lambda t: False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench.supervise()
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None
    assert rec["attempts"] >= 1


def test_supervise_retries_then_succeeds(monkeypatch, capsys):
    """Probe fails twice (outage), then recovers; the measurement line from
    the child must be relayed verbatim."""
    bench = _load_bench()
    monkeypatch.setenv("MMR_BENCH_BUDGET_S", "60")
    probes = iter([False, False, True])
    monkeypatch.setattr(bench, "_probe_backend", lambda t: next(probes))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    payload = json.dumps({"metric": "m", "value": 1.0, "unit": "u"})
    monkeypatch.setattr(bench, "_run_child", lambda t: payload)
    assert bench.supervise() == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out == [payload]


def test_run_child_extracts_last_json_line():
    """The child may print compile-cache chatter around the record; the
    supervisor must still find the JSON line, and reject garbage."""
    bench = _load_bench()

    class FakeProc:
        returncode = 0
        stderr = ""
        stdout = "warming up\nnot { json\n" + json.dumps({"value": 2}) + "\n"

    real = bench.subprocess.run
    try:
        bench.subprocess.run = lambda *a, **k: FakeProc()
        assert json.loads(bench._run_child(5))["value"] == 2
        FakeProc.stdout = "no json at all\n"
        assert bench._run_child(5) is None
        FakeProc.returncode = 1
        FakeProc.stdout = json.dumps({"value": 3})
        assert bench._run_child(5) is None
    finally:
        bench.subprocess.run = real
