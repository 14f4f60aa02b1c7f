"""Dual-stream BN step cost on the real chip (round 5).

The reference's dual-loader scripts run model(real) and model(render) as
two separate forwards (learnGeodesicBDModel.py:116-121); Trainer.fit now
reproduces that exactly (steps.make_train_step dual_stream_bn) whenever a
render loader is present. This measures what the reference-exact protocol
costs vs the single-forward concat at the same total batch: two 48-image
forward/backward passes chained through the BN running-stat EMA instead of
one 96-image pass.

Round-5 addition: the fused execution of the SAME per-stream semantics
(steps._fused_dual_stream_apply — one vmapped full-batch forward, EMA chain
composed algebraically) measured against the literal sequential form.

Usage: python benchmarks/bench_dual_stream.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.common import setup_flagship

BATCH = 96
WARMUP_STEPS = 3
MEASURE_STEPS = 40


def bench(dual: bool, rng, fused: bool = True) -> dict:
    trainer, state, batch = setup_flagship(
        BATCH, rng=rng, bn_stream_fused=fused
    )
    step_fn = trainer.train_step_fn("main", dual_stream=dual)
    for _ in range(WARMUP_STEPS):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "dual_stream": dual,
        "impl": ("fused" if fused else "sequential") if dual else "single",
        "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "loss_final": round(loss, 4),
    }


def main() -> None:
    rng = np.random.default_rng(0)
    print(json.dumps(bench(False, rng)), flush=True)
    # the literal two-forward protocol vs the vmapped fused execution of
    # the same semantics (steps._fused_dual_stream_apply)
    print(json.dumps(bench(True, rng, fused=False)), flush=True)
    print(json.dumps(bench(True, rng, fused=True)), flush=True)


if __name__ == "__main__":
    main()
