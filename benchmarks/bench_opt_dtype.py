"""optimizer_dtype sweep on the real chip (round-3, VERDICT item 5).

Measures the geodesic_bd step (bench.py config) with f32 vs bf16 Adam
first-moment storage (presets.build_optimizer optimizer_dtype). Result
(BASELINE.md round 3): bf16 +0.7% at 224px; the default flipped after the
learning validation (validate_opt_dtype.py) held too.

Usage: python benchmarks/bench_opt_dtype.py [float32 bfloat16 ...]
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


def bench(opt_dtype: str, rng) -> dict:
    trainer, state, batch = setup_flagship(
        BATCH, rng=rng, optimizer_dtype=opt_dtype,
    )
    step_fn = trainer.train_step_fn("main")
    for _ in range(WARMUP_STEPS):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return {
        "optimizer_dtype": opt_dtype,
        "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "loss_final": round(loss, 4),
    }


def main() -> None:
    dtypes = sys.argv[1:] or ["float32", "bfloat16"]
    rng = np.random.default_rng(0)
    for d in dtypes:
        print(json.dumps(bench(d, rng)), flush=True)


if __name__ == "__main__":
    main()
