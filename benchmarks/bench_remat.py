"""Rematerialization sweep on the real chip (round-3 perf experiment).

Measures the geodesic_bd train step (the bench.py config: ResNet50-layer4,
batch 96, 224 px, bf16) under every remat policy (train/remat.py). The
step is HBM-bound with the MXU ~60% idle (BASELINE.md round-2 roofline);
jax.checkpoint policies trade that idle compute for the saved-activation
traffic the 23 GB/step floor assumes — the one semantics-exact lever the
round-2 analysis left untried.

Result (BASELINE.md round 3): every policy loses 15-21% — the refutation
that closed the recompute-scheduling axis.

Usage: python benchmarks/bench_remat.py [mode ...]   (default: all modes)
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

ALL_MODES = ("none", "block", "stage", "conv", "dots", "nothing")


def bench_mode(mode: str, rng) -> dict:
    trainer, state, batch = setup_flagship(
        BATCH, rng=rng, remat=None if mode == "none" else mode,
    )
    step_fn = trainer.train_step_fn("main")

    t_c = time.perf_counter()
    for _ in range(WARMUP_STEPS):
        state, metrics = step_fn(state, batch)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = step_fn(state, batch)
    loss1 = float(metrics["loss"])
    dt = time.perf_counter() - t0

    return {
        "mode": mode,
        "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "compile_plus_warmup_s": round(compile_s, 1),
        "loss_after_warmup": round(loss0, 4),
        "loss_final": round(loss1, 4),
    }


def main() -> None:
    modes = sys.argv[1:] or list(ALL_MODES)
    rng = np.random.default_rng(0)
    results = []
    for mode in modes:
        r = bench_mode(mode, rng)
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["img_per_sec"])
    print(
        json.dumps({"best_mode": best["mode"], "best_img_per_sec": best["img_per_sec"]}),
        flush=True,
    )


if __name__ == "__main__":
    main()
