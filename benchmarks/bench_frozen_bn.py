"""frozen_bn fast-mode measurement on the real chip (round 4, VERDICT #4).

Measures the geodesic_bd step (bench.py config/protocol) with normal
train-mode BatchNorm vs frozen_bn=True (eval-mode BN: running statistics,
no batch-stat computation/update/gradient routing — the
model.eval()-during-fine-tune semantics of learnSimpleBDModel_rene.py:133).
The candidate lever for the snapshot-ensemble fine-tune protocol, whose
9 epochs dominate evaluation cost.

Usage: python benchmarks/bench_frozen_bn.py
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


def bench(frozen: bool, rng) -> dict:
    trainer, state, batch = setup_flagship(BATCH, rng=rng, frozen_bn=frozen)
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
        "frozen_bn": frozen,
        "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
        "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
        "loss_final": round(loss, 4),
    }


def main() -> None:
    rng = np.random.default_rng(0)
    for frozen in (False, True):
        print(json.dumps(bench(frozen, rng)), flush=True)


if __name__ == "__main__":
    main()
