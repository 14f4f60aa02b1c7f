"""Inference (eval-step) throughput on the real chip.

Measures the full eval step — uint8 normalize, backbone, head banks, bin
argmax + dictionary decode — at several batch sizes (geodesic_bd flagship,
bf16). Distinct device-resident batches are cycled so the tunnel cannot
reuse identical dispatches, and the sync is the D2H fetch of the last
batch's predictions (block_until_ready is a no-op through the tunnel).

Result (BASELINE.md round 3): ~11-12k img/s/chip device-side, peaking
near batch 256 — the round-1 single-batch protocol was bound by the
tunnel's fixed per-dispatch overhead, not the device.

Usage: python benchmarks/bench_infer.py [batch ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.common import make_device_batch, setup_flagship

IMAGE_SIZE = 224
N_BATCHES = 8
REPEATS = 5  # total steps = N_BATCHES * REPEATS


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [96, 256]
    rng = np.random.default_rng(0)
    trainer, state, _ = setup_flagship(96, rng=rng)
    eval_step = trainer._eval_step

    for B in batches:
        dev_batches = [
            make_device_batch(trainer, B, IMAGE_SIZE, rng)
            for _ in range(N_BATCHES)
        ]
        # warmup + force the puts to complete
        yp, _ = eval_step(state, dev_batches[0])
        np.asarray(yp)
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            for b in dev_batches:
                yp, _ = eval_step(state, b)
        np.asarray(yp)  # one D2H sync at the end of the chain
        dt = time.perf_counter() - t0
        steps = REPEATS * N_BATCHES
        print(json.dumps({
            "batch": B,
            "img_per_sec": round(steps * B / dt, 1),
            "ms_per_batch": round(1000.0 * dt / steps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
