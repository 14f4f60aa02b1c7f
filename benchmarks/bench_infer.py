"""Inference (eval-step) throughput on the real chip.

Measures the full eval step — uint8 normalize, backbone, head banks, bin
argmax + dictionary decode — at several batch sizes (geodesic_bd flagship,
bf16). Protocol: EVERY dispatch gets its own distinct device-resident
batch, so tunnel-side dedup of repeated dispatches is impossible by
construction; the device executes the independent programs sequentially
on its single stream and the final D2H fetch syncs the whole run.

Protocol validation (round 3, recorded in BASELINE.md): four variants —
chained/1-batch, chained/8-rotating, unchained/40-distinct,
unchained/1-repeated — measure 151.5 / 8.73 / 8.60 / 8.60 ms per batch.
The three distinct-or-repeated variants agree (no dedup observed for
eval dispatches; ~8.6 ms IS sequential execution), while chaining a
single reused input buffer through a data dependency triggers a
pathological ~150 ms/dispatch tunnel serialization — so the distinct-
batch unchained form is both the safest and the honest one.

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
STEPS = 40  # each gets its own batch


def main() -> None:
    batches = [int(b) for b in sys.argv[1:]] or [96, 256]
    rng = np.random.default_rng(0)
    trainer, state, _ = setup_flagship(96, rng=rng)
    eval_step = trainer._eval_step

    for B in batches:
        dev_batches = [
            make_device_batch(trainer, B, IMAGE_SIZE, rng)
            for _ in range(STEPS)
        ]
        # warmup (compile) + force the puts to complete
        yp, _ = eval_step(state, dev_batches[-1])
        np.asarray(yp)
        t0 = time.perf_counter()
        for b in dev_batches:
            yp, _ = eval_step(state, b)
        np.asarray(yp)  # the device stream is in-order: this syncs all 40
        dt = time.perf_counter() - t0
        print(json.dumps({
            "batch": B,
            "img_per_sec": round(STEPS * B / dt, 1),
            "ms_per_batch": round(1000.0 * dt / STEPS, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
