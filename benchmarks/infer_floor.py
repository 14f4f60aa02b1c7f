"""Inference (eval-step) HBM-traffic floor: the serving roofline.

Training got a bandwidth-floor analysis in round 2 (23 GB/step -> ~3350
img/s ceiling); this does the same for the forward-only eval step so the
measured ~12.3k img/s (BASELINE.md round 3) has a denominator.

Floor model (the same accounting as the round-2 training floor): every
MXU op's output must be written to HBM once and read once by its consumer
(elementwise/BN-affine/relu glue fuses into those passes for free), every
parameter is read once per step, and the uint8 input batch is read once.
Anything XLA cannot fuse only adds to this, so bytes/step is a LOWER
bound and floor_img_s = peak_bw / (bytes/batch) an upper bound.

The op outputs are enumerated from the eval step's OWN jaxpr (conv,
dot_general, reduce_window max-pool), so the count tracks the real
program rather than a hand-listed architecture.

Usage: python benchmarks/infer_floor.py [--batch 256] [--image-size 224]
Prints one JSON line; pass --no-device to run the analysis host-only.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

PEAK_BW = 819e9  # v5e HBM, bytes/s


def traffic_bytes(jaxpr, dtype_bytes: int = 2) -> dict:
    """Sum write+read bytes of every MXU/windowed op output in the jaxpr
    (recursing into sub-jaxprs), in `dtype_bytes`-wide elements."""
    counted = {"conv_general_dilated": 0, "dot_general": 0, "reduce_window_max": 0}

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in counted:
                for v in eqn.outvars:
                    n = 1
                    for d in v.aval.shape:
                        n *= d
                    counted[name] += n
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                elif isinstance(p, (tuple, list)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            walk(q.jaxpr)

    walk(jaxpr.jaxpr)
    # write once + read once by the consumer
    return {k: 2 * v * dtype_bytes for k, v in counted.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--no-device", action="store_true",
                    help="host-only analysis (no TPU touch)")
    args = ap.parse_args()
    if args.no_device:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from benchmarks.common import setup_flagship

    B, S = args.batch, args.image_size
    trainer, state, _ = setup_flagship(batch_size=B, image_size=S)
    rng = np.random.default_rng(0)
    batch = {
        "xdata": rng.integers(0, 256, (B, S, S, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (B, 3)).astype(np.float32),
        "label": np.tile(np.arange(12, dtype=np.int32), -(-B // 12))[:B],
        "valid": np.ones(B, bool),
    }
    eval_fn = trainer._eval_step
    jaxpr = jax.make_jaxpr(lambda s, b: eval_fn(s, b))(state, batch)
    ops = traffic_bytes(jaxpr)
    op_bytes = sum(ops.values())

    params = sum(
        np.prod(np.asarray(x.shape, np.int64))
        for x in jax.tree.leaves(state.params)
    ) + sum(
        np.prod(np.asarray(x.shape, np.int64))
        for x in jax.tree.leaves(state.batch_stats)
    )
    param_bytes = int(params) * 2  # bf16 reads
    input_bytes = B * S * S * 3  # uint8
    total = op_bytes + param_bytes + input_bytes

    floor_ms = total / PEAK_BW * 1e3
    floor_img_s = B / (total / PEAK_BW)
    print(json.dumps({
        "batch": B,
        "bytes_per_batch": int(total),
        "bytes_mxu_ops": int(op_bytes),
        "bytes_params": int(param_bytes),
        "bytes_input": int(input_bytes),
        "floor_ms_per_batch": round(floor_ms, 2),
        "floor_img_per_s": round(floor_img_s, 0),
        "measured_img_per_s_r03": 12290 if B == 256 else None,
        "fraction_of_floor": round(12290 / floor_img_s, 3) if B == 256 else None,
    }), flush=True)


if __name__ == "__main__":
    main()
