"""Microbench: fused matmul+BN-stats kernel vs XLA reference on the chip.

Chains y -> next x (square matrices) so the tunnel cannot cache/reorder
(block_until_ready does not sync through the axon tunnel; the final D2H
scalar fetch is the sync — see CLAUDE.md).

Usage: python benchmarks/bench_fused_mm.py [M] [C] [iters]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.ops import fused_conv_bn as f

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, c)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((c, c)) * (1.0 / np.sqrt(c)), jnp.float32)
    a = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)

    def chain(impl):
        def step(xc, _):
            y, s = f.linear_bn_stats(xc, a, b, w, True, impl)
            return y, s[0, 0]

        def run(x0):
            xf, ss = jax.lax.scan(step, x0, None, length=iters)
            return ss[-1] + xf[0, 0].astype(jnp.float32)

        return jax.jit(run)

    for impl in ("pallas", "xla"):
        fn = chain(impl)
        r = fn(x)
        float(r)  # compile+sync
        t0 = time.perf_counter()
        r = fn(x)
        float(r)
        dt = time.perf_counter() - t0
        per = dt / iters * 1e3
        traffic = (2 * m * c * 2) / 1e9  # R x + W y, bf16
        print(
            f"{impl:8s} {per:7.3f} ms/call  minimal-traffic bw "
            f"{traffic / (per / 1e3):6.1f} GB/s  (M={m}, C={c})"
        )


if __name__ == "__main__":
    main()
