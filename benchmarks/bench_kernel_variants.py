"""Sweep fused-matmul kernel variants; report DEVICE self-time via xprof.

Wall-clock through the axon tunnel hides per-op cost (35 ms dispatch floor,
no block_until_ready sync), so each variant is traced with jax.profiler and
the Mosaic custom-call's device self-time extracted from the xplane.

Usage: python benchmarks/bench_kernel_variants.py [M] [K] [N]
"""

import functools
import glob
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def make_variant(name, tm):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern_v0(x_ref, w_ref, ab_ref, y_ref, s_ref, acc_ref):
        i = pl.program_id(0)
        x = x_ref[...].astype(jnp.float32)
        if ab_ref is not None:
            x = x * ab_ref[0:1, :] + ab_ref[1:2, :]
            x = jnp.maximum(x, 0.0)
        y = jnp.dot(x.astype(jnp.bfloat16), w_ref[...],
                    preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        y_ref[...] = yb
        yf = yb.astype(jnp.float32)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0:1, :] += jnp.sum(yf, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(yf * yf, axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[...] = acc_ref[...]

    def kern_v1(x_ref, w_ref, ab_ref, y_ref, s_ref, acc_ref):
        # bf16 prologue, stats from the f32 accumulator (pre-rounding)
        i = pl.program_id(0)
        x = x_ref[...]
        if ab_ref is not None:
            x = x * ab_ref[0:1, :] + ab_ref[1:2, :]
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        y_ref[...] = y.astype(jnp.bfloat16)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0:1, :] += jnp.sum(y, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(y * y, axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[...] = acc_ref[...]

    def kern_v2(x_ref, w_ref, ab_ref, y_ref, s_ref, acc_ref):
        # bf16 prologue + MXU row-sum reductions
        i = pl.program_id(0)
        x = x_ref[...]
        if ab_ref is not None:
            x = x * ab_ref[0:1, :] + ab_ref[1:2, :]
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        y_ref[...] = yb
        ones = jnp.ones((8, yb.shape[0]), jnp.bfloat16)
        s0 = jnp.dot(ones, yb, preferred_element_type=jnp.float32)
        s1 = jnp.dot(ones, (yb * yb), preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0:1, :] += s0[0:1]
        acc_ref[1:2, :] += s1[0:1]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[...] = acc_ref[...]

    def kern_v3(x_ref, w_ref, ab_ref, y_ref, s_ref, acc_ref):
        # no stats at all (lower bound for the matmul+prologue itself)
        x = x_ref[...]
        if ab_ref is not None:
            x = x * ab_ref[0:1, :] + ab_ref[1:2, :]
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        y_ref[...] = y.astype(jnp.bfloat16)

        @pl.when(pl.program_id(0) == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

    kern = {"v0": kern_v0, "v1": kern_v1, "v2": kern_v2, "v3": kern_v3}[name]

    def run(x2, w, ab):
        m, k = x2.shape
        n = w.shape[1]
        t = min(tm, m)
        grid = (-(-m // t),)
        in_specs = [
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args = [x2, w]
        if ab is not None:
            in_specs.append(
                pl.BlockSpec((2, k), lambda i: (0, 0), memory_space=pltpu.VMEM))
            args.append(ab)
            body = kern
        else:
            body = lambda x_ref, w_ref, y_ref, s_ref, acc_ref: kern(
                x_ref, w_ref, None, y_ref, s_ref, acc_ref)
            if name == "v3":
                body = lambda x_ref, w_ref, y_ref, s_ref: kern(
                    x_ref, w_ref, None, y_ref, s_ref, None)
        scratch = [] if name == "v3" else [pltpu.VMEM((2, n), jnp.float32)]
        if name == "v3" and ab is not None:
            body = lambda x_ref, w_ref, ab_ref, y_ref, s_ref: kern(
                x_ref, w_ref, ab_ref, y_ref, s_ref, None)
        return pl.pallas_call(
            body,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((t, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                jax.ShapeDtypeStruct((2, n), jnp.float32),
            ),
            scratch_shapes=scratch,
        )(*args)

    return run


def device_ms(outdir, steps):
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    xplane = max(xplanes, key=lambda p: pathlib.Path(p).stat().st_mtime)
    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    tables = json.loads(data if isinstance(data, str) else data.decode())
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c["label"] for c in table["cols"]]
    i_total = cols.index("Total self-time (us)")
    i_dev = cols.index("Host/device")
    rows = [[c["v"] if c else None for c in r["c"]] for r in table["rows"]]
    tot = sum(r[i_total] for r in rows if r[i_dev] == "Device")
    return tot / steps / 1e3


def main():
    import jax
    import jax.numpy as jnp

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
    ab = jnp.asarray(
        np.stack([rng.uniform(0.5, 2, k), rng.standard_normal(k) * 0.1]),
        jnp.bfloat16,
    )
    roofline = 2 * (m * k + m * n) / 819e9 * 1e3  # R x + W y, bf16, ms

    for name in ("v0", "v1", "v2", "v3"):
        for tm in (1024, 2048):
            fn = jax.jit(make_variant(name, tm))

            def chain(x):
                def step(c, _):
                    y, s = fn(c, w, ab)
                    return y if (n == k) else c, s[0, 0]

                _, ss = jax.lax.scan(step, x, None, length=5)
                return ss[-1]

            cf = jax.jit(chain)
            float(cf(x))
            outdir = f"/tmp/kvar_{name}_{tm}"
            shutil.rmtree(outdir, ignore_errors=True)
            with jax.profiler.trace(outdir):
                float(cf(x))
            ms = device_ms(outdir, 5)
            print(f"{name} tm={tm}: {ms:7.3f} ms/call  "
                  f"({ms / roofline:4.1f}x roofline {roofline:.3f} ms)")


if __name__ == "__main__":
    main()
