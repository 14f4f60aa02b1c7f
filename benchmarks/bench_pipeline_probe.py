"""Probe what limits the Pallas grid pipeline: single vs dual output,
copy vs matmul, tile size, dimension semantics.

Usage: python benchmarks/bench_pipeline_probe.py [M] [K] [N]
"""

import glob
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 301056
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
    roofline = 2 * (m * k + m * n) / 819e9 * 1e3

    def build(kind, tm, semantics=None):
        grid = (-(-m // tm),)
        params = {}
        if semantics:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=(semantics,)
            )

        if kind == "mm_only":
            def kern(x_ref, w_ref, y_ref):
                y_ref[...] = jnp.dot(
                    x_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

            def run(x):
                return pl.pallas_call(
                    kern, grid=grid,
                    in_specs=[
                        pl.BlockSpec((tm, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((k, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                    **params,
                )(x, w)
            return run

        if kind == "copy":
            def kern(x_ref, y_ref):
                y_ref[...] = x_ref[...]

            def run(x):
                return pl.pallas_call(
                    kern, grid=grid,
                    in_specs=[pl.BlockSpec((tm, k), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((tm, k), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
                    **params,
                )(x)
            return run

        if kind == "mm_stats":
            def kern(x_ref, w_ref, y_ref, s_ref, acc_ref):
                i = pl.program_id(0)
                y = jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.float32)
                y_ref[...] = y.astype(jnp.bfloat16)

                @pl.when(i == 0)
                def _():
                    acc_ref[...] = jnp.zeros_like(acc_ref)

                acc_ref[0:1, :] += jnp.sum(y, 0, keepdims=True)
                acc_ref[1:2, :] += jnp.sum(y * y, 0, keepdims=True)

                @pl.when(i == pl.num_programs(0) - 1)
                def _():
                    s_ref[...] = acc_ref[...]

            def run(x):
                y, s = pl.pallas_call(
                    kern, grid=grid,
                    in_specs=[
                        pl.BlockSpec((tm, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((k, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(
                        pl.BlockSpec((tm, n), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((2, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
                        jax.ShapeDtypeStruct((2, n), jnp.float32),
                    ),
                    scratch_shapes=[pltpu.VMEM((2, n), jnp.float32)],
                    **params,
                )(x, w)
                return y + s[0, 0].astype(jnp.bfloat16)
            return run

        raise ValueError(kind)

    cases = [
        ("copy", 2048, None),
        ("copy", 8192, None),
        ("mm_only", 2048, None),
        ("mm_only", 4096, None),
        ("mm_only", 2048, "arbitrary"),
        ("mm_only", 2048, "parallel"),
        ("mm_stats", 2048, "parallel"),
        ("mm_stats", 2048, None),
    ]
    for kind, tm, sem in cases:
        fn = build(kind, tm, sem)

        def chain(x):
            def step(c, _):
                y = fn(c)
                return (y if y.shape == c.shape else c), y[0, 0].astype(jnp.float32)

            _, ss = jax.lax.scan(step, x, None, length=5)
            return ss[-1]

        cf = jax.jit(chain)
        try:
            float(cf(x))
        except Exception as e:
            print(f"{kind} tm={tm} sem={sem}: FAILED {type(e).__name__}: {e}")
            continue
        outdir = f"/tmp/pprobe_{kind}_{tm}_{sem}"
        shutil.rmtree(outdir, ignore_errors=True)
        with jax.profiler.trace(outdir):
            float(cf(x))
        base = roofline if kind != "copy" else 2 * m * k * 2 / 819e9 * 1e3
        ms = device_ms(outdir, 5)
        print(f"{kind:9s} tm={tm:5d} sem={str(sem):9s}: {ms:7.3f} ms "
              f"({ms / base:4.1f}x roofline {base:.3f})")


if __name__ == "__main__":
    main()
