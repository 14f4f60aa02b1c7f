"""XLA compiler-option sweep on the real chip (round 3).

The remaining single-chip gap (40 ms step vs the 28.5 ms exact-BN floor)
lives inside XLA's fusion/scheduling choices. Client-side XLA_FLAGS cannot
carry TPU-only flags through the axon tunnel (the local CPU-flag registry
FATALs on unknown flags), but `jax.jit(..., compiler_options=...)` ships
options to the SERVER-side compiler per executable — verified working
through the tunnel.

Result (BASELINE.md round 3): the default configuration is the measured
optimum — scoped-VMEM raises are monotonically worse, fusion toggles are
bit-identical no-ops.

Usage: python benchmarks/bench_xla_flags.py [config ...]
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

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "scoped_vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "scoped_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "aggressive_loop_fusion_layout": {
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"
    },
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.train.steps import make_train_step

    names = sys.argv[1:] or list(CONFIGS)
    rng = np.random.default_rng(0)
    trainer, state0, batch = setup_flagship(BATCH, rng=rng)
    state0 = jax.device_get(state0)  # re-put per config (donation)
    cfg = trainer.config
    raw_step = make_train_step(
        trainer.apply_fn, trainer.problem, trainer.tx,
        phase="main", alpha=cfg.alpha, compute_dtype=jnp.bfloat16,
    )
    results = []
    for name in names:
        opts = CONFIGS[name]
        try:
            step_fn = jax.jit(
                raw_step, donate_argnums=(0,),
                compiler_options=opts or None,
            )
            state = jax.device_put(state0)
            for _ in range(WARMUP_STEPS):
                state, metrics = step_fn(state, batch)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(MEASURE_STEPS):
                state, metrics = step_fn(state, batch)
            loss = float(metrics["loss"])
            dt = time.perf_counter() - t0
            r = {
                "config": name, "options": opts,
                "img_per_sec": round(MEASURE_STEPS * BATCH / dt, 1),
                "ms_per_step": round(1000.0 * dt / MEASURE_STEPS, 2),
                "loss_final": round(loss, 4),
            }
        except Exception as e:  # unknown option / compile failure
            r = {"config": name, "options": opts,
                 "error": str(e).replace("\n", " ")[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = [r for r in results if "img_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["img_per_sec"])
        print(json.dumps(
            {"best": best["config"], "img_per_sec": best["img_per_sec"]}
        ), flush=True)


if __name__ == "__main__":
    main()
