"""XLA compiler-option sweep on the real chip (round 3).

The remaining single-chip gap (40 ms step vs the 28.5 ms exact-BN floor)
lives inside XLA's fusion/scheduling choices. Client-side XLA_FLAGS cannot
carry TPU-only flags through the axon tunnel (the local CPU-flag registry
FATALs on unknown flags), but `jax.jit(..., compiler_options=...)` ships
options to the SERVER-side compiler per executable — verified working
through the tunnel.

Swept (semantics-exact):
  - xla_tpu_scoped_vmem_limit_kib: the VMEM budget fusions may tile into
    (v5e default ~16 MB of 128; bigger tiles = fewer HBM round trips)
  - xla_tpu_rwb_fusion=false: disable read-write-bundle fusion
  - xla_tpu_enable_aggressive_loop_fusion_layout_opt

Usage: python benchmarks/bench_xla_flags.py [config ...]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 96
IMAGE_SIZE = 224
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

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state
    from multi_modal_regression_tpu.train.steps import make_train_step

    names = sys.argv[1:] or list(CONFIGS)
    rng = np.random.default_rng(0)
    cfg = get_config(
        "geodesic_bd",
        image_size=IMAGE_SIZE,
        items_per_batch=BATCH // 12,
        compute_dtype="bfloat16",
    )
    centers = (0.8 * rng.standard_normal((cfg.dict_size, 3))).astype(np.float32)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    model = trainer.model
    x0 = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    state0 = jax.device_get(create_train_state(variables, trainer.tx))
    batch = trainer.shard_batch({
        "xdata": rng.integers(
            0, 256, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (BATCH, 3)).astype(np.float32),
        "label": np.tile(np.arange(12, dtype=np.int32), BATCH // 12),
    })
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
