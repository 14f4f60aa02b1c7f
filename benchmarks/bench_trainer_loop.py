"""Trainer-loop vs raw-step throughput on the real chip.

bench.py measures the bare compiled step function; this drives the same
north-star config (geodesic_bd, ResNet50, batch 96, 224px, bf16) through
`Trainer.run_epoch` — shard_batch H2D, the interleave generator, the logging
branches — to verify the loop path delivers the advertised number (the
round-1 loop had a per-step D2H sync that bench.py bypassed).

Usage: python benchmarks/bench_trainer_loop.py [steps]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

BATCH = 96
IMAGE_SIZE = 224
WARMUP = 3


def main(measure_steps: int = 20) -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    cfg = get_config(
        "geodesic_bd",
        image_size=IMAGE_SIZE,
        items_per_batch=BATCH // 12,
        compute_dtype="bfloat16",
        max_iterations=0,
        eval_every=0,
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
    state = create_train_state(variables, trainer.tx)

    def batches(n):
        return [
            {
                "xdata": rng.integers(
                    0, 256, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
                ),
                "euler": rng.uniform(-90, 90, (BATCH, 3)).astype(np.float32),
                "label": np.tile(np.arange(12, dtype=np.int32), BATCH // 12),
            }
            for _ in range(n)
        ]

    # warm-up (compile) through the loop path; render_loader=None passes
    # real batches straight through
    state = trainer.run_epoch(state, batches(WARMUP), None, "main",
                              log_every=10**9)
    float(state.s)  # D2H sync (block_until_ready is a no-op over the tunnel)

    data = batches(measure_steps)
    t0 = time.perf_counter()
    state = trainer.run_epoch(state, data, None, "main", log_every=10**9)
    float(state.s)  # sync: state is donated + chained through all steps
    dt = time.perf_counter() - t0
    loop_ips = measure_steps * BATCH / dt
    print(f"trainer-loop (host batches): {loop_ips:.1f} img/s "
          f"({dt / measure_steps * 1e3:.1f} ms/step)")

    # same loop with device-resident batches: isolates the loop's own
    # overhead from the tunnel's ~25 MB/s H2D bandwidth (environment
    # artifact: on a local TPU host PCIe H2D is >10 GB/s)
    dev_data = [trainer.shard_batch(b) for b in batches(4)]
    float(np.asarray(dev_data[-1]["label"])[0])  # wait for the puts
    t0 = time.perf_counter()
    state = trainer.run_epoch(
        state, [dev_data[i % 4] for i in range(measure_steps)], None,
        "main", log_every=10**9,
    )
    float(state.s)
    dt = time.perf_counter() - t0
    dev_ips = measure_steps * BATCH / dt
    print(f"trainer-loop (device batches): {dev_ips:.1f} img/s "
          f"({dt / measure_steps * 1e3:.1f} ms/step)")

    # raw step-function reference on the same state/config (bench.py's path)
    step_fn = trainer.train_step_fn("main")
    b0 = trainer.shard_batch(data[0])
    for _ in range(WARMUP):
        state, metrics = step_fn(state, b0)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(measure_steps):
        state, metrics = step_fn(state, b0)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    step_ips = measure_steps * BATCH / dt
    print(f"raw step:     {step_ips:.1f} img/s ({dt / measure_steps * 1e3:.1f} ms/step)")
    print(f"loop/step ratio: {loop_ips / step_ips:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
