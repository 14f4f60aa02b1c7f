"""Capture + analyze an xplane trace of the north-star train step.

Runs the geodesic_bd bench step a few times under jax.profiler.trace and
prints the framework-op time breakdown (tensorboard_plugin_profile's
raw_to_tool_data over the xplane.pb), grouped so the conv / BN-reduction /
elementwise split is visible.

Usage: python benchmarks/profile_step.py [batch] [outdir]
"""

import glob
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

IMAGE_SIZE = 224


def build_step(batch_size: int):
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config
    from multi_modal_regression_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    cfg = get_config(
        "geodesic_bd", image_size=IMAGE_SIZE,
        items_per_batch=max(batch_size // 12, 1),
        compute_dtype="bfloat16",
    )
    centers = (0.8 * rng.standard_normal((cfg.dict_size, 3))).astype(np.float32)
    trainer = Trainer(
        cfg, dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )
    model = trainer.model
    x0 = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    state = create_train_state(variables, trainer.tx)
    batch = trainer.shard_batch({
        "xdata": rng.integers(
            0, 256, (batch_size, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (batch_size, 3)).astype(np.float32),
        "label": (np.arange(batch_size) % 12).astype(np.int32),
    })
    return trainer.train_step_fn("main"), state, batch


def capture(batch_size: int, outdir: str) -> str:
    import jax

    step_fn, state, batch = build_step(batch_size)
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # sync (tunnel: D2H is the only true sync)
    with jax.profiler.trace(outdir):
        for _ in range(5):
            state, metrics = step_fn(state, batch)
        float(metrics["loss"])
    return outdir


def analyze(outdir: str, top: int = 40, steps: int = 5) -> None:
    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane.pb under {outdir}"
    xplane = max(xplanes, key=lambda p: pathlib.Path(p).stat().st_mtime)
    data, _ = rtd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    tables = json.loads(data if isinstance(data, str) else data.decode())
    table = tables[0] if isinstance(tables, list) else tables
    cols = [c["label"] for c in table["cols"]]
    rows = [
        [cell["v"] if cell else None for cell in r["c"]] for r in table["rows"]
    ]

    def col(*names):
        for n in names:
            if n in cols:
                return cols.index(n)
        raise KeyError(f"none of {names} in {cols}")

    i_type = col("Operation Type", "Type")
    i_op = col("Operation Name", "Operation")
    i_total = col("Total self-time (us)", "Total self time (us)")
    i_device = col("Host/device")
    i_bw = col("Measured Memory BW (GBytes/Sec)")
    i_bound = col("Bound by")

    dev_rows = [r for r in rows if r[i_device] == "Device"]
    total = sum(r[i_total] for r in dev_rows)
    k = 1e3 * steps
    print(f"total device self-time: {total / 1e3:.2f} ms over {steps} steps "
          f"({total / k:.2f} ms/step)")

    groups: dict[str, float] = {}
    for r in dev_rows:
        groups[r[i_type]] = groups.get(r[i_type], 0.0) + r[i_total]
    print("\n== by op type ==")
    for name, v in sorted(groups.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name:>40s}  {v / k:8.3f} ms/step  {100 * v / total:5.1f}%")

    print(f"\n== top {top} ops ==")
    for r in sorted(dev_rows, key=lambda r: -r[i_total])[:top]:
        print(f"  {r[i_total] / k:8.3f} ms/step  "
              f"{100 * r[i_total] / total:5.1f}%  bw={r[i_bw]:>7} "
              f"{str(r[i_bound]):<8s} {r[i_type]:<20s} {str(r[i_op])[:85]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/xprof_b{bs}"
    capture(bs, out)
    analyze(out)
