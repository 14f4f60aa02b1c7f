"""Checkpoint-save cost split: what does checkpoint_async actually hide?

The reference saves torch state_dicts synchronously once per epoch
(learnGeodesicBDModel.py:250-252). This trainer's single-process save has
two parts: a synchronous D2H fetch (mandatory — the train step DONATES
the state, so device buffers are invalid one step later) and the orbax
serialization + disk write (moved to a background thread by
`checkpoint_async`, default on). This bench measures both parts for the
flagship geodesic_bd state on the real chip, plus a save issued while
steps run — the overlap the async path buys.

Usage: python benchmarks/bench_checkpoint.py [--items-per-batch 8] [--reps 3]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items-per-batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    from benchmarks.common import setup_flagship

    trainer, state, batch = setup_flagship(
        batch_size=args.items_per_batch * 12
    )
    cfg = trainer.config
    workdir = Path(tempfile.mkdtemp(prefix="bench_ckpt_"))
    trainer.workdir = workdir
    payload = jax.device_get(state)  # warm any lazy imports/caches

    n_bytes = sum(
        np.asarray(x).nbytes for x in jax.tree.leaves(payload)
    )
    print(json.dumps({"state_mb": round(n_bytes / 2**20, 1)}), flush=True)

    import orbax.checkpoint as ocp

    for rep in range(args.reps):
        t0 = time.perf_counter()
        payload = jax.device_get(state)
        t_fetch = time.perf_counter() - t0

        # fetch_s through the TPU tunnel can read as ~0 when the state is
        # unchanged since the warm fetch (identical-dispatch caching,
        # CLAUDE.md); write_s is pure host work and always honest
        path = (workdir / "checkpoints" / f"rep{rep}").absolute()
        t0 = time.perf_counter()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
        t_write = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "rep": rep,
                    "fetch_s": round(t_fetch, 3),
                    "write_s": round(t_write, 3),
                    "async_hides_pct": round(
                        100 * t_write / (t_fetch + t_write), 1
                    ),
                }
            ),
            flush=True,
        )

    # the overlap in vivo: N steps with one mid-flight save, async vs sync.
    # NOTE the step donates its state: each mode restarts from a fresh
    # device_put of the host snapshot (never step a state you kept).
    step = trainer.train_step_fn("main")
    state, _ = step(state, batch)  # compile
    state_host = jax.device_get(state)
    n_steps = 6
    for mode, async_on in (("sync", False), ("async", True)):
        trainer.config = cfg.replace(checkpoint_async=async_on)
        s = jax.device_put(state_host, jax.devices()[0])
        t0 = time.perf_counter()
        for i in range(n_steps):
            if i == 1:
                trainer.save_checkpoint(s, f"loop_{mode}")
            s, metrics = step(s, batch)
        _ = float(jax.device_get(metrics["loss"]))  # true sync (tunnel)
        trainer.wait_for_checkpoints()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {"loop": mode, "steps": n_steps, "with_one_save_s": round(dt, 3)}
            ),
            flush=True,
        )
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
