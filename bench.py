"""Benchmark: training-step throughput of the north-star config.

Measures images/sec/chip for the `geodesic_bd` preset (the reference's
learnGeodesicBDModel.py: ResNet50-layer4 + per-class bin/delta heads,
dict_size=200, effective batch 96 x 224x224 — learnGeodesicBDModel.py:78-92)
with the full compiled train step (normalize + targets + forward + geodesic
loss + backward + Adam + BN stats + self-balance) and synthetic input batches.

The headline `value` is the REFERENCE-EXACT dual-loader protocol — the
script forwards its real and render loaders separately (per-stream
train-BN statistics, two sequential running-stat EMA updates/step,
learnGeodesicBDModel.py:116-121), which Trainer.fit compiles whenever a
render loader is present (fused vmapped execution, steps.py). The
single-forward concat step — the headline of rounds 1-4, kept for
cross-round comparability — is reported alongside as
`single_forward_img_per_sec`.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Outage resilience: the TPU tunnel (axon) can go down for hours, and when it
does even `jax.devices()` hangs forever rather than erroring (CLAUDE.md).
A hung benchmark leaves the driver's per-round record blank (BENCH_r04 was
rc=1 for exactly this reason), so the parent process never touches jax
itself: it probes the backend in a killable subprocess with a timeout,
retries with backoff inside a bounded budget, runs the measurement in a
second timeout-bounded subprocess, and on final failure emits ONE structured
JSON line ({"error": "tpu_unavailable", ...}) instead of a traceback.
Env knobs: MMR_BENCH_BUDGET_S (total retry window, default 900),
MMR_BENCH_PROBE_TIMEOUT_S (default 120), MMR_BENCH_RUN_TIMEOUT_S
(default 900 per attempt).

The reference repo publishes no throughput numbers (BASELINE.md). The
baseline divisor below is our documented ESTIMATE of the reference script's
single-GPU throughput for this config — PyTorch-0.4-style loop with per-step
host syncs (CPU one-hot scatter, loss.item(), host preprocessing;
SURVEY.md §3.1) — so vs_baseline tracks progress against a fixed reference
point across rounds rather than nothing.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ESTIMATED_REFERENCE_IMG_PER_SEC = 610.0  # see module docstring / BASELINE.md

BATCH = 96  # 2 loaders x 4 items x 12 classes (learnGeodesicBDModel.py:78-79)
IMAGE_SIZE = 224
WARMUP_STEPS = 3
# 40 steps amortize the tunnel's fixed per-run dispatch cost (~1.5 ms/step
# at 20 steps vs the 39.7 ms xplane device time) into the steady state
MEASURE_STEPS = 40


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.train import Trainer, get_config

    # MMR_BENCH_SMOKE=1 shrinks the measurement to seconds (resnet18, 32px,
    # 3 steps) so the WHOLE child path — config, init, compiled step, JSON
    # emission — is exercisable on CPU in the test suite. The flagship
    # numbers only ever ran on chip before, so a bitrot in this file would
    # surface as another blank driver record instead of a red test.
    smoke = os.environ.get("MMR_BENCH_SMOKE") == "1"
    batch_size = 12 if smoke else BATCH
    image_size = 32 if smoke else IMAGE_SIZE
    warmup_steps = 1 if smoke else WARMUP_STEPS
    measure_steps = 3 if smoke else MEASURE_STEPS

    rng = np.random.default_rng(0)
    cfg = get_config(
        "geodesic_bd",
        image_size=image_size,
        items_per_batch=batch_size // 12,
        compute_dtype="bfloat16",
        **(
            dict(feature_network="resnet18", N0=512, N1=16, N2=8, dict_size=8)
            if smoke
            else {}
        ),
    )
    centers = (0.8 * rng.standard_normal((cfg.dict_size, 3))).astype(np.float32)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices()[:1]),
    )

    # jit the whole init: un-jitted flax init dispatches thousands of tiny
    # ops over the TPU tunnel (~12 min); jitted it is one compiled program.
    model = trainer.model
    x0 = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    l0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, x0, l0, train=False))(
        jax.random.PRNGKey(cfg.seed)
    )
    from multi_modal_regression_tpu.train.state import create_train_state

    state = create_train_state(variables, trainer.tx)

    batch = {
        "xdata": rng.integers(
            0, 256, (batch_size, image_size, image_size, 3), np.uint8
        ),
        "euler": rng.uniform(-90, 90, (batch_size, 3)).astype(np.float32),
        "label": np.tile(np.arange(12, dtype=np.int32), batch_size // 12),
    }
    batch = trainer.shard_batch(batch)

    def measure(dual_stream: bool, state):
        step_fn = trainer.train_step_fn("main", dual_stream=dual_stream)
        for _ in range(warmup_steps):
            state, metrics = step_fn(state, batch)
        float(metrics["loss"])  # host fetch: block_until_ready does not
        # synchronize through the TPU tunnel; a D2H copy does
        t0 = time.perf_counter()
        for _ in range(measure_steps):
            state, metrics = step_fn(state, batch)
        # the state is donated and chained, so fetching the last step's
        # loss waits for the whole sequence
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        return measure_steps * batch_size / dt, state

    # single-forward concat step first (the rounds-1-4 headline), then the
    # reference-exact dual-loader protocol (per-stream BN, fused) as the
    # headline; the state is donated through both.
    single_img_per_sec, state = measure(False, state)
    images_per_sec, state = measure(True, state)
    # the exact-BN bandwidth floor for this config is ~23 GB/step on the
    # 819 GB/s v5e HBM => ~3350 img/s at 100% efficiency (BASELINE.md
    # round-2 analysis); report the fraction attained alongside the
    # fixed-estimate ratio
    BANDWIDTH_FLOOR_IMG_PER_SEC = 3350.0
    print(
        json.dumps(
            {
                "metric": "geodesic_bd train throughput (ResNet50, batch 96, 224px)",
                "value": round(images_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / ESTIMATED_REFERENCE_IMG_PER_SEC, 3
                ),
                # headline protocol: the reference script's own dual-loader
                # two-forward semantics (per-stream BN, fused execution);
                # the single-forward concat step was the rounds-1-4 headline
                "protocol": "dual_loader_fused",
                "single_forward_img_per_sec": round(single_img_per_sec, 1),
                "fraction_of_bandwidth_floor": round(
                    images_per_sec / BANDWIDTH_FLOOR_IMG_PER_SEC, 3
                ),
                # honesty guard: if the tunnel silently fell back to a CPU
                # backend, the record says so instead of passing off host
                # numbers as chip numbers
                "platform": jax.devices()[0].platform,
                # a smoke-mode line must never read as a real record
                **({"smoke": True} if smoke else {}),
            }
        )
    )


def _run_group(cmd: list, timeout_s: float):
    """subprocess.run in its OWN process group, killing the whole group on
    timeout. A hung axon backend init can hold helper processes (tunnel
    endpoints) that a plain child SIGKILL would orphan — and a live orphan
    holding the tunnel can then fail every retry in the budget.

    Returns (returncode|None, stdout, stderr); returncode None = timeout.
    """
    import signal

    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        out, err = proc.communicate()
        return None, out, err


def _probe_backend(timeout_s: float) -> str:
    """'ok' | 'timeout' | 'error' for `jax.devices()` in a killable child.

    The hang mode of a dead tunnel is an indefinite block inside backend
    init, which no in-process timeout can interrupt — hence a subprocess.
    A fast nonzero exit is a DIFFERENT failure (broken env/install) and is
    reported as such rather than burning the retry budget as if it were an
    outage."""
    rc, _, err = _run_group(
        [sys.executable, "-c", "import jax; jax.devices()"], timeout_s
    )
    if rc == 0:
        return "ok"
    if rc is None:
        return "timeout"
    sys.stderr.write(f"bench probe child rc={rc}:\n{err[-2000:]}\n")
    return "error"


def _run_child(timeout_s: float) -> "str | None":
    """Run the measurement in a subprocess; return its JSON line or None."""
    rc, out, err = _run_group(
        [sys.executable, os.path.abspath(__file__), "--child"], timeout_s
    )
    for line in reversed((out or "").splitlines()):
        line = line.strip()
        if rc == 0 and line.startswith("{") and line.endswith("}"):
            try:
                json.loads(line)
            except ValueError:
                continue
            return line
    status = "timed out" if rc is None else f"rc={rc}"
    sys.stderr.write(
        f"bench child {status}, no JSON line; stdout tail:\n"
        f"{(out or '')[-1000:]}\nstderr tail:\n{(err or '')[-2000:]}\n"
    )
    return None


def supervise() -> int:
    budget_s = float(os.environ.get("MMR_BENCH_BUDGET_S", "900"))
    probe_timeout_s = float(os.environ.get("MMR_BENCH_PROBE_TIMEOUT_S", "120"))
    run_timeout_s = float(os.environ.get("MMR_BENCH_RUN_TIMEOUT_S", "900"))
    deadline = time.monotonic() + budget_s
    attempts = 0
    hard_errors = 0
    backoff_s = 30.0
    error_kind = "tpu_unavailable"
    while deadline - time.monotonic() > 0:
        attempts += 1
        remaining = deadline - time.monotonic()
        probe = _probe_backend(min(probe_timeout_s, max(remaining, 10.0)))
        if probe == "ok":
            # Probe is cheap; the real run gets its full window even if that
            # overshoots the retry budget — the budget bounds *retries*, not
            # one in-flight measurement.
            line = _run_child(run_timeout_s)
            if line is not None:
                print(line)
                return 0
            sys.stderr.write(f"bench attempt {attempts}: run failed; retrying\n")
        elif probe == "timeout":
            hard_errors = 0
            sys.stderr.write(
                f"bench attempt {attempts}: backend probe timed out; retrying\n"
            )
        else:
            # deterministic env failure (import error, broken install):
            # fail fast after confirming it twice instead of spending the
            # outage budget and mislabeling it tpu_unavailable
            hard_errors += 1
            if hard_errors >= 2:
                error_kind = "backend_error"
                break
        if deadline - time.monotonic() <= 0:
            break
        time.sleep(min(backoff_s, max(deadline - time.monotonic(), 0)))
        backoff_s = min(backoff_s * 2, 240.0)
    print(
        json.dumps(
            {
                "error": error_kind,
                "metric": "geodesic_bd train throughput (ResNet50, batch 96, 224px)",
                "value": None,
                "unit": "images/sec/chip",
                "vs_baseline": None,
                "attempts": attempts,
                "budget_s": budget_s,
            }
        )
    )
    return 0


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(supervise())
