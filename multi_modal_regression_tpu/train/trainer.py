"""The generic Trainer: warm-up + main phases, periodic eval, checkpoints.

Replaces the copy-pasted training-loop template shared by ~30 reference
scripts (SURVEY.md §3.1, learnGeodesicBDModel.py:106-263) with one loop:

  - each step consumes one real batch + one render batch concatenated
    (the reference zips two DataLoaders and concatenates outputs,
    learnGeodesicBDModel.py:160-173)
  - the full step (targets, forward, loss, update, BN stats, balance s)
    is one compiled program over a data-parallel mesh
  - eval decodes on device and computes the MedErr headline metric
    (get_error2 parity) on host
  - orbax checkpoints carry the FULL state (params + BN stats + optimizer +
    step + s) and support resume — the reference saves params only
    (learnGeodesicBDModel.py:231-232)
  - metrics stream to stdout + a jsonl file under workdir.
"""

from __future__ import annotations

import time
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.data.loader import BalancedLoader, TestLoader
from multi_modal_regression_tpu.metrics.pose_error import mean_class_median_error
from multi_modal_regression_tpu.parallel.mesh import make_mesh, replicated_sharding
from multi_modal_regression_tpu.train.presets import (
    ExperimentConfig,
    build_model,
    build_optimizer,
    build_problem,
    make_apply_fn,
)
from multi_modal_regression_tpu.train.state import TrainState, create_train_state
from multi_modal_regression_tpu.train.steps import (
    make_eval_step,
    make_train_step,
    validate_dual_stream_layout,
)


def _interleave(real_loader, render_loader):
    """Yield concatenated (real, render) batches; stop at the shorter
    (zip semantics of the reference, learnGeodesicBDModel.py:160). Adds an
    'is_real' row mask — joint objectives compute the category CE on real
    rows only (learnJointCatPoseModel_top1.py:176). With render_loader=None
    (the ObjectNet single-loader protocol, learnObjectnetBDModel.py:74-75)
    the real batches pass through unchanged."""
    if render_loader is None:
        # no is_real mask shipped: the compiled step defaults missing
        # is_real to all-True IN GRAPH (steps.py), saving a per-step H2D
        yield from real_loader
        return
    mask = None
    for a, b in zip(real_loader, render_loader):
        out = {k: np.concatenate([a[k], b[k]]) for k in a}
        if mask is None or len(mask) != len(out["label"]):
            mask = np.concatenate(
                [np.ones(len(a["label"]), bool), np.zeros(len(b["label"]), bool)]
            )
        out["is_real"] = mask
        yield out


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        dictionary=None,
        workdir: str | Path | None = None,
        mesh=None,
    ):
        self.config = config
        self.workdir = Path(workdir) if workdir else None
        if self.workdir:
            self.workdir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.val_history: list[float] = []  # MedErr curve (plots/<S>.mat role)
        self._save_thread = None  # in-flight background checkpoint write
        self._save_error: BaseException | None = None
        self.model = build_model(config)
        self.problem = build_problem(config, dictionary)
        self.tx = build_optimizer(config)
        self.apply_fn = make_apply_fn(self.model, config)

        resize_to = config.image_size if config.device_resize_from else None
        from multi_modal_regression_tpu.train.presets import (
            resolve_compute_dtype,
        )

        cdtype = resolve_compute_dtype(config.compute_dtype)
        self._train_steps = {
            phase: jax.jit(
                make_train_step(
                    self.apply_fn, self.problem, self.tx,
                    phase=phase,
                    alpha=config.alpha if phase == "main" else config.warmup_alpha,
                    resize_to=resize_to,
                    random_flip=config.train_flip,
                    compute_dtype=cdtype,
                    remat=config.remat,
                    frozen_bn=config.frozen_bn,
                ),
                donate_argnums=(0,),
            )
            for phase in ("warmup", "main")
        }
        # dual-stream variants (per-stream BN, reference's two-forward
        # protocol) are compiled lazily — only dual-loader fit() runs pay
        self._dual_train_steps: dict = {}
        self._step_kwargs = dict(
            resize_to=resize_to,
            random_flip=config.train_flip,
            compute_dtype=cdtype,
            remat=config.remat,
            frozen_bn=config.frozen_bn,
        )
        self._eval_step = jax.jit(
            make_eval_step(
                self.apply_fn, self.problem, resize_to=resize_to,
                compute_dtype=cdtype,
            )
        )
        from multi_modal_regression_tpu.utils.metrics_writer import MetricsWriter

        self._writer = (
            MetricsWriter(self.workdir, tensorboard=config.tensorboard)
            if self.workdir and jax.process_index() == 0  # one writer/job
            else None
        )

    def train_step_fn(self, phase: str = "main", dual_stream: bool = False):
        """The compiled (donated-state) train step for a phase — the public
        accessor used by bench.py / __graft_entry__ / external drivers.

        dual_stream=True returns the per-stream-BN variant (the reference's
        two-forward dual-loader protocol, steps.make_train_step); built on
        first request."""
        if not dual_stream:
            return self._train_steps[phase]
        if phase not in self._dual_train_steps:
            cfg = self.config
            self._dual_train_steps[phase] = jax.jit(
                make_train_step(
                    self.apply_fn, self.problem, self.tx,
                    phase=phase,
                    alpha=cfg.alpha if phase == "main" else cfg.warmup_alpha,
                    dual_stream_bn=True,
                    dual_loss_sum=cfg.loss_stream_sum,
                    dual_stream_fused=cfg.bn_stream_fused,
                    **self._step_kwargs,
                ),
                donate_argnums=(0,),
            )
        return self._dual_train_steps[phase]

    # -- state ------------------------------------------------------------

    def init_state(self, rng_seed: int | None = None) -> TrainState:
        seed = self.config.seed if rng_seed is None else rng_seed
        cfg = self.config
        size = cfg.image_size
        x = jnp.zeros((2, size, size, 3), jnp.float32)
        label = jnp.zeros((2,), jnp.int32)
        from multi_modal_regression_tpu.train.presets import _model_takes_label

        args = (x, label) if _model_takes_label(cfg.model_kind) else (x,)
        # jit the whole init: un-jitted flax init dispatches thousands of
        # tiny ops (~12 min for ResNet50 over the TPU tunnel — CLAUDE.md);
        # jitted it is one compiled program
        variables = jax.jit(
            lambda k: self.model.init(k, *args, train=False)
        )(jax.random.PRNGKey(seed))
        state = create_train_state(variables, self.tx, seed=seed)
        if "model" in self.mesh.axis_names:
            from multi_modal_regression_tpu.parallel.tp import shard_state

            return shard_state(state, self.mesh)
        return jax.device_put(state, replicated_sharding(self.mesh))

    def shard_batch(self, batch: dict) -> dict:
        if jax.process_count() > 1:
            # multi-host SPMD: each process holds its own loader stride
            # (BalancedLoader host_count/host_index); assemble the global
            # batch-sharded arrays (parallel.multihost)
            from multi_modal_regression_tpu.parallel.multihost import (
                global_batch_from_local,
            )

            return global_batch_from_local(batch, self.mesh)
        if "model" in self.mesh.axis_names:
            from multi_modal_regression_tpu.parallel.tp import shard_batch_2d

            return shard_batch_2d(batch, self.mesh)
        from multi_modal_regression_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, state: TrainState, name: str = "last") -> None:
        if not self.workdir:
            return
        import orbax.checkpoint as ocp

        path = (self.workdir / "checkpoints" / name).absolute()
        if jax.process_count() > 1:
            # multi-host: EVERY process must call save (orbax synchronizes
            # via a global barrier and writes each shard from its primary
            # holder); pass the global jax.Arrays through, synchronously —
            # the train step DONATES the state, so a background save
            # reading live device buffers would race the next step's
            # in-place update
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, state, force=True)
            return
        # single process: fetch to host synchronously (the donated device
        # buffers are invalid the moment the next step runs; the host copy
        # is immortal), then serialize+write on a background thread — the
        # orbax msgpack/IO cost leaves the training loop
        # (config.checkpoint_async, default on)
        payload = jax.device_get(state)
        self.wait_for_checkpoints()  # one save in flight at a time

        def _write() -> None:
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, payload, force=True)

        if self.config.checkpoint_async:
            import threading

            t = threading.Thread(
                target=self._run_save, args=(_write,),
                name=f"ckpt-save-{name}", daemon=False,
            )
            self._save_thread = t
            t.start()
        else:
            _write()

    def _run_save(self, write_fn) -> None:
        try:
            write_fn()
        except BaseException as e:  # surfaced by wait_for_checkpoints
            self._save_error = e

    def wait_for_checkpoints(self) -> None:
        """Block until the in-flight background save (if any) commits,
        re-raising its error. Orbax writes are atomic (tmp + rename), and
        the thread is non-daemon, so even without this call an exiting
        process finishes the write — this makes completion (and failure)
        observable at the call site."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError("background checkpoint save failed") from err

    def restore_checkpoint(self, name: str = "last") -> TrainState:
        import orbax.checkpoint as ocp

        self.wait_for_checkpoints()  # don't read a checkpoint mid-write
        path = (self.workdir / "checkpoints" / name).absolute()
        template = jax.device_get(self.init_state())
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), template
        )
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(path, abstract)
            except BaseException:
                # migration: checkpoints written before TrainState carried an
                # augmentation rng key lack that leaf — restore the rest and
                # fill a fresh key
                fields = ("step", "params", "batch_stats", "opt_state", "s")
                partial = ckptr.restore(
                    path, {f: getattr(abstract, f) for f in fields}
                )
                restored = template.replace(**partial)
        if "model" in self.mesh.axis_names:
            # restore WITH the tensor-parallel layout init_state uses —
            # device_put with replicated sharding here would silently
            # un-shard the head banks on a ('data', 'model') mesh
            from multi_modal_regression_tpu.parallel.tp import shard_state

            return shard_state(restored, self.mesh)
        return jax.device_put(restored, replicated_sharding(self.mesh))

    # -- logging ----------------------------------------------------------

    def _log(self, record: dict) -> None:
        if self._writer:
            record = dict(record)
            step = record.pop("step", 0)
            record.pop("phase", None)
            self._writer.write(step, record)

    # -- training ---------------------------------------------------------

    def run_epoch(
        self,
        state: TrainState,
        real_loader: BalancedLoader,
        render_loader: BalancedLoader,
        phase: str,
        test_loader: TestLoader | None = None,
        log_every: int = 50,
    ) -> TrainState:
        cfg = self.config
        # dual loaders + per-stream BN -> the reference's two-forward step
        # (frozen_bn has no batch statistics, so there is nothing to split)
        use_dual = (
            render_loader is not None
            and cfg.bn_per_stream
            and not cfg.frozen_bn
        )
        step_fn = self.train_step_fn(phase, dual_stream=use_dual)
        n_steps = 0
        t0 = time.time()
        images_done = 0
        for batch in _interleave(real_loader, render_loader):
            if use_dual:
                validate_dual_stream_layout(batch)
            batch = self.shard_batch(batch)
            state, metrics = step_fn(state, batch)
            n_steps += 1
            images_done += int(batch["label"].shape[0])
            if n_steps % log_every == 0 or n_steps == 1:
                # the D2H fetches live only under the logging branches:
                # through the TPU tunnel a host scalar fetch is a true sync,
                # so doing one per step would serialize the loop (CLAUDE.md)
                # ONE D2H transfer for step + all metric scalars (each
                # float(v) would be its own round trip through the tunnel)
                fetched = jax.device_get({"step": state.step, **metrics})
                step = int(fetched.pop("step"))
                m = {k: float(v) for k, v in fetched.items()}
                dt = time.time() - t0
                rec = {
                    "step": step, "phase": phase, **m,
                    # reference scalar name (learnGeodesicBDModel.py:187-189);
                    # 'alpha' comes from the step (post-update, phase-correct)
                    "train_loss": m["loss"],
                    "images_per_sec": images_done / max(dt, 1e-9),
                }
                print(
                    f"[{phase}] step {step} loss {m['loss']:.4f} "
                    f"lc {m['lc']:.4f} lr {m['lr']:.4f} "
                    f"({rec['images_per_sec']:.1f} img/s)",
                    flush=True,
                )
                self._log(rec)
            if (
                test_loader is not None
                and cfg.eval_every
                and n_steps % cfg.eval_every == 0
            ):
                med = self.evaluate(state, test_loader)
                step = int(state.step)
                print(
                    f"[{phase}] step {step} {self.metric_label(med)}",
                    flush=True,
                )
                self._log({"step": step, "med_err": med, "val_loss": med})
                self.val_history.append(med)
            if cfg.max_iterations and n_steps >= cfg.max_iterations:
                break
        return state

    def apply_epoch_lr(self, state: TrainState, epoch: int) -> TrainState:
        """Set the MAIN-epoch learning rate in the injected opt_state
        (cfg.epoch_lr_decay: 'objectnet' | 'step' | 'inv' — see
        schedules.EPOCH_LR_FACTORS). Every stepping reference script calls
        scheduler.step() BEFORE each training() epoch
        (learnObjectnetBDModel.py:190, learnGeodesicRegressionModel.py:234,
        learnCategorizationModel.py:118), so main epoch e (0-based) runs at
        init_lr * factor(e+1); the warm-up pass before the epoch loop ran
        at factor(0)=1. The lr lives as an opt_state leaf
        (optax.inject_hyperparams), so this is a host-side scalar swap
        between compiled steps — Adam moments untouched, no recompilation."""
        from multi_modal_regression_tpu.train.presets import scaled_lr
        from multi_modal_regression_tpu.train.schedules import epoch_lr_factor

        lr = scaled_lr(self.config) * epoch_lr_factor(
            self.config.epoch_lr_decay, epoch + 1
        )
        hp = dict(state.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(
            opt_state=state.opt_state._replace(hyperparams=hp)
        )

    def fit(
        self,
        state: TrainState,
        real_loader: BalancedLoader,
        render_loader: BalancedLoader,
        test_loader: TestLoader | None = None,
    ) -> TrainState:
        cfg = self.config
        # MedErr is lower-better; category accuracy is higher-better
        maximize = self.problem.metric == "category_accuracy"
        best = -float("inf") if maximize else float("inf")
        for _ in range(cfg.num_warmup_epochs):
            state = self.run_epoch(
                state, real_loader, render_loader, "warmup", test_loader
            )
        if cfg.reset_s_between_phases:
            # most two-phase scripts reset s (learnGeodesicBDModel.py:240);
            # learnRiemannianBDModel.py carries the warmup-final s into the
            # main phase (no second assignment after its :133 init)
            state = state.replace(s=jnp.zeros((), jnp.float32))
        for epoch in range(cfg.num_epochs):
            tic = time.time()
            if cfg.epoch_lr_decay is not None:
                state = self.apply_epoch_lr(state, epoch)
            state = self.run_epoch(
                state, real_loader, render_loader, "main", test_loader
            )
            self.save_checkpoint(state)
            if test_loader is not None:
                med = self.evaluate(state, test_loader)
                print(
                    f"Epoch {epoch} done in {time.time() - tic:.1f}s "
                    f"{self.metric_label(med)}",
                    flush=True,
                )
                self._log(
                    {"step": int(state.step), "epoch": epoch, "med_err": med}
                )
                self.val_history.append(med)
                improved = med > best if maximize else med < best
                if improved:  # keep the best-by-headline-metric checkpoint
                    best = med
                    self.save_checkpoint(state, "best")
        if self.workdir and self.val_history:
            # validation-curve history (the reference's plots/<S>.mat,
            # learnGeodesicBDModel.py:257-258)
            np.savez(
                self.workdir / "plots.npz",
                val_loss=np.asarray(self.val_history),
            )
        # every epoch/best save is committed when fit() returns (callers —
        # CLI, parity gate, tests — may read the run dir immediately)
        self.wait_for_checkpoints()
        return state

    # -- evaluation -------------------------------------------------------

    def predict(
        self, state: TrainState, test_loader: TestLoader
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(ytrue, ypred, labels) over the full test set (valid rows only).

        Multi-host: each process runs the eval step LOCALLY over its own
        test-loader stride (host_count/host_index on the loader), then the
        per-host results are process-allgathered so every host returns the
        full-set arrays — the test pass scales across hosts like training.
        """
        if jax.process_count() > 1:
            return self._predict_multihost(state, test_loader)
        preds, trues, labels = [], [], []
        for batch in test_loader:
            valid = batch.pop("valid")
            ypred, ytrue = self._eval_step(state, self.shard_batch(batch))
            preds.append(np.asarray(ypred)[valid])
            trues.append(np.asarray(ytrue)[valid])
            labels.append(batch["label"][valid])
        return (
            np.concatenate(trues),
            np.concatenate(preds),
            np.concatenate(labels),
        )

    def _predict_multihost(self, state, test_loader):
        """Per-host local inference + process allgather.

        The train state is replicated under data parallelism, so each
        process holds a full addressable copy: fetch it once, pin it to the
        first local device, and run the eval step as a process-local
        computation over this host's test stride. (Tensor-parallel meshes
        shard the head banks across hosts — a local copy does not exist;
        predict then requires a single-host run of the checkpoint.)
        """
        from jax.experimental import multihost_utils

        if "model" in self.mesh.axis_names:
            raise NotImplementedError(
                "multi-host predict needs replicated params; run predict "
                "on a data-parallel mesh (tp checkpoints restore fine on "
                "one host)"
            )
        dev = jax.local_devices()[0]
        lstate = jax.device_put(jax.device_get(state), dev)
        preds, trues, labels = [], [], []
        for batch in test_loader:
            valid = batch.pop("valid")
            lbatch = jax.device_put(
                {k: np.asarray(v) for k, v in batch.items()}, dev
            )
            ypred, ytrue = self._eval_step(lstate, lbatch)
            preds.append(np.asarray(ypred)[valid])
            trues.append(np.asarray(ytrue)[valid])
            labels.append(np.asarray(batch["label"])[valid])
        dims = (
            trues[0].shape[1] if trues else
            (4 if self.problem.ydata_type == "quaternion" else 3)
        )
        pdims = preds[0].shape[1] if preds else dims
        local = {
            "ytrue": np.concatenate(trues) if trues else np.zeros((0, dims), np.float32),
            "ypred": np.concatenate(preds) if preds else np.zeros((0, pdims), np.float32),
            "label": np.concatenate(labels) if labels else np.zeros((0,), np.int32),
        }
        n_local = len(local["label"])
        counts = multihost_utils.process_allgather(
            np.asarray([n_local], np.int64)
        ).reshape(-1)
        n_max = int(counts.max()) if len(counts) else 0

        def _pad(a):
            pad = n_max - len(a)
            if pad:
                a = np.concatenate([a, np.zeros((pad, *a.shape[1:]), a.dtype)])
            return a

        gathered = multihost_utils.process_allgather(
            {k: _pad(np.asarray(v, np.float32 if v.ndim > 1 else v.dtype))
             for k, v in local.items()},
            tiled=False,
        )
        # unpad each host's block, concatenate in process order
        out = {}
        for k, g in gathered.items():
            g = np.asarray(g)
            out[k] = np.concatenate(
                [g[p, : int(counts[p])] for p in range(len(counts))]
            )
        # image-strided loaders (TestLoader: host p reads indices
        # p::host_count in order) let us invert the stride and return rows
        # in test-set index order — matching the single-host output
        # row-for-row. Crop-level loaders (MatCropLoader strides FILES with
        # variable crops each) have no analytic inverse; their rows stay in
        # host-block order (metrics are row-permutation invariant).
        if hasattr(test_loader, "_ids"):
            n_total = int(counts.sum())
            P = len(counts)
            # the inverse is only valid if every host yielded exactly its
            # full stride p::P — a loader that drops mid-stream rows (not
            # just tail padding) would silently misplace rows otherwise;
            # fall back to host-block order in that case (metrics are
            # row-permutation invariant)
            stride_ok = all(
                int(counts[p]) == len(range(p, n_total, P)) for p in range(P)
            )
            if stride_ok:
                gids = np.concatenate(
                    [np.arange(p, n_total, P) for p in range(P)]
                )
                order = np.argsort(gids, kind="stable")
                out = {k: v[order] for k, v in out.items()}
        return out["ytrue"], out["ypred"], out["label"].astype(np.int32)

    def metric_label(self, value: float) -> str:
        """Human-readable headline metric ('MedErr 12.3 deg' / 'Acc 0.93')
        — the category scripts log accuracy, not pose error
        (learnCategorizationModel.py:118)."""
        if self.problem.metric == "category_accuracy":
            return f"Acc {value:.4f}"
        return f"MedErr {value:.3f} deg"

    def evaluate(self, state: TrainState, test_loader: TestLoader) -> float:
        """Headline metric: MedErr (get_error2 parity, axisAngle.py:70-95)
        for pose problems, mean per-class accuracy for category problems
        (helperFunctions.get_accuracy)."""
        ytrue, ypred, labels = self.predict(state, test_loader)
        if self.problem.metric == "category_accuracy":
            from multi_modal_regression_tpu.metrics.pose_error import (
                mean_class_accuracy,
            )

            return mean_class_accuracy(labels, ypred, self.config.num_classes)
        rep = (
            "quaternion" if self.problem.ydata_type == "quaternion" else "axis_angle"
        )
        return mean_class_median_error(
            ytrue, ypred, labels, self.config.num_classes, representation=rep
        )
