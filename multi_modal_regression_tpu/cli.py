"""Command-line interface.

Replaces the reference's ~50 flat scripts with four subcommands over the
preset system (flag names follow the reference where they exist —
learnGeodesicBDModel.py:28-45):

  train         python -m multi_modal_regression_tpu.cli train \\
                    --preset geodesic_bd --data-root data/ \\
                    --dictionary data/kmeans_200.npz --save-str g0
  evaluate      snapshot-ensemble protocol (evaluate*.py): fine-tune from a
                checkpoint with cyclical LR, snapshot at LR minima, ensemble
  dictionary    learn a kmeans/GMM pose dictionary from render filenames
                (learnKmeansDictionary.py / learnGMMDictionary.py)
  prepare-data  synthetic dataset generation (tests / smoke runs)
  pack          prebuild the packed uint8 crop caches for these flags
                (multi-host: run once before the --distributed launch)

Data layout (reference convention): <data-root>/<real-subdir>/<class>/*.png
with filename-encoded poses, same for render and test subdirs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _add_common_data_args(
    p: argparse.ArgumentParser, required_data_root: bool = True
) -> None:
    p.add_argument("--data-root", type=str, required=required_data_root,
                   default=None if required_data_root else ".")
    p.add_argument("--real-subdir", type=str, default="augmented2")
    p.add_argument("--render-subdir", type=str, default="renderforcnn")
    p.add_argument("--test-subdir", type=str, default="test")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--dbinfo", type=str, default=None,
                   help="dbinfo.mat with a 'classes' list (ObjectNet3D, "
                        "learnObjectnetBDModel.py:54-56); default: the 12 "
                        "PASCAL3D+ classes")
    p.add_argument("--protocol", choices=("balanced", "flat"), default=None,
                   help="'balanced' = class-balanced real+render loaders; "
                        "'flat' = single shuffled flat train loader "
                        "(ObjectNet protocol). Default: flat for "
                        "objectnet_* presets, balanced otherwise")
    p.add_argument("--test-protocol", choices=("filenames", "mat"),
                   default="filenames",
                   help="'filenames' = PNG test tree with pose-encoded "
                        "names (TestImages); 'mat' = precomputed per-image "
                        ".mat crop sets (the Pascal3dAll protocol: "
                        "ablationGeodesicBDModel.py:72-74, "
                        "learnClassificationModel.py:146-149)")
    p.add_argument("--mat-root", type=str, default=None,
                   help="root of the .mat crop trees for --test-protocol "
                        "mat (default <data-root>/original)")
    p.add_argument("--mat-split", choices=("val", "test"), default="test",
                   help="'val' = pascal_train crops (ablation model "
                        "selection), 'test' = pascal_val")
    p.add_argument("--packed-cache", type=str, default=None,
                   help="pre-decoded uint8 crop cache (data/packed.py): "
                        "'auto' packs into <data-root>/.packed on first "
                        "use and reuses it after, or give an explicit "
                        "cache root. Replaces per-image PNG decodes with "
                        "memmap gathers (~16x host throughput, "
                        "benchmarks/bench_loader.py). Packs every "
                        "protocol: balanced/flat train trees, the "
                        "filenames test tree, and the mat crop sets "
                        "(one loadmat+resize pass instead of one per "
                        "snapshot).")


def _add_config_overrides(p: argparse.ArgumentParser) -> None:
    # reference flag spellings kept where they exist
    p.add_argument("--save-str", type=str, default="run")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--dict-size", type=int, default=None)
    p.add_argument("--N0", type=int, default=None)
    p.add_argument("--N1", type=int, default=None)
    p.add_argument("--N2", type=int, default=None)
    p.add_argument("--N3", type=int, default=None)
    p.add_argument("--init-lr", type=float, default=None)
    p.add_argument("--num-epochs", type=int, default=None)
    p.add_argument("--num-warmup-epochs", type=int, default=None)
    p.add_argument("--max-iterations", type=int, default=None)
    p.add_argument("--items-per-batch", type=int, default=None)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--feature-network", type=str, default=None)
    p.add_argument("--feature-layer", type=str, default=None)
    p.add_argument("--multires", action="store_true", default=None)
    p.add_argument("--compute-dtype", type=str, default=None,
                   choices=("float32", "bfloat16"))
    p.add_argument("--remat", type=str, default=None,
                   choices=("none", "block", "stage", "conv", "dots",
                            "nothing"),
                   help="backward-pass rematerialization policy "
                        "(train/remat.py)")
    p.add_argument("--optimizer-dtype", type=str, default=None,
                   choices=("float32", "bfloat16"),
                   help="Adam first-moment storage (bfloat16 default; "
                        "float32 = reference-exact torch.optim.Adam)")
    p.add_argument("--lr-scaling", type=str, default=None,
                   choices=("none", "linear", "sqrt"),
                   help="global-batch LR rule: scale init_lr by "
                        "(items-per-batch/8) [linear] or its sqrt when "
                        "scaling the step out over a dp mesh (SCALING.md)")
    p.add_argument("--frozen-bn", action="store_true", default=None,
                   help="SEMANTICS-CHANGING fast mode: BatchNorm stays in "
                        "eval mode during training (running stats; the "
                        "model.eval() fine-tune quirk of "
                        "learnSimpleBDModel_rene.py:133) — for fine-tuning "
                        "converged models, e.g. snapshot-ensemble eval")
    p.add_argument("--device-resize-from", type=int, default=None,
                   help="ship raw images at this size; resize on device")
    p.add_argument("--checkpoint-async",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="write checkpoints on a background thread "
                        "(single-process runs; default on — the D2H fetch "
                        "stays synchronous, the disk IO leaves the loop)")
    p.add_argument("--train-flip", action="store_true", default=None,
                   help="random horizontal flips (+pose transform) in-step")
    p.add_argument("--workdir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--compile-cache", type=str, default=None,
                   help="persistent XLA compilation-cache dir ('off' to "
                        "disable; default ~/.cache/multi_modal_regression_"
                        "tpu/xla — first compiles through a TPU tunnel "
                        "take minutes, cached reloads don't)")


# the ExperimentConfig fields _add_config_overrides exposes; shared by every
# subcommand that builds a config so no flag is silently dropped
_OVERRIDE_FIELDS = (
    "num_classes", "dict_size", "N0", "N1", "N2", "N3", "init_lr",
    "num_epochs", "num_warmup_epochs", "max_iterations",
    "items_per_batch", "image_size", "feature_network", "feature_layer",
    "multires", "compute_dtype", "device_resize_from", "train_flip",
    "remat", "optimizer_dtype", "lr_scaling", "frozen_bn",
    "checkpoint_async",
)


def _setup_compile_cache(args) -> None:
    """Enable the persistent XLA compilation cache (default on).

    Compiles of the full train step take 20-40 s locally and minutes
    through a TPU tunnel; the cache makes repeat invocations (resume,
    evaluate-after-train, parity-gate stages) skip them. Must run before
    the first jit; safe to call with the backend already initialized.
    """
    choice = getattr(args, "compile_cache", None)
    if choice == "off":
        return
    import jax

    if choice is None and jax.config.jax_compilation_cache_dir:
        return  # a cache is already configured (e.g. tests' conftest)
    d = Path(choice) if choice else (
        Path.home() / ".cache" / "multi_modal_regression_tpu" / "xla"
    )
    try:
        d.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(d))
    except Exception as e:  # unwritable cache dir is never fatal
        print(f"compile cache disabled ({e})", flush=True)


def _overrides_from_args(args) -> dict:
    overrides = {}
    for field in _OVERRIDE_FIELDS:
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    return overrides


def _config_from_args(args) -> "object":
    from multi_modal_regression_tpu.train import get_config

    overrides = _overrides_from_args(args)
    if (
        "num_classes" not in overrides
        and getattr(args, "dbinfo", None)
    ):
        overrides["num_classes"] = len(_classes_from_args(args))
    if (
        "dict_size" not in overrides
        and getattr(args, "dictionary", None)
    ):
        # the reference reads num_clusters off the pickle
        # (`num_clusters = kmeans.n_clusters`, learnGeodesicBDModel.py:59);
        # likewise the loaded dictionary defines dict_size unless
        # explicitly overridden — a preset-default 200-head bank against an
        # 8-atom dictionary is a shape error (or worse, silent) downstream
        d = _load_dictionary_cached(args.dictionary)
        if d is not None:
            atoms = getattr(d, "cluster_centers", None)
            if atoms is None:
                atoms = d.means  # GMMDictionary
            overrides["dict_size"] = int(len(atoms))
    return get_config(args.preset, **overrides)


# one read per CLI invocation: _config_from_args sniffs dict_size off the
# dictionary and each cmd_* then hands the same object to its Trainer —
# without the cache every run parsed the npz three times. Keyed by the
# literal path string; cmd_dictionary's write-then-reload sanity check
# bypasses it on purpose (the file changes under the same path there).
_DICTIONARY_CACHE: dict = {}


def _load_dictionary_cached(path: str | None):
    if path is None:
        return None
    if path not in _DICTIONARY_CACHE:
        _DICTIONARY_CACHE[path] = _load_dictionary(path)
    return _DICTIONARY_CACHE[path]


def _load_dictionary(path: str | None):
    if path is None:
        return None
    import numpy as np

    from multi_modal_regression_tpu.dictionary.gmm import GMMDictionary
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary

    with np.load(path) as f:
        keys = set(f.files)
    if "means" in keys:
        return GMMDictionary.load(path)
    return KMeansDictionary.load(path)


def _classes_from_args(args):
    if getattr(args, "dbinfo", None):
        import numpy as np
        import scipy.io as spio

        tmp = spio.loadmat(args.dbinfo, squeeze_me=True)
        return tuple(str(c).strip() for c in np.atleast_1d(tmp["classes"]))
    from multi_modal_regression_tpu.data import PASCAL3D_CLASSES

    # --num-classes N without --dbinfo means "the first N PASCAL3D+
    # classes": the data index MUST agree with the model's per-class head
    # bank — labels beyond num_classes would gather out of bounds in the
    # compiled step (jnp fill semantics -> NaN losses, found by a verify
    # drive, not an error message)
    n = getattr(args, "num_classes", None)
    if n:
        if n > len(PASCAL3D_CLASSES):
            raise SystemExit(
                f"--num-classes {n} exceeds the {len(PASCAL3D_CLASSES)} "
                "PASCAL3D+ classes; pass --dbinfo for a custom class list"
            )
        return PASCAL3D_CLASSES[:n]
    return PASCAL3D_CLASSES


def _packed_cache_dir(args, load_size: int, subdir: str,
                      kind: str | None = None,
                      split: str | None = None) -> Path:
    from multi_modal_regression_tpu.data.packed import default_cache_dir

    tree = (
        Path(args.mat_root or (Path(args.data_root) / "original"))
        if kind == "mat"
        else Path(args.data_root) / subdir
    )
    if args.packed_cache == "auto":
        # one shared layout definition (data/packed.py): caches live next
        # to their tree, reused by pack/train/evaluate/verify-parity
        return default_cache_dir(tree, load_size, kind=kind, split=split)
    # explicit cache root: two datasets whose trees share a basename
    # (every prep writes 'train'/'original') must not fight over one
    # cache dir — key by a digest of the resolved tree path
    import hashlib

    tag = hashlib.sha256(str(tree.resolve()).encode()).hexdigest()[:8]
    tail = "_".join(
        [tree.name, tag] + ([split] if split else []) + [f"{load_size}px"]
        + ([kind] if kind else [])
    )
    new = Path(args.packed_cache) / tail
    # migration: reuse a pre-digest-layout cache instead of silently
    # re-decoding the whole tree (pack_index still staleness-checks it)
    legacy = Path(args.packed_cache) / "_".join(
        [subdir if kind != "mat" else tree.name]
        + ([split] if split else []) + [f"{load_size}px"]
        + ([kind] if kind else [])
    )
    if not (new / "meta.json").exists() and (legacy / "meta.json").exists():
        return legacy
    return new


def _make_test_loader(args, cfg, classes, load_size,
                      host_count: int = 1, host_index: int = 0):
    from multi_modal_regression_tpu.data import FlatTestIndex, MatCropIndex, TestLoader
    from multi_modal_regression_tpu.data.loader import MatCropLoader

    hosts = dict(host_count=host_count, host_index=host_index)
    root = Path(args.data_root)
    if getattr(args, "test_protocol", "filenames") == "mat":
        mat_root = args.mat_root or str(root / "original")
        # evaluate at the resolution the experiment trains at — the
        # .mat crops are whatever the prep wrote (224); a config with
        # --image-size 112 must not silently evaluate at 224
        index = MatCropIndex(mat_root, args.mat_split, classes=classes)
        if getattr(args, "packed_cache", None):
            from multi_modal_regression_tpu.data import (
                PackedMatCropLoader,
                pack_mat_index,
            )

            pack = pack_mat_index(
                index,
                _packed_cache_dir(
                    args, cfg.image_size, "original",
                    kind="mat", split=args.mat_split,
                ),
                image_size=cfg.image_size, num_workers=args.num_workers,
                wait_for_builder=host_index > 0,
            )
            return PackedMatCropLoader(
                index, pack, batch_size=cfg.eval_batch, **hosts
            )
        return MatCropLoader(
            index,
            batch_size=cfg.eval_batch,
            image_size=cfg.image_size,
            num_workers=args.num_workers, **hosts,
        )
    index = FlatTestIndex(str(root / args.test_subdir), classes=classes)
    if getattr(args, "packed_cache", None):
        from multi_modal_regression_tpu.data import PackedTestLoader, pack_index

        pack = pack_index(
            index, _packed_cache_dir(args, load_size, args.test_subdir),
            image_size=load_size, num_workers=args.num_workers,
            wait_for_builder=host_index > 0,
        )
        return PackedTestLoader(
            index, pack, batch_size=cfg.eval_batch, **hosts
        )
    return TestLoader(
        index, cfg.eval_batch, load_size,
        num_workers=args.num_workers, **hosts,
    )


def _add_distributed_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: call jax.distributed.initialize "
                        "and stride the input pipeline per host (run this "
                        "command on every host)")
    p.add_argument("--coordinator-address", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _maybe_init_distributed(args) -> tuple[int, int]:
    """jax.distributed multi-host wiring (--distributed; SURVEY §2.4 DCN
    row). Must run before loaders/Trainer touch the backend. Returns
    (host_count, host_index) for the loader input striding."""
    if not getattr(args, "distributed", False):
        return 1, 0
    from multi_modal_regression_tpu.parallel.multihost import initialize

    count, index = initialize(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(f"distributed: process {index}/{count}", flush=True)
    return count, index


def _make_loaders(args, cfg, host_count: int = 1, host_index: int = 0):
    from multi_modal_regression_tpu.data import (
        BalancedLoader,
        ClassBalancedIndex,
        FlatLoader,
        FlatTestIndex,
    )

    classes = _classes_from_args(args)
    if cfg.num_classes != len(classes):
        # e.g. --dbinfo naming 100 classes combined with --num-classes 4:
        # the index's labels must match the head bank exactly
        raise SystemExit(
            f"--num-classes {cfg.num_classes} disagrees with the "
            f"{len(classes)}-class list from --dbinfo/defaults"
        )
    protocol = args.protocol or (
        "flat" if cfg.preset.startswith("objectnet") else "balanced"
    )
    hosts = dict(host_count=host_count, host_index=host_index)
    # with the on-device resize fast path, loaders ship raw-size images
    load_size = cfg.device_resize_from or cfg.image_size
    root = Path(args.data_root)
    if protocol == "flat":
        # single shuffled flat train loader over <root>/train, test over
        # <root>/test (learnObjectnetBDModel.py:50-51,74-75)
        train_index = FlatTestIndex(str(root / "train"), classes=classes)
        if getattr(args, "packed_cache", None):
            from multi_modal_regression_tpu.data import (
                PackedFlatLoader,
                pack_index,
            )

            pack = pack_index(
                train_index, _packed_cache_dir(args, load_size, "train"),
                image_size=load_size, num_workers=args.num_workers,
                # non-primary hosts adopt the primary's build (one decode
                # pass per cluster, not per process)
                wait_for_builder=host_index > 0,
            )
            train = PackedFlatLoader(
                train_index, pack, batch_size=cfg.items_per_batch * 12,
                seed=cfg.seed, **hosts,
            )
        else:
            train = FlatLoader(
                train_index,
                batch_size=cfg.items_per_batch * 12, image_size=load_size,
                num_workers=args.num_workers, seed=cfg.seed, **hosts,
            )
        return train, None, _make_test_loader(
            args, cfg, classes, load_size, host_count, host_index
        )
    # --train-data selects real/render/both (the ablationGBDAugmentation.py
    # --type protocol; 'both' is the standard two-loader training)
    which = getattr(args, "train_data", "both")

    def balanced(subdir: str, db_type: str):
        index = ClassBalancedIndex(
            str(root / subdir), db_type, classes=classes
        )
        if getattr(args, "packed_cache", None):
            from multi_modal_regression_tpu.data import (
                PackedBalancedLoader,
                pack_index,
            )

            pack = pack_index(
                index, _packed_cache_dir(args, load_size, subdir),
                image_size=load_size, num_workers=args.num_workers,
                wait_for_builder=host_index > 0,
            )
            return PackedBalancedLoader(
                index, pack, items_per_batch=cfg.items_per_batch,
                seed=cfg.seed, **hosts,
            )
        return BalancedLoader(
            index, cfg.items_per_batch, load_size,
            num_workers=args.num_workers, seed=cfg.seed, **hosts,
        )

    real = render = None
    if which in ("both", "real"):
        real = balanced(args.real_subdir, "real")
    if which in ("both", "render"):
        render = balanced(args.render_subdir, "render")
    if real is None:  # render-only: it drives the loop
        real, render = render, None
    return real, render, _make_test_loader(
        args, cfg, classes, load_size, host_count, host_index
    )


def cmd_train(args) -> int:
    host_count, host_index = _maybe_init_distributed(args)
    _setup_compile_cache(args)

    from multi_modal_regression_tpu.train import Trainer

    cfg = _config_from_args(args)
    workdir = args.workdir or f"runs/{args.save_str}"
    trainer = Trainer(
        cfg, dictionary=_load_dictionary_cached(args.dictionary), workdir=workdir
    )
    real, render, test = _make_loaders(args, cfg, host_count, host_index)
    if args.resume:
        state = trainer.restore_checkpoint()
        print(f"resumed from step {int(state.step)}", flush=True)
    else:
        state = trainer.init_state()
        if args.pretrained_backbone:
            state = _load_pretrained(trainer, state, args.pretrained_backbone)
        if args.warm_start_workdir:
            state = _warm_start(trainer, state, args)
    state = trainer.fit(state, real, render, test_loader=test)
    trainer.save_checkpoint(state, "final")
    med = trainer.evaluate(state, test)  # overlaps the background save
    trainer.wait_for_checkpoints()
    print(f"final {trainer.metric_label(med)}", flush=True)
    return 0


def cmd_pack(args) -> int:
    """Prebuild the packed uint8 crop caches (data/packed.py) a
    train/evaluate run with these flags would use, then stop.

    Multi-host recipe: run `pack` once (any host) before launching the N
    `--distributed` processes — every host then mmaps the shared cache.
    Concurrent race-building is SAFE (atomic install, pack_index), but
    each losing host decodes the whole tree once for nothing.
    """
    if not getattr(args, "packed_cache", None):
        args.packed_cache = "auto"
    cfg = _config_from_args(args)
    real, render, test = _make_loaders(args, cfg)
    for name, ld in (("train", real), ("render", render), ("test", test)):
        pack = getattr(ld, "pack", None)
        if pack is not None:
            n = sum(len(v) for v in pack.meta["classes"].values())
            print(f"packed {name}: {pack.cache_dir} ({n} images "
                  f"@ {pack.image_size}px)", flush=True)
    return 0


def _load_pretrained(trainer, state, path: str):
    from multi_modal_regression_tpu.models.pretrained import (
        load_torchvision_backbone,
    )

    params, batch_stats = load_torchvision_backbone(
        path, trainer.config.feature_network
    )
    new_params = dict(state.params)
    new_params["feature_model"] = params
    new_stats = dict(state.batch_stats)
    new_stats["feature_model"] = batch_stats
    print(f"loaded pretrained backbone from {path}", flush=True)
    return state.replace(params=new_params, batch_stats=new_stats)


def _warm_start(trainer, state, args):
    """Two-stage chaining: graft a source run's checkpoint into this model.

    --warm-start-kind:
      classifier  classification model -> BD bin branch
                  (learnSimpleBDModel_rene.py:89-130)
      oracle      BD/regression oracle -> joint cat+pose model
                  (learnJointCatPoseModel_*.py two-stage pipelines)
    """
    from multi_modal_regression_tpu.models.surgery import (
        graft_classifier_into_bd,
        graft_oracle_into_joint,
    )
    from multi_modal_regression_tpu.train import Trainer, get_config

    src_cfg = get_config(
        args.warm_start_preset,
        **{
            k: getattr(trainer.config, k)
            for k in ("feature_network", "feature_layer", "num_classes",
                      "N0", "N1", "N2", "image_size")
        },
        dict_size=trainer.config.dict_size,
    )
    src_trainer = Trainer(
        src_cfg,
        dictionary=_load_dictionary_cached(args.dictionary),
        workdir=args.warm_start_workdir,
    )
    src_state = src_trainer.restore_checkpoint(args.warm_start_checkpoint)
    dst = {"params": state.params, "batch_stats": state.batch_stats}
    src = {"params": src_state.params, "batch_stats": src_state.batch_stats}
    if args.warm_start_kind == "classifier":
        grafted = graft_classifier_into_bd(dst, src)
    else:
        grafted = graft_oracle_into_joint(dst, src, trainer.config.model_kind)
    print(
        f"warm-started ({args.warm_start_kind}) from "
        f"{args.warm_start_workdir}", flush=True,
    )
    return state.replace(
        params=grafted["params"], batch_stats=grafted["batch_stats"]
    )


def cmd_evaluate(args) -> int:
    # the 9-epoch fine-tune protocol costs as much as training — it gets
    # the same multi-host sharding (initialize BEFORE any backend use)
    host_count, host_index = _maybe_init_distributed(args)
    _setup_compile_cache(args)

    from multi_modal_regression_tpu.train import SnapshotEnsembleEvaluator, Trainer

    cfg = _config_from_args(args)
    workdir = args.workdir or f"runs/{args.save_str}"
    trainer = Trainer(
        cfg, dictionary=_load_dictionary_cached(args.dictionary), workdir=workdir
    )
    real, render, test = _make_loaders(args, cfg, host_count, host_index)
    state = trainer.restore_checkpoint(args.checkpoint)
    ev = SnapshotEnsembleEvaluator(
        trainer,
        workdir=(
            Path(workdir) / f"results_{args.save_str}"
            if host_index == 0 else None  # one writer per job
        ),
    )
    ev.run(state, real, render, test, num_epochs=args.eval_num_epochs)
    med, _ = ev.ensemble()
    per_snap = [round(s.med_err, 4) for s in ev.snapshots]
    print(f"snapshot MedErrs: {per_snap}", flush=True)
    print(f"ensembled MedErr: {med:.4f} deg", flush=True)
    return 0


def cmd_predict(args) -> int:
    """Pure inference from a checkpoint: GT test crops (the
    evaluateJointModel.py protocol) or detector crops
    (evaluateModelDetectedBBoxes.py) when --det-path is given."""
    host_count, host_index = _maybe_init_distributed(args)
    _setup_compile_cache(args)

    import numpy as np

    from multi_modal_regression_tpu.train import Trainer

    if args.analysis and args.det_path:
        raise SystemExit(
            "--analysis and --det-path are mutually exclusive protocols "
            "(evaluateJointModel vs evaluateModelDetectedBBoxes); run two "
            "predict invocations"
        )

    cfg = _config_from_args(args)
    workdir = args.workdir or f"runs/{args.save_str}"
    dictionary = _load_dictionary_cached(args.dictionary)
    trainer = Trainer(cfg, dictionary=dictionary, workdir=workdir)

    if args.analysis:
        # evaluateJointModel[2].py: the SAME per-class analysis forward over
        # up to four checkpoints, one combined results .mat
        from multi_modal_regression_tpu.train.analysis import (
            analysis_report,
            parse_analysis_runs,
            run_joint_analysis,
            save_analysis_mat,
        )

        if not hasattr(trainer.model, "analysis"):
            raise SystemExit(
                f"--analysis needs a joint BD preset (model_kind joint_bd_*)"
                f", not {cfg.model_kind!r}"
            )
        runs = parse_analysis_runs(
            args.checkpoint.split(","),
            args.analysis_names.split(",") if args.analysis_names else None,
        )
        centers = getattr(dictionary, "cluster_centers", None)
        if centers is None:
            centers = dictionary.means
        results = {}
        test = None
        if host_index == 0:
            # the analysis stream itself runs on process 0 only, over the
            # FULL test set (host_count=1: no stride) with a local state
            # copy — the det-path pattern below
            test = _make_test_loader(
                args, cfg, _classes_from_args(args),
                cfg.device_resize_from or cfg.image_size, 1, 0,
            )
        for name, ckpt in runs:
            # checkpoint restore is a collective over the GLOBAL mesh:
            # EVERY process participates for every checkpoint (non-zero
            # hosts idle at the next restore while process 0 analyzes)
            state = trainer.restore_checkpoint(ckpt)
            if host_index != 0:
                continue
            if host_count > 1:
                import jax

                state = jax.device_put(
                    jax.device_get(state), jax.local_devices()[0]
                )
            r = run_joint_analysis(
                trainer, state, test, centers, shard=(host_count == 1)
            )
            results[name] = r
            rep = analysis_report(r, cfg.num_classes)
            print(f"{name}: cat acc {rep['cat_acc']:.4f} | "
                  f"MedErr oracle {rep['mederr_oracle']:.2f} deg "
                  f"(Acc@30 {rep['acc30_oracle']:.1f}%) | "
                  f"pred-cat {rep['mederr_predcat']:.2f} deg "
                  f"(Acc@30 {rep['acc30_predcat']:.1f}%) | "
                  f"{len(r['ytrue_cat'])} samples", flush=True)
        if host_index != 0:
            return 0
        out = Path(workdir) / f"results_{args.save_str}_analysis.mat"
        save_analysis_mat(out, results)
        print(f"wrote {out}", flush=True)
        return 0

    state = trainer.restore_checkpoint(args.checkpoint)

    if args.det_path:
        # the detection stream is per-image local compute with one results
        # file: run it on process 0 only (no sharded path; other hosts of a
        # --distributed job just exit)
        if host_index != 0:
            return 0
        if host_count > 1:
            # the restored state is replicated over the GLOBAL mesh, which
            # one process cannot execute alone — pin a local copy first
            # (the Trainer._predict_multihost pattern)
            import jax

            state = jax.device_put(
                jax.device_get(state), jax.local_devices()[0]
            )
        from multi_modal_regression_tpu.detection import (
            DetectionSetIndex,
            run_detection_inference,
            save_results_mat,
        )

        from multi_modal_regression_tpu.train.presets import (
            resolve_compute_dtype,
        )

        index = DetectionSetIndex(args.det_path)
        bboxes, ypred, labels, _scores = run_detection_inference(
            trainer.apply_fn, trainer.problem, state, index,
            batch_size=cfg.eval_batch,
            compute_dtype=resolve_compute_dtype(cfg.compute_dtype),
        )
        det_name = Path(args.det_path).name
        out = Path(workdir) / f"results_{args.save_str}_{det_name}.mat"
        save_results_mat(out, bboxes, ypred, labels)
        n = sum(len(b) for b in labels)
        print(f"wrote {out} ({n} detections over {len(index)} images)", flush=True)
        return 0

    # full test-protocol support (filenames PNG tree, packed cache, or the
    # Pascal3dAll .mat crop protocol) — same loader construction as
    # train/evaluate
    test = _make_test_loader(
        args, cfg, _classes_from_args(args),
        cfg.device_resize_from or cfg.image_size, host_count, host_index,
    )
    ytrue, ypred, labels = trainer.predict(state, test)
    out = Path(workdir) / f"results_{args.save_str}.npz"
    if host_index == 0:  # predict() allgathers: every host has the full set
        np.savez(out, ytest=ytrue, yhat_test=ypred, test_labels=labels)
    # headline metric from the arrays already in hand — a second
    # trainer.evaluate() would re-run the whole test inference
    if trainer.problem.metric == "category_accuracy":
        from multi_modal_regression_tpu.metrics.pose_error import (
            mean_class_accuracy,
        )

        med = mean_class_accuracy(labels, ypred, cfg.num_classes)
    else:
        from multi_modal_regression_tpu.metrics.pose_error import (
            mean_class_median_error,
        )

        med = mean_class_median_error(
            ytrue, ypred, labels, cfg.num_classes,
            representation=(
                "quaternion"
                if trainer.problem.ydata_type == "quaternion"
                else "axis_angle"
            ),
        )
    # every host computed the same allgathered arrays; one host reports
    if host_index == 0 and trainer.problem.metric == "pose":
        from multi_modal_regression_tpu.metrics import per_class_report

        rep = (
            "quaternion"
            if trainer.problem.ydata_type == "quaternion" else "axis_angle"
        )
        names = _classes_from_args(args)
        if len(names) != cfg.num_classes:
            names = tuple(f"class{i}" for i in range(cfg.num_classes))
        table = per_class_report(ytrue, ypred, labels, names, representation=rep)
        for name, row in table.items():
            print(
                f"  {name:>14s}: MedErr {row['median_err_deg']:7.2f} deg  "
                f"Acc@30 {row['acc_30deg']:5.1f}%  (n={row['count']})",
                flush=True,
            )
    if host_index == 0:
        print(f"wrote {out}; MedErr {med:.4f}", flush=True)
    return 0


def cmd_dictionary(args) -> int:
    _setup_compile_cache(args)
    from multi_modal_regression_tpu.tools.parity import gather_tree_poses

    # gather all render poses from filenames (learnKmeansDictionary.py:25-37)
    y = gather_tree_poses(
        args.data_root, args.db_type, classes=_classes_from_args(args)
    )
    print(f"{len(y)} poses parsed", flush=True)
    if args.type == "kmeans":
        from multi_modal_regression_tpu.dictionary.kmeans import fit_kmeans

        d = fit_kmeans(y, args.size, seed=args.seed)
        print(f"kmeans fitted: inertia {d.inertia:.4f}", flush=True)
    else:
        from multi_modal_regression_tpu.dictionary.gmm import fit_gmm

        d = fit_gmm(y, args.size, seed=args.seed)
        print(f"gmm fitted: log-likelihood {d.log_likelihood:.4f}", flush=True)
    d.save(args.out)
    # reload sanity check (learnKmeansDictionary.py:49-53)
    reloaded = _load_dictionary(args.out)
    n = getattr(reloaded, "n_clusters", None) or reloaded.n_components
    print(f"saved {args.out} ({n} atoms); reload OK", flush=True)
    return 0


def cmd_prepare_data(args) -> int:
    if args.dataset == "pascal3d":
        from multi_modal_regression_tpu.tools.ingest import prepare_pascal3d

        if not args.db_path:
            raise SystemExit("--db-path is required for --dataset pascal3d")
        voc = args.voc_dir or str(
            Path(args.db_path) / "PASCAL" / "VOCdevkit" / "VOC2012"
        )
        classes = (
            tuple(args.classes.split(","))
            if args.classes else _classes_from_args(args)
        )
        prepare_pascal3d(
            args.db_path, voc, args.out,
            classes=classes,
            kinds=tuple(args.kinds.split(",")),
            workers=args.workers,
        )
        print(f"wrote {args.out}", flush=True)
        return 0
    if args.dataset == "objectnet3d":
        from multi_modal_regression_tpu.tools.ingest import prepare_objectnet3d

        if not args.db_path:
            raise SystemExit("--db-path is required for --dataset objectnet3d")
        prepare_objectnet3d(args.db_path, args.out, workers=args.workers)
        print(f"wrote {args.out}", flush=True)
        return 0

    from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

    synth_kwargs = {}
    if args.classes:  # default: the full PASCAL3D+ list
        synth_kwargs["classes"] = tuple(args.classes.split(","))
    for i, sub in enumerate((args.real_subdir, args.render_subdir, args.test_subdir)):
        root = generate_pose_dataset(
            Path(args.out) / sub,
            images_per_class=args.images_per_class,
            image_size=args.image_size,
            # deterministic per-subdir seed (hash() is process-randomized)
            seed=args.seed + 1000 * (i + 1),
            pattern=args.pattern,
            **synth_kwargs,
        )
        print(f"wrote {root}", flush=True)
    return 0


def cmd_prepare_detections(args) -> int:
    """Parse third-party detector outputs and crop them into the
    `dbinfo.mat + all/<img>.mat` layout `predict --det-path` consumes
    (the setupDataDetection_{vk,r4cnn,maskrcnn}.m pipelines, plus the
    setupDataDetected_objectnet3d.m Fast-RCNN driver)."""
    from multi_modal_regression_tpu.tools.ingest import (
        parse_maskrcnn_results,
        parse_r4cnn_detections,
        parse_vk_detections,
        prepare_detection_set,
        prepare_objectnet_detected,
        read_image_set,
    )

    classes = _classes_from_args(args)
    if args.detector == "objectnet":
        # per-class detections_<cls>.txt trees; no VOC image-set file —
        # the image list is the union of the detection files' rows
        n = prepare_objectnet_detected(
            args.det_source, args.images_dir, args.out, classes,
            size=args.image_size, workers=args.workers,
        )
        print(f"wrote {args.out} ({n} detections)", flush=True)
        return 0
    if args.image_set is None:
        raise SystemExit("--image-set is required for this detector")
    image_names = read_image_set(args.image_set)
    if args.detector == "vk":
        dets = parse_vk_detections(args.det_source, num_images=len(image_names))
    elif args.detector == "r4cnn":
        dets = parse_r4cnn_detections(
            args.det_source, classes=classes, num_images=len(image_names)
        )
    else:
        det_classes = classes
        if args.detector_classes:
            det_classes = tuple(args.detector_classes.split(","))
        dets = parse_maskrcnn_results(
            args.det_source, image_names, classes=det_classes
        )
    prepare_detection_set(
        args.images_dir, image_names, dets, args.out,
        size=args.image_size, workers=args.workers,
    )
    n = sum(len(b) for b, _ in dets)
    print(f"wrote {args.out} ({n} detections over {len(image_names)} images)",
          flush=True)
    return 0


def cmd_evaluate_detections(args) -> int:
    """AVP/ARP in one command (the computeAVP.m / computeARP.m stage):
    results .mat (from `predict --det-path`) + PASCAL3D+ Annotations tree
    -> per-class AP / AVP / ARP / MedErr table."""
    from multi_modal_regression_tpu.detection import (
        DetectionSetIndex,
        build_voc_ground_truth,
        evaluate_detection_results,
        load_results_mat,
    )

    classes = _classes_from_args(args)
    index = DetectionSetIndex(args.det_path)
    bboxes, ypred, labels, scores = load_results_mat(args.results)
    if len(bboxes) != len(index):
        raise SystemExit(
            f"results file has {len(bboxes)} images, detection set has "
            f"{len(index)}"
        )
    annos = build_voc_ground_truth(args.annotations, index.image_names, classes)
    table = evaluate_detection_results(
        annos, bboxes, ypred, labels, classes, scores=scores,
        nbins=args.nbins,
    )
    header = f"{'class':>14s}  {'AP':>7s} {'AVP':>7s} {'ARP':>7s} " \
             f"{'MedErr':>8s} {'MedAzErr':>9s}"
    print(header, flush=True)
    for cls, row in table.items():
        print(
            f"{cls:>14s}  {row['ap']:7.4f} {row['avp']:7.4f} "
            f"{row['arp']:7.4f} {row['med_err_deg']:8.3f} "
            f"{row['med_az_err_deg']:9.3f}",
            flush=True,
        )
    if args.out:
        import json

        Path(args.out).write_text(json.dumps(table, indent=2))
        print(f"wrote {args.out}", flush=True)
    return 0


def cmd_verify_parity(args) -> int:
    """The quality-parity acceptance gate as ONE command: prepare-data ->
    dictionary -> train (--pretrained-backbone) -> snapshot-ensemble
    evaluate -> optional AVP/ARP, printing the MedErr / Acc@pi/6 table
    (tools/parity.py; reference chain setupDataFlipped_pascal3d.m ->
    learnGeodesicBDModel.py -> evaluateGeodesicBDModel.py -> computeAVP.m)."""
    _setup_compile_cache(args)
    from multi_modal_regression_tpu.tools.parity import run_parity_gate

    overrides = _overrides_from_args(args)
    classes = (
        tuple(args.classes.split(",")) if args.classes
        else _classes_from_args(args)
    )
    table = run_parity_gate(
        workdir=args.workdir or "runs/parity",
        data_root=args.data_root,
        db_path=args.db_path,
        voc_dir=args.voc_dir,
        render_root=args.render_root,
        pretrained_backbone=args.pretrained_backbone,
        det_path=args.det_path,
        annotations=args.annotations,
        classes=classes,
        overrides=overrides,
        eval_num_epochs=args.eval_num_epochs,
        workers=args.num_workers,
        packed_cache=not args.no_packed_cache,
    )
    ev = table["stages"]["evaluate"]
    print(f"{'class':>14s}  {'MedErr':>8s}  {'Acc@pi/6':>8s}", flush=True)
    for cls, row in ev["per_class"].items():
        if cls == "mean":  # already reported by the ensembled line below
            continue
        print(
            f"{cls:>14s}  {row['med_err_deg']:8.3f}  "
            f"{row['acc_pi_6_pct']:7.2f}%",
            flush=True,
        )
    print(
        f"ensembled MedErr {ev['ensembled_med_err_deg']:.3f} deg  "
        f"Acc@pi/6 {ev['acc_pi_6_pct']:.2f}%",
        flush=True,
    )
    for d in table["deviations"]:
        print(f"DEVIATION: {d}", flush=True)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="multi_modal_regression_tpu.cli")
    sub = parser.add_subparsers(dest="command", required=True)

    from multi_modal_regression_tpu.train.presets import PRESETS

    p_train = sub.add_parser("train", help="train a preset")
    p_train.add_argument("--preset", choices=sorted(PRESETS), required=True)
    p_train.add_argument("--dictionary", type=str, default=None,
                         help="pose dictionary .npz (kmeans or gmm)")
    p_train.add_argument("--pretrained-backbone", type=str, default=None,
                         help="torchvision state_dict .pth for the backbone")
    p_train.add_argument("--train-data", choices=("both", "real", "render"),
                         default="both",
                         help="training data selection (augmentation ablation)")
    p_train.add_argument("--warm-start-workdir", type=str, default=None,
                         help="source run workdir for two-stage chaining")
    p_train.add_argument("--warm-start-preset", type=str, default=None,
                         help="preset of the source run")
    p_train.add_argument("--warm-start-checkpoint", type=str, default="final")
    p_train.add_argument("--warm-start-kind",
                         choices=("classifier", "oracle"), default="oracle")
    _add_distributed_args(p_train)
    _add_common_data_args(p_train)
    _add_config_overrides(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_pack = sub.add_parser(
        "pack",
        help="prebuild the packed uint8 crop caches a train/evaluate run "
             "with the same flags would use (multi-host: run once before "
             "launching the --distributed processes)",
    )
    p_pack.add_argument("--preset", choices=sorted(PRESETS), required=True)
    p_pack.add_argument("--train-data", choices=("both", "real", "render"),
                        default="both")
    _add_common_data_args(p_pack)
    _add_config_overrides(p_pack)
    p_pack.set_defaults(fn=cmd_pack)

    p_eval = sub.add_parser("evaluate", help="snapshot-ensemble evaluation")
    p_eval.add_argument("--preset", choices=sorted(PRESETS), required=True)
    p_eval.add_argument("--dictionary", type=str, default=None)
    p_eval.add_argument("--checkpoint", type=str, default="last")
    p_eval.add_argument("--eval-num-epochs", type=int, default=None)
    _add_distributed_args(p_eval)
    _add_common_data_args(p_eval)
    _add_config_overrides(p_eval)
    p_eval.set_defaults(fn=cmd_evaluate)

    p_pred = sub.add_parser("predict", help="pure inference from a checkpoint")
    p_pred.add_argument("--preset", choices=sorted(PRESETS), required=True)
    p_pred.add_argument("--dictionary", type=str, default=None)
    p_pred.add_argument("--checkpoint", type=str, default="final")
    p_pred.add_argument("--det-path", type=str, default=None,
                        help="detector crop set (dbinfo.mat + all/*.mat)")
    p_pred.add_argument("--analysis", action="store_true",
                        help="joint-model analysis protocol "
                             "(evaluateJointModel[2].py): per-class pose "
                             "decodes + category argmax per checkpoint; "
                             "--checkpoint takes a comma list (up to four: "
                             "pose,cat,top1,wgt)")
    p_pred.add_argument("--analysis-names", type=str, default=None,
                        help="comma list naming the --checkpoint entries "
                             "(default pose,cat,top1,wgt order)")
    _add_common_data_args(p_pred, required_data_root=False)
    _add_distributed_args(p_pred)
    _add_config_overrides(p_pred)
    p_pred.set_defaults(fn=cmd_predict)

    p_dict = sub.add_parser("dictionary", help="learn a pose dictionary")
    p_dict.add_argument("--type", choices=("kmeans", "gmm"), default="kmeans")
    p_dict.add_argument("--data-root", type=str, required=True,
                        help="render image tree (poses parsed from filenames)")
    p_dict.add_argument("--size", type=int, default=200)
    p_dict.add_argument("--out", type=str, required=True)
    p_dict.add_argument("--seed", type=int, default=0)
    p_dict.add_argument("--dbinfo", type=str, default=None,
                        help="dbinfo.mat naming the classes (default: the "
                             "12 PASCAL3D+ classes)")
    p_dict.add_argument("--num-classes", type=int, default=None,
                        help="without --dbinfo: use the first N PASCAL3D+ "
                             "classes (matches train --num-classes)")
    p_dict.add_argument("--db-type", choices=("render", "real"),
                        default="render",
                        help="tilt-sign convention of the tree "
                             "(dataGenerators.py:57-62; the reference "
                             "learns from RenderForCNN trees)")
    p_dict.add_argument("--compile-cache", type=str, default=None,
                        help="persistent XLA compile-cache dir "
                             "('off' to disable)")
    p_dict.set_defaults(fn=cmd_dictionary)

    p_prep = sub.add_parser(
        "prepare-data",
        help="prepare a dataset: synthetic (default), or walk a real "
             "PASCAL3D+/ObjectNet3D release (setupData*.m)",
    )
    p_prep.add_argument("--dataset",
                        choices=("synthetic", "pascal3d", "objectnet3d"),
                        default="synthetic")
    p_prep.add_argument("--db-path", type=str, default=None,
                        help="release root (PASCAL3D+_release1.1 / "
                             "ObjectNet3D) for non-synthetic datasets")
    p_prep.add_argument("--voc-dir", type=str, default=None,
                        help="VOC2012 devkit dir (default "
                             "<db-path>/PASCAL/VOCdevkit/VOC2012)")
    p_prep.add_argument("--kinds", type=str,
                        default="flipped,original,augmented",
                        help="comma list of pascal3d output trees")
    p_prep.add_argument("--workers", type=int, default=8)
    p_prep.add_argument("--classes", type=str, default=None,
                        help="comma list of classes to ingest (default: "
                             "the 12 PASCAL3D+ classes / --dbinfo)")
    p_prep.add_argument("--dbinfo", type=str, default=None)
    p_prep.add_argument("--out", type=str, required=True)
    p_prep.add_argument("--real-subdir", type=str, default="augmented2")
    p_prep.add_argument("--render-subdir", type=str, default="renderforcnn")
    p_prep.add_argument("--test-subdir", type=str, default="test")
    p_prep.add_argument("--images-per-class", type=int, default=8)
    p_prep.add_argument("--image-size", type=int, default=64)
    p_prep.add_argument("--seed", type=int, default=0)
    p_prep.add_argument("--pattern", choices=("noise", "pose"), default="noise",
                        help="'pose' renders learnable viewpoint-dependent content")
    p_prep.set_defaults(fn=cmd_prepare_data)

    p_pdet = sub.add_parser(
        "prepare-detections",
        help="crop third-party detector outputs into a detection set "
             "(setupDataDetection_{vk,r4cnn,maskrcnn}.m)",
    )
    p_pdet.add_argument("--detector",
                        choices=("vk", "r4cnn", "maskrcnn", "objectnet"),
                        required=True)
    p_pdet.add_argument("--det-source", type=str, required=True,
                        help="vk: VOC2012_val_det.mat; r4cnn: dir of "
                             "per-class .mat files; maskrcnn: dir of "
                             "results_<cls>.txt files; objectnet: dir of "
                             "detections_<cls>.txt files (Fast-RCNN)")
    p_pdet.add_argument("--images-dir", type=str, required=True,
                        help="VOC JPEGImages / ObjectNet3D Images dir")
    p_pdet.add_argument("--image-set", type=str, default=None,
                        help="val.txt listing the test images (not used "
                             "for --detector objectnet)")
    p_pdet.add_argument("--out", type=str, required=True)
    p_pdet.add_argument("--image-size", type=int, default=224)
    p_pdet.add_argument("--workers", type=int, default=8)
    p_pdet.add_argument("--dbinfo", type=str, default=None)
    p_pdet.add_argument("--detector-classes", type=str, default=None,
                        help="comma list of the detector's own class "
                             "spellings (maskrcnn uses 'motorcycle')")
    p_pdet.set_defaults(fn=cmd_prepare_detections)

    p_edet = sub.add_parser(
        "evaluate-detections",
        help="AP/AVP/ARP table from a results .mat + annotations "
             "(computeAVP.m / computeARP.m)",
    )
    p_edet.add_argument("--results", type=str, required=True,
                        help="results .mat from `predict --det-path`")
    p_edet.add_argument("--det-path", type=str, required=True,
                        help="detection set dir (its dbinfo.mat lists the "
                             "image order of the results file)")
    p_edet.add_argument("--annotations", type=str, required=True,
                        help="PASCAL3D+ Annotations root "
                             "(<cls>_pascal/<image>.mat trees)")
    p_edet.add_argument("--nbins", type=int, default=4,
                        help="azimuth bins for AVP")
    p_edet.add_argument("--out", type=str, default=None,
                        help="optional JSON output path")
    p_edet.add_argument("--dbinfo", type=str, default=None)
    p_edet.set_defaults(fn=cmd_evaluate_detections)

    p_par = sub.add_parser(
        "verify-parity",
        help="the quality-parity gate as one command: prepare-data -> "
             "dictionary -> train -> snapshot-ensemble evaluate "
             "[-> AVP/ARP] (tools/parity.py)",
    )
    p_par.add_argument("--data-root", type=str, required=True,
                       help="prepared tree (train/test/augmented2/original);"
                            " ingested from --db-path if missing")
    p_par.add_argument("--db-path", type=str, default=None,
                       help="PASCAL3D+ release root (for ingestion)")
    p_par.add_argument("--voc-dir", type=str, default=None)
    p_par.add_argument("--render-root", type=str, default=None,
                       help="RenderForCNN-style render tree (dictionary "
                            "poses + render training data)")
    p_par.add_argument("--pretrained-backbone", type=str, default=None,
                       help="torchvision resnet50 .pth (quality parity "
                            "requires it)")
    p_par.add_argument("--det-path", type=str, default=None,
                       help="prepared detection set for the AVP/ARP stage")
    p_par.add_argument("--annotations", type=str, default=None,
                       help="PASCAL3D+ Annotations root (AVP/ARP stage)")
    p_par.add_argument("--eval-num-epochs", type=int, default=None)
    p_par.add_argument("--classes", type=str, default=None,
                       help="comma list (default: the 12 PASCAL3D+ classes)")
    p_par.add_argument("--dbinfo", type=str, default=None)
    p_par.add_argument("--num-workers", type=int, default=8)
    p_par.add_argument("--no-packed-cache", action="store_true",
                       help="disable the default packed uint8 crop cache "
                            "(.packed/ next to each tree, shared with "
                            "--packed-cache auto) and decode PNGs per epoch")
    _add_config_overrides(p_par)
    p_par.set_defaults(fn=cmd_verify_parity)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
