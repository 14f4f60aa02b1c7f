"""Host input-pipeline throughput: can the loader out-run the chip?

The device consumes ~2400 img/s at 224 px (BENCH_r03); the reference feeds
its GPU from DataLoader worker processes (learnGeodesicBDModel.py:78-79),
this framework from PIL decode threads (data/loader.py). Every throughput
number recorded before round 4 used device-resident batches — this bench
measures the PURE HOST side: decode+resize+collate img/s of
BalancedLoader / TestLoader over a generated 224-px PNG tree, swept over
worker counts, with no device in the loop. It also measures the packed
uint8 shard cache (data/packed.py) — the TPU-native analog of the
reference's pre-decoded .mat crop protocol (setupDataOriginal_pascal3d.m:
73-124) — which replaces per-image PNG decode with memmap slice reads.

Round-4.5 addition: the PNG loaders decode through the native C++
library when available (native/decode.cc — byte-identical pixels, GIL
released, so decode threads finally scale); `--no-native` forces the
pure-PIL path (MMR_NATIVE=0) for an apples-to-apples comparison, and a
`pack_build` row records the one-time packed-cache build rate (native
batch decode).

Usage: python benchmarks/bench_loader.py [--image-size 224]
           [--images-per-class 48] [--items-per-batch 8]
           [--workers 1 2 4 8 16] [--batches 24] [--no-packed]
           [--no-native]

Prints one JSON line per measurement row.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # host-only bench: never touch TPU

import numpy as np  # noqa: E402


def build_tree(root: Path, image_size: int, images_per_class: int) -> Path:
    """Synthetic 12-class PNG tree at the experiment resolution (reused
    across runs; keyed by size/count so changing flags regenerates)."""
    from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

    tree = root / f"tree_{image_size}px_{images_per_class}pc"
    marker = tree / ".complete"
    if not marker.exists():
        t0 = time.perf_counter()
        generate_pose_dataset(
            tree,
            images_per_class=images_per_class,
            image_size=image_size,
            pattern="noise",
            seed=0,
        )
        marker.touch()
        print(
            f"# generated {tree} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    return tree


def cycle(loader):
    """Chain epochs like a training loop does (each epoch restart pays the
    loader's real thread-pool spin-up, so multi-epoch rates are honest)."""
    while True:
        yield from loader


def drain(loader, batches: int, warmup: int = 2) -> tuple[float, int]:
    """(seconds, images) over `batches` steady-state batches (first
    `warmup` batches excluded — thread-pool spin-up and queue fill)."""
    n_img = 0
    t0 = None
    done = 0
    it = cycle(loader)
    for batch in it:
        done += 1
        if done == warmup:
            t0 = time.perf_counter()
            continue
        if t0 is not None:
            n_img += len(batch["xdata"])
            if done >= warmup + batches:
                break
    dt = time.perf_counter() - t0
    it.close()
    return dt, n_img


def row(kind: str, workers: int, img_s: float, batch_images: int, note: str = ""):
    print(
        json.dumps(
            {
                "loader": kind,
                "workers": workers,
                "img_per_s": round(img_s, 1),
                "batch_images": batch_images,
                "vs_chip_2400": round(img_s / 2400.0, 2),
                **({"note": note} if note else {}),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--images-per-class", type=int, default=48)
    ap.add_argument("--items-per-batch", type=int, default=8)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--root", default="/tmp/bench_loader")
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--no-native", action="store_true",
                    help="force the pure-PIL decode path (MMR_NATIVE=0)")
    args = ap.parse_args()

    if args.no_native:
        import os

        os.environ["MMR_NATIVE"] = "0"  # read at first decode (data/native)

    from multi_modal_regression_tpu.data.index import (
        ClassBalancedIndex,
        FlatTestIndex,
    )
    from multi_modal_regression_tpu.data.loader import BalancedLoader, TestLoader

    tree = build_tree(
        Path(args.root), args.image_size, args.images_per_class
    )
    index = ClassBalancedIndex(db_path=str(tree), db_type="real")

    for w in args.workers:
        loader = BalancedLoader(
            index,
            items_per_batch=args.items_per_batch,
            image_size=args.image_size,
            num_workers=w,
            seed=0,
        )
        dt, n = drain(loader, args.batches)
        row("balanced_png", w, n / dt, loader.batch_images)

    flat = FlatTestIndex(db_path=str(tree))
    for w in args.workers:
        tl = TestLoader(
            flat, batch_size=96, image_size=args.image_size, num_workers=w
        )
        dt, n = drain(tl, args.batches)
        row("test_png", w, n / dt, 96)

    if args.no_packed:
        return

    from multi_modal_regression_tpu.data.packed import (
        PackedBalancedLoader,
        pack_index,
    )

    pack_dir = tree.parent / (tree.name + "_packed")
    t0 = time.perf_counter()
    pack = pack_index(index, pack_dir, image_size=args.image_size, num_workers=8)
    dt = time.perf_counter() - t0
    n_src = int(sum(index.num_images))
    if dt > 1.0:  # a fresh build; cached reloads aren't a decode rate
        row("pack_build", 8, n_src / dt, n_src,
            note="one-time packed-cache build (whole tree)")
    print(
        f"# pack_index: {dt:.1f}s (cached after first run)",
        file=sys.stderr,
    )
    for w in args.workers:
        pl = PackedBalancedLoader(
            index,
            pack,
            items_per_batch=args.items_per_batch,
            num_workers=w,
            seed=0,
        )
        dt, n = drain(pl, args.batches)
        row("balanced_packed", w, n / dt, pl.batch_images)

    # -- the Pascal3dAll .mat crop protocol: plain vs packed ----------------
    mat_root = build_mat_tree(
        Path(args.root), args.image_size, args.images_per_class
    )
    from multi_modal_regression_tpu.data import MatCropIndex, pack_mat_index
    from multi_modal_regression_tpu.data.loader import MatCropLoader
    from multi_modal_regression_tpu.data.packed import PackedMatCropLoader

    midx = MatCropIndex(str(mat_root), "test")
    for w in args.workers:
        ml = MatCropLoader(
            midx, batch_size=96, image_size=args.image_size, num_workers=w
        )
        dt, n = drain(ml, args.batches)
        row("mat_loadmat", w, n / dt, 96)
    t0 = time.perf_counter()
    mpack = pack_mat_index(
        midx, mat_root.parent / (mat_root.name + "_packed"),
        image_size=args.image_size, num_workers=8,
    )
    print(f"# pack_mat_index: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    for w in args.workers:
        pml = PackedMatCropLoader(midx, mpack, batch_size=96, num_workers=w)
        dt, n = drain(pml, args.batches)
        row("mat_packed", w, n / dt, 96)


def build_mat_tree(root: Path, image_size: int, images_per_class: int) -> Path:
    """Synthetic Pascal3dAll layout: per-image .mat crop sets (3 crops
    each) + <cls>_info.mat name lists, at the experiment resolution."""
    import scipy.io as spio

    tree = root / f"mat_{image_size}px_{images_per_class}pc"
    marker = tree / ".complete"
    if marker.exists():
        return tree
    rng = np.random.default_rng(0)
    from multi_modal_regression_tpu.data.naming import PASCAL3D_CLASSES

    for cls in PASCAL3D_CLASSES:
        d = tree / cls
        d.mkdir(parents=True, exist_ok=True)
        names = [f"{cls}_{i:06d}" for i in range(images_per_class)]
        for n in names:
            spio.savemat(
                d / f"{n}.mat",
                {
                    "xdata": rng.integers(
                        0, 256, (3, image_size, image_size, 3), np.uint8
                    ),
                    "ydata": rng.standard_normal((3, 3)).astype(np.float32),
                },
                do_compression=True,
            )
        spio.savemat(
            tree / f"{cls}_info.mat",
            {"pascal_train": np.array(names[:1]), "pascal_val": np.array(names)},
        )
    marker.touch()
    return tree


if __name__ == "__main__":
    main()
