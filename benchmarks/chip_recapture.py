"""One-command chip recapture of every round-4/5 performance claim.

Round-4's numbers are builder-attested only: the driver's BENCH_r04 ran
into a tunnel outage, so no round-4 row is driver-era verified (VERDICT
round 4, Missing #2). When the tunnel is back, this script re-captures, in
one run, everything the verdict asked to see driver-era:

  1. headline   — bench.py (geodesic_bd, ResNet50, batch 96, 224px, bf16)
  2. frozen_bn  — benchmarks/bench_frozen_bn.py (the flagged fast mode)
  3. infer      — benchmarks/infer_floor.py (serving floor fraction)
  4. packed e2e — `cli train` on the chip with the HOST feeding batches
     through the packed uint8 memmap cache vs the PNG loaders
     (setupDataOriginal_pascal3d.m:73-124 is the reference's own
     pre-decoded protocol): asserts the loss trajectories agree and
     records end-to-end img/s for both host paths. All previous chip
     numbers used device-resident synthetic batches; this is the first
     chip-fed-by-host measurement (VERDICT round 4, ask #5). NOTE the
     tunnel makes H2D a network hop, so end-to-end img/s here bounds the
     TUNNEL deployment, not a real TPU-VM host; the record says so.

Each stage is probe-gated and timeout-bounded like bench.py; a stage
failure records {"error": ...} for that stage and moves on. Prints one
JSON object per stage and writes benchmarks/chip_recapture_out.json.

Usage: python benchmarks/chip_recapture.py [--skip packed] [--out PATH]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _bench_mod():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _json_lines(text: str) -> list[dict]:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except ValueError:
                pass
    return out


def _run_stage(bench, name: str, cmd: list, timeout_s: float) -> dict:
    rc, out, err = bench._run_group(cmd, timeout_s)
    recs = _json_lines(out or "")
    if rc == 0 and recs:
        return {"stage": name, "records": recs}
    return {
        "stage": name,
        "error": "timeout" if rc is None else f"rc={rc}",
        "stderr_tail": (err or "")[-1500:],
    }


def _packed_e2e(bench, timeout_s: float) -> dict:
    """Chip train fed by the host: packed cache vs PNG loaders.

    Small end-to-end config (resnet18, 64px — big enough to exercise the
    whole host path, small enough to finish behind the tunnel)."""
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="chip_packed_"))
    gen = (
        "import numpy as np, scipy.io as spio\n"
        "from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset\n"
        "from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary\n"
        f"root = {str(tmp)!r}\n"
        "classes = ('aeroplane', 'bicycle', 'boat')\n"
        "for sub, seed in (('real', 1), ('render', 2), ('test', 3)):\n"
        "    generate_pose_dataset(f'{root}/{sub}', classes=classes,\n"
        "        images_per_class=48, image_size=64, seed=seed)\n"
        "rng = np.random.default_rng(5)\n"
        "KMeansDictionary(cluster_centers=(0.7 * rng.standard_normal((8, 3))\n"
        "    ).astype(np.float32)).save(f'{root}/km.npz')\n"
        "spio.savemat(f'{root}/dbinfo.mat', {'classes': np.array(classes)})\n"
    )
    rc, _, err = bench._run_group([sys.executable, "-c", gen], 600)
    if rc != 0:
        return {
            "stage": "packed_e2e",
            "error": f"datagen rc={rc}",
            "stderr_tail": (err or "")[-1000:],
        }

    def train(tag: str, extra: list) -> dict:
        workdir = tmp / f"run_{tag}"
        cmd = [
            sys.executable, "-m", "multi_modal_regression_tpu.cli", "train",
            "--preset", "geodesic_bd",
            "--dictionary", str(tmp / "km.npz"),
            "--dbinfo", str(tmp / "dbinfo.mat"),
            "--data-root", str(tmp),
            "--real-subdir", "real", "--render-subdir", "render",
            "--test-subdir", "test",
            "--save-str", tag, "--workdir", str(workdir),
            "--num-classes", "3",
            "--feature-network", "resnet18", "--N0", "512",
            "--N1", "16", "--N2", "8", "--dict-size", "8",
            "--image-size", "64", "--items-per-batch", "8",
            "--max-iterations", "30", "--num-epochs", "1",
            "--num-warmup-epochs", "0", "--num-workers", "4",
            *extra,
        ]
        rc, out, err = bench._run_group(cmd, timeout_s)
        if rc != 0:
            return {
                "error": "timeout" if rc is None else f"rc={rc}",
                "stderr_tail": (err or "")[-1500:],
            }
        losses, ips = [], []
        metrics = workdir / "metrics.jsonl"
        if metrics.exists():
            for line in metrics.read_text().splitlines():
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "loss" in rec:
                    losses.append(rec["loss"])
                if "images_per_sec" in rec:
                    ips.append(rec["images_per_sec"])
        if not ips:  # fall back to the progress line
            ips = [float(v) for v in re.findall(r"\(([\d.]+) img/s\)", out or "")]
        # cli.py:481 prints `final {metric_label(med)}` = "final MedErr
        # 117.582 deg" (no colon since the metric_label refactor); accept
        # the legacy colon form too so old logs still parse.
        med = re.findall(r"final MedErr:? ([\d.]+)", out or "")
        return {
            "losses": losses,
            # the final MedErr depends on every training step, so its
            # equality is whole-trajectory evidence even where log_every
            # thins the per-step loss record
            "final_med_err": float(med[-1]) if med else None,
            "img_per_sec_last": ips[-1] if ips else None,
        }

    png = train("png", [])
    packed = train("packed", ["--packed-cache", str(tmp / "pack")])
    result = {
        "stage": "packed_e2e",
        "note": (
            "end-to-end img/s with the HOST feeding through the axon "
            "tunnel — bounds the tunnel deployment, not a TPU-VM host"
        ),
        "png": png,
        "packed": packed,
    }
    if "losses" in png and "losses" in packed and png["losses"]:
        import math

        n = min(len(png["losses"]), len(packed["losses"]))
        agree = all(
            math.isclose(a, b, rel_tol=5e-3, abs_tol=1e-3)
            for a, b in zip(png["losses"][:n], packed["losses"][:n])
        )
        if png.get("final_med_err") is not None:
            agree = agree and math.isclose(
                png["final_med_err"],
                packed.get("final_med_err", float("nan")),
                rel_tol=1e-3, abs_tol=0.05,
            )
        result["trajectory_match"] = bool(agree and n > 0)
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["headline", "frozen_bn", "infer", "packed"])
    ap.add_argument("--out", default=str(REPO / "benchmarks" / "chip_recapture_out.json"))
    ap.add_argument("--stage-timeout", type=float, default=1800.0)
    args = ap.parse_args()

    bench = _bench_mod()
    probe = bench._probe_backend(120.0)
    if probe != "ok":
        print(json.dumps({"error": f"backend probe {probe}", "stages": []}))
        sys.exit(1)

    results = []
    if "headline" not in args.skip:
        results.append(_run_stage(
            bench, "headline",
            [sys.executable, str(REPO / "bench.py"), "--child"],
            args.stage_timeout,
        ))
        print(json.dumps(results[-1]), flush=True)
    if "frozen_bn" not in args.skip:
        results.append(_run_stage(
            bench, "frozen_bn",
            [sys.executable, str(REPO / "benchmarks" / "bench_frozen_bn.py")],
            args.stage_timeout,
        ))
        print(json.dumps(results[-1]), flush=True)
    if "infer" not in args.skip:
        results.append(_run_stage(
            bench, "infer",
            [sys.executable, str(REPO / "benchmarks" / "infer_floor.py")],
            args.stage_timeout,
        ))
        print(json.dumps(results[-1]), flush=True)
    if "packed" not in args.skip:
        results.append(_packed_e2e(bench, args.stage_timeout))
        print(json.dumps(results[-1]), flush=True)

    pathlib.Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
