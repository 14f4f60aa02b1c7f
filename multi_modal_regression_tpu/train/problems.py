"""The problem zoo: per-preset target transforms, losses, and decoders.

Each reference training script is a (model, targets, warmup loss, main loss,
decoder) combination. Here each becomes a `Problem` object of pure functions
that the compiled train/eval steps call — the full zoo:

  simple          CE + MSE(residual), self-balanced warmup form for the whole
                  run (learnSimpleBDModel.py:124-131)
  geodesic        warmup CE+MSE(residual) then CE + geodesic on the decoded
                  pose (learnGeodesicBDModel.py:106-205) — the north star
  euclidean       main Lr = MSE on decoded pose (learnEuclideanBDModel.py:176-178)
  laplacian       main Lr = L1 on decoded pose (learnLaplacianBDModel.py:178)
  geodesic_quat   quaternion dictionary + quaternion geodesic; test-time
                  renormalized prediction (learnGeodesicBDModel_quaternion.py)
  relaxed_kmeans  RBF soft bins, KL + MSE(residual) / decoded-pose loss
                  (SimpleRelaXedLoss / RelaXedLoss, ablationXBDModel.py)
  probabilistic   GMM posterior bins, KL + expected geodesic under the
                  softmax posterior (learnProbabilisticBDModel.py:124-129);
                  multires variant uses per-cluster deltas
  riemannian      tangent residual targets; main loss composes
                  R_bin @ exp(delta) with a trace-angle geodesic
                  (learnRiemannianBDModel.py:186-233)
  log_euclidean   MSE vs the tangent residual at the PREDICTED bin ('m2',
                  learnLogEuclideanModel.py:103-134) — per-bin residual
                  targets computed on device, not in the host hot loop
  classification  CE only; prediction = dictionary atom at argmax
                  (learnClassificationModel.py)
  regression      no bins: warmup MSE then geodesic on the raw pose output
                  (learnGeodesicRegressionModel.py:122-199); quaternion
                  variant via ydata_type
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.data.targets import (
    gmm_log_responsibilities,
    hard_bin_targets,
    per_bin_tangent_residuals,
    rbf_soft_targets,
    tangent_residual_targets,
)
from multi_modal_regression_tpu.geometry.quaternion import convert_dictionary
from multi_modal_regression_tpu.geometry.so3 import exp_so3, log_so3
from multi_modal_regression_tpu.losses import (
    cross_entropy,
    decode_bin_delta,
    geodesic_aa,
    geodesic_quat,
    geodesic_rotmat,
    kl_div_mean,
    l1,
    mse,
)
from multi_modal_regression_tpu.losses.bin_delta import expected_regression


@dataclasses.dataclass(frozen=True)
class Problem:
    """A training problem: target transform + (Lc, Lr) losses + decoder.

    All members are pure jit-safe functions:
      targets(y)                 pose batch -> dict of target arrays
      warmup_losses(out, tg)     -> (lc, lr) for the warm-up phase
      main_losses(out, tg)       -> (lc, lr) for the main phase
      decode(out)                -> predicted pose batch (test protocol)
    `out` is the model output tuple (scores, residual) — or a single array
    for pure classification/regression models.
    """

    name: str
    ydata_type: str
    targets: Callable
    warmup_losses: Callable
    main_losses: Callable
    decode: Callable
    # self-balance modes for the two phases ('warmup' | 'main' | None=fixed)
    warmup_balance: str | None = "warmup"
    main_balance: str | None = "main"
    # headline eval metric: 'pose' (MedErr) or 'category_accuracy'
    metric: str = "pose"


# decode = dictionary atom at the argmax bin + residual (shared with the
# tested loss zoo, losses.bin_delta.decode_bin_delta)
_decode_hard = decode_bin_delta


def objectnet_quaternion_dictionary() -> jax.Array:
    """The fixed 16-atom quaternion dictionary of learnObjectnetModel.py:60-66:
    the 4 unit quaternions e_i, then (e_i + e_j)/sqrt(2) for i<j, then
    (e_i - e_j)/sqrt(2) for i<j (same row order as the reference listing)."""
    atoms = list(np.eye(4))
    s = 1.0 / np.sqrt(2.0)
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    for i, j in pairs:
        v = np.zeros(4)
        v[i], v[j] = s, s
        atoms.append(v)
    for i, j in pairs:
        v = np.zeros(4)
        v[i], v[j] = s, -s
        atoms.append(v)
    return jnp.asarray(np.stack(atoms), jnp.float32)


def _key_rotations_f64(centers) -> jax.Array:
    """Key rotations exp_so3(centers) precomputed on host at build time,
    mirroring the reference's startup `rotations_dict` (numpy doubles —
    learnRiemannianBDModel.py:61, learnLogEuclideanModel.py:58). Computed
    through f64 so the x64 parity harness gets full-precision keys; a no-op
    for normal f32 runs, where jnp folds the result back to f32."""
    return jnp.asarray(np.asarray(exp_so3(np.asarray(centers, np.float64))))


def make_problem(
    name: str,
    centers: np.ndarray | None = None,
    *,
    gmm_means: np.ndarray | None = None,
    gmm_covariances: np.ndarray | None = None,
    gmm_weights: np.ndarray | None = None,
    gamma: float = 10.0,
    multires: bool = False,
) -> Problem:
    """Build a Problem by preset name. `centers` is the axis-angle pose
    dictionary (K, 3) for bin-delta problems (converted internally for the
    quaternion variants, quaternion.py:79-92)."""

    if name == "simple":
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            bins, res = hard_bin_targets(y, C)
            return {"y": y, "bins": bins, "res": res}

        def losses(out, tg):
            scores, residual = out
            return cross_entropy(scores, tg["bins"]), mse(residual, tg["res"])

        return Problem(
            name, "axis_angle", targets, losses, losses,
            lambda out: _decode_hard(out[0], out[1], C),
            warmup_balance="warmup", main_balance="warmup",
        )

    if name in ("simple_rene", "euclidean_rene"):
        # the _rene fine-tune loops: bin heads come from a trained
        # classifier and stay FROZEN (train_only=('res_models',) on the
        # preset); the loss is the residual term alone under the
        # homoscedastic sigma balance — no CE term at all
        # (learnSimpleBDModel_rene.py:160-170 regresses raw residuals,
        # learnEuclideanBDModel_rene.py:159-170 the decoded pose)
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            bins, res = hard_bin_targets(y, C)
            return {"y": y, "bins": bins, "res": res}

        if name == "simple_rene":

            def losses(out, tg):
                scores, residual = out
                return jnp.zeros(()), mse(residual, tg["res"])

        else:

            def losses(out, tg):
                scores, residual = out
                return jnp.zeros(()), mse(_decode_hard(scores, residual, C), tg["y"])

        return Problem(
            name, "axis_angle", targets, losses, losses,
            lambda out: _decode_hard(out[0], out[1], C),
            warmup_balance="sigma", main_balance="sigma",
        )

    if name in ("geodesic", "euclidean", "laplacian"):
        C = jnp.asarray(centers, jnp.float32)
        reg = {"geodesic": geodesic_aa, "euclidean": mse, "laplacian": l1}[name]

        def targets(y):
            bins, res = hard_bin_targets(y, C)
            return {"y": y, "bins": bins, "res": res}

        def warmup(out, tg):
            scores, residual = out
            return cross_entropy(scores, tg["bins"]), mse(residual, tg["res"])

        def main(out, tg):
            scores, residual = out
            ypred = _decode_hard(scores, residual, C)
            return cross_entropy(scores, tg["bins"]), reg(ypred, tg["y"])

        return Problem(
            name, "axis_angle", targets, warmup, main,
            lambda out: _decode_hard(out[0], out[1], C),
            # learnEuclideanBDModel.py keeps the WARM-UP balance form in its
            # main phase (loss = Lc + 0.5*exp(-2s)*Lr + s with
            # s' = 0.5*log(Lr) at :178,183 — same lines in both its loops);
            # geodesic (:189) and laplacian (:179) switch to the main form
            main_balance="warmup" if name == "euclidean" else "main",
        )

    if name == "geodesic_quat":
        Cq = convert_dictionary(jnp.asarray(centers, jnp.float32))

        def targets(y):
            bins, res = hard_bin_targets(y, Cq)
            return {"y": y, "bins": bins, "res": res}

        def warmup(out, tg):
            scores, residual = out
            return cross_entropy(scores, tg["bins"]), mse(residual, tg["res"])

        def main(out, tg):
            scores, residual = out
            ypred = _decode_hard(scores, residual, Cq)
            return cross_entropy(scores, tg["bins"]), geodesic_quat(ypred, tg["y"])

        def decode(out):
            # test predictions renormalized to unit quaternions, norm
            # floored at the reference's 1e-10
            # (learnGeodesicBDModel_quaternion.py:217-218)
            q = _decode_hard(out[0], out[1], Cq)
            return q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-10
            )

        return Problem(name, "quaternion", targets, warmup, main, decode)

    if name == "relaxed_kmeans":
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            soft, res = rbf_soft_targets(y, C, gamma=gamma)
            return {"y": y, "soft": soft, "res": res}

        def warmup(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            return lc, mse(residual, tg["res"])

        def main(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            ypred = _decode_hard(scores, residual, C)
            return lc, geodesic_aa(ypred, tg["y"])

        # the relaxed ablation trains with FIXED weights (alpha), no
        # self-balance scalar anywhere (ablationXBDModel.py:63-170)
        return Problem(
            name, "axis_angle", targets, warmup, main,
            lambda out: _decode_hard(out[0], out[1], C),
            warmup_balance=None, main_balance=None,
        )

    if name in ("probabilistic", "probabilistic_multires"):
        mu = jnp.asarray(gmm_means, jnp.float32)
        cov = jnp.asarray(gmm_covariances, jnp.float32)
        w = jnp.asarray(gmm_weights, jnp.float32)
        is_multires = multires or name.endswith("multires")

        def targets(y):
            resp = jnp.exp(gmm_log_responsibilities(y, mu, cov, w))
            return {"y": y, "soft": resp, "res": y - resp @ mu}

        def warmup(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            if is_multires:
                # every per-cluster delta regresses the shared soft residual
                lr = mse(residual, tg["res"][:, None, :])
            else:
                lr = mse(residual, tg["res"])
            return lc, lr

        def main(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            if is_multires:
                cand = mu[None, :, :] + residual  # (B, K, D)
            else:
                cand = mu[None, :, :] + residual[:, None, :]
            lr = expected_regression(
                scores, cand, tg["y"],
                lambda p, t: geodesic_aa(p, t, reduce=False),
            )
            return lc, lr

        def decode(out):
            # argmax decode: dict[argmax] + delta (the per-argmax-bin delta
            # if multires) — the reference's LIVE test path; its
            # softmax-expectation decode is commented out
            # (learnProbabilisticBDModel.py:168-181)
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            if is_multires:
                residual = jnp.take_along_axis(
                    residual, ind[:, None, None], axis=1
                )[:, 0]
            return mu[ind] + residual

        return Problem(name, "axis_angle", targets, warmup, main, decode)

    if name in ("probabilistic_quat", "probabilistic_quat_multires"):
        # the reference-dormant quaternion probabilistic variants
        # (RelaXedProbabilisticLossQ / RelaXedProbabilisticMultiresLossQ,
        # binDeltaLosses.py:149-166,197-208 — no learn* script invokes
        # them): quaternion dictionary via convert_dictionary, RBF soft
        # bins over quaternion sqeuclidean distances with the soft-mean
        # residual (XPBDGeneratorQ, binDeltaGenerators.py:86-110), KL bin
        # term + expected quaternion geodesic under the softmax posterior.
        Cq = convert_dictionary(jnp.asarray(centers, jnp.float32))
        is_multires = multires or name.endswith("multires")

        def targets(y):
            soft, res = rbf_soft_targets(y, Cq, gamma=gamma)
            return {"y": y, "soft": soft, "res": res}

        def warmup(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            if is_multires:
                lr = mse(residual, tg["res"][:, None, :])
            else:
                lr = mse(residual, tg["res"])
            return lc, lr

        def main(out, tg):
            scores, residual = out
            lc = kl_div_mean(jax.nn.log_softmax(scores, -1), tg["soft"])
            if is_multires:
                cand = Cq[None, :, :] + residual  # (B, K, 4)
            else:
                cand = Cq[None, :, :] + residual[:, None, :]
            # reference arg order my_loss(ytrue, candidate)
            # (binDeltaLosses.py:163-164): quaternion.geodesic_loss
            # normalizes its FIRST argument — the (already unit) ground
            # truth — so candidates enter UN-normalized, |<cand,y>| clamped
            lr = expected_regression(
                scores, cand, tg["y"],
                lambda p, t: geodesic_quat(t, p, reduce=False),
            )
            return lc, lr

        def decode(out):
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            if is_multires:
                residual = jnp.take_along_axis(
                    residual, ind[:, None, None], axis=1
                )[:, 0]
            q = Cq[ind] + residual
            # quaternion test predictions renormalized (the quaternion
            # evaluate convention, learnGeodesicBDModel_quaternion.py:
            # 217-218, norm floor 1e-10)
            return q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-10
            )

        return Problem(name, "quaternion", targets, warmup, main, decode)

    if name == "riemannian":
        C = jnp.asarray(centers, jnp.float32)
        key_R = _key_rotations_f64(centers)

        def targets(y):
            bins, res, R = tangent_residual_targets(y, C, key_R)
            return {"y": y, "bins": bins, "res": res, "R": R}

        def warmup(out, tg):
            scores, residual = out
            return cross_entropy(scores, tg["bins"]), mse(residual, tg["res"])

        def main(out, tg):
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            R_pred = key_R[ind] @ exp_so3(residual)
            return cross_entropy(scores, tg["bins"]), geodesic_rotmat(R_pred, tg["R"])

        def decode(out):
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            return log_so3(key_R[ind] @ exp_so3(residual))

        return Problem(name, "axis_angle", targets, warmup, main, decode)

    if name == "log_euclidean":
        C = jnp.asarray(centers, jnp.float32)
        key_R = _key_rotations_f64(centers)

        def targets(y):
            bins, _ = hard_bin_targets(y, C)
            res_per_bin = per_bin_tangent_residuals(y, key_R)  # (B, K, 3)
            return {"y": y, "bins": bins, "res_per_bin": res_per_bin}

        def losses(out, tg):
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            res_true = jnp.take_along_axis(
                tg["res_per_bin"], ind[:, None, None], axis=1
            )[:, 0]
            return cross_entropy(scores, tg["bins"]), mse(residual, res_true)

        def decode(out):
            scores, residual = out
            ind = jnp.argmax(scores, axis=-1)
            return log_so3(key_R[ind] @ exp_so3(residual))

        # single-phase script using the warm-up balance form for its whole
        # run: Lc + 0.5*exp(-2s)*Lr + s, s = 0.5*log(Lr)
        # (learnLogEuclideanModel.py:135,140)
        return Problem(
            name, "axis_angle", targets, losses, losses, decode,
            warmup_balance="warmup", main_balance="warmup",
        )

    if name == "classification":
        C = jnp.asarray(centers, jnp.float32)

        def targets(y):
            bins, _ = hard_bin_targets(y, C)
            return {"y": y, "bins": bins}

        def losses(out, tg):
            scores = out if not isinstance(out, tuple) else out[0]
            return cross_entropy(scores, tg["bins"]), jnp.zeros(())

        def decode(out):
            scores = out if not isinstance(out, tuple) else out[0]
            return C[jnp.argmax(scores, axis=-1)]

        return Problem(
            name, "axis_angle", targets, losses, losses, decode,
            warmup_balance=None, main_balance=None,
        )

    if name == "objectnet_quat":
        # fixed analytic 16-atom quaternion dictionary; bins by largest
        # |<atom, q>| (double-cover aware), residual in R^4
        # (learnObjectnetModel.py:60-66,108-112)
        Cq = objectnet_quaternion_dictionary()

        def targets(y):
            dots = jnp.abs(y @ Cq.T)  # (B, 16)
            bins = jnp.argmax(dots, axis=-1).astype(jnp.int32)
            return {"y": y, "bins": bins, "res": y - Cq[bins]}

        def warmup(out, tg):
            scores, residual = out
            return cross_entropy(scores, tg["bins"]), mse(residual, tg["res"])

        def main(out, tg):
            scores, residual = out
            ypred = _decode_hard(scores, residual, Cq)
            return cross_entropy(scores, tg["bins"]), geodesic_quat(ypred, tg["y"])

        def decode(out):
            q = _decode_hard(out[0], out[1], Cq)
            # test predictions renormalized (learnObjectnetModel.py:213)
            return q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-10
            )

        return Problem(
            name, "quaternion", targets, warmup, main, decode,
            warmup_balance=None, main_balance=None,
        )

    if name in ("regression", "regression_quat"):
        quat = name.endswith("quat")
        reg = geodesic_quat if quat else geodesic_aa

        def targets(y):
            return {"y": y}

        def warmup(out, tg):
            y = out if not isinstance(out, tuple) else out[0]
            return jnp.zeros(()), mse(y, tg["y"])

        def main(out, tg):
            y = out if not isinstance(out, tuple) else out[0]
            return jnp.zeros(()), reg(y, tg["y"])

        return Problem(
            name,
            "quaternion" if quat else "axis_angle",
            targets, warmup, main,
            lambda out: out if not isinstance(out, tuple) else out[0],
            warmup_balance=None, main_balance=None,
        )

    raise ValueError(f"unknown problem {name!r}")
