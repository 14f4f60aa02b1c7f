"""Loss zoo tests: torch-convention reduction parity, reference geodesic-loss
parity, analytic sanity, gradient health, and the self-balancing scheme."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_regression_tpu.losses import (
    cross_entropy,
    kl_div_mean,
    mse,
    l1,
    geodesic_aa,
    geodesic_quat,
    geodesic_rotmat,
    simple_loss,
    bd_loss,
    relaxed_bd_loss,
    probabilistic_loss,
    probabilistic_multires_loss,
    riemannian_loss,
    per_bin_residual_loss,
    decode_bin_delta,
    self_balanced,
    init_log_balance,
)
from multi_modal_regression_tpu.geometry import exp_so3

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)

B, K, D = 16, 8, 3


@pytest.fixture
def batch(rng):
    return dict(
        scores=jnp.asarray(rng.standard_normal((B, K)), jnp.float32),
        residual=jnp.asarray(0.1 * rng.standard_normal((B, D)), jnp.float32),
        bin_true=jnp.asarray(rng.integers(0, K, B)),
        y_true=jnp.asarray(rng.standard_normal((B, D)), jnp.float32),
        centers=jnp.asarray(rng.standard_normal((K, D)), jnp.float32),
        soft_bins=jax.nn.softmax(jnp.asarray(rng.standard_normal((B, K)), jnp.float32)),
    )


class TestTorchReductionParity:
    """Our primitives must use exactly torch's default reductions."""

    def test_cross_entropy(self, rng):
        import torch
        import torch.nn.functional as F

        logits = rng.standard_normal((B, K)).astype(np.float32)
        labels = rng.integers(0, K, B)
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_kl_div_mean(self, rng):
        import torch
        import torch.nn.functional as F

        logits = rng.standard_normal((B, K)).astype(np.float32)
        target = np.exp(rng.standard_normal((B, K))).astype(np.float32)
        target /= target.sum(1, keepdims=True)
        logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        ours = float(kl_div_mean(logp, jnp.asarray(target)))
        ref = float(
            F.kl_div(
                torch.log_softmax(torch.tensor(logits), dim=1),
                torch.tensor(target),
                reduction="mean",
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_mse_l1(self, rng):
        import torch
        import torch.nn.functional as F

        a = rng.standard_normal((B, D)).astype(np.float32)
        b = rng.standard_normal((B, D)).astype(np.float32)
        np.testing.assert_allclose(
            float(mse(jnp.asarray(a), jnp.asarray(b))),
            float(F.mse_loss(torch.tensor(a), torch.tensor(b))),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(l1(jnp.asarray(a), jnp.asarray(b))),
            float(F.l1_loss(torch.tensor(a), torch.tensor(b))),
            rtol=1e-5,
        )


class TestGeodesicLosses:
    def test_zero_at_equal_poses(self, rng):
        y = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        assert float(geodesic_aa(y, y)) < 5e-3

    def test_known_angle(self):
        y1 = jnp.array([[0.0, 0.0, 0.0]])
        y2 = jnp.array([[0.0, 0.0, np.pi / 3]])
        np.testing.assert_allclose(float(geodesic_aa(y1, y2)), np.pi / 3, atol=1e-3)

    def test_quat_double_cover(self, rng):
        q = rng.standard_normal((B, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        assert float(geodesic_quat(jnp.asarray(q), jnp.asarray(-q))) < 5e-3

    def test_rotmat_known(self, rng):
        R1 = exp_so3(jnp.zeros((1, 3)))
        R2 = exp_so3(jnp.array([[0.5, 0.0, 0.0]]))
        np.testing.assert_allclose(float(geodesic_rotmat(R1, R2)), 0.5, atol=1e-3)

    def test_grad_finite(self, rng):
        y = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        g = jax.grad(lambda p: geodesic_aa(p, y))(y + 0.01)
        assert np.all(np.isfinite(np.asarray(g)))
        g0 = jax.grad(lambda p: geodesic_aa(p, y))(y)  # at the clamp boundary
        assert np.all(np.isfinite(np.asarray(g0)))


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestReferenceLossParity:
    @classmethod
    def setup_class(cls):
        sys.path.insert(0, REFERENCE)
        import axisAngle as aa
        import quaternion as qt

        cls.aa, cls.qt = aa, qt

    @classmethod
    def teardown_class(cls):
        sys.path.remove(REFERENCE)

    def test_geodesic_aa_parity(self, rng):
        import torch

        y1 = rng.standard_normal((B, D)).astype(np.float32)
        y2 = rng.standard_normal((B, D)).astype(np.float32)
        ours = float(geodesic_aa(jnp.asarray(y1), jnp.asarray(y2)))
        ref = float(self.aa.geodesic_loss()(torch.tensor(y1), torch.tensor(y2)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_geodesic_quat_parity(self, rng):
        import torch

        q1 = rng.standard_normal((B, 4)).astype(np.float32)
        q2 = rng.standard_normal((B, 4)).astype(np.float32)
        q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
        ours = float(geodesic_quat(jnp.asarray(q1), jnp.asarray(q2)))
        ref = float(self.qt.geodesic_loss()(torch.tensor(q1), torch.tensor(q2)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestBinDeltaLosses:
    def test_decode(self, batch):
        out = decode_bin_delta(batch["scores"], batch["residual"], batch["centers"])
        ind = np.argmax(np.asarray(batch["scores"]), axis=1)
        expect = np.asarray(batch["centers"])[ind] + np.asarray(batch["residual"])
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)

    def test_simple_loss_decomposition(self, batch):
        res_true = batch["residual"] + 0.1
        total = float(
            simple_loss(batch["scores"], batch["residual"], batch["bin_true"], res_true, alpha=2.0)
        )
        lc = float(cross_entropy(batch["scores"], batch["bin_true"]))
        lr = float(mse(batch["residual"], res_true))
        np.testing.assert_allclose(total, lc + 2.0 * lr, rtol=1e-5)

    def test_bd_loss_perfect_prediction(self, batch):
        # residual chosen so decode == y_true -> regression term ~ 0
        ind = jnp.argmax(batch["scores"], axis=-1)
        residual = batch["y_true"] - batch["centers"][ind]
        loss_mse = float(
            bd_loss(batch["scores"], residual, batch["bin_true"], batch["y_true"], batch["centers"])
        )
        lc = float(cross_entropy(batch["scores"], batch["bin_true"]))
        np.testing.assert_allclose(loss_mse, lc, atol=1e-6)

    def test_probabilistic_expectation(self, batch):
        """Hand-roll the expectation over clusters."""
        scores, residual, y = batch["scores"], batch["residual"], batch["y_true"]
        got = float(
            probabilistic_loss(scores, residual, batch["bin_true"], y, batch["centers"], alpha=1.0)
        )
        probs = np.asarray(jax.nn.softmax(scores, -1))
        cand = np.asarray(residual)[:, None] + np.asarray(batch["centers"])[None]
        per = np.mean((cand - np.asarray(y)[:, None]) ** 2, axis=-1)  # (B,K)
        lr = np.mean(np.sum(probs * per, axis=1))
        lc = float(cross_entropy(scores, batch["bin_true"]))
        np.testing.assert_allclose(got, lc + lr, rtol=1e-5)

    def test_probabilistic_multires(self, batch, rng):
        residuals = jnp.asarray(0.1 * rng.standard_normal((B, K, D)), jnp.float32)
        got = float(
            probabilistic_multires_loss(
                batch["scores"], residuals, batch["soft_bins"], batch["y_true"],
                batch["centers"], soft_bins=True,
            )
        )
        assert np.isfinite(got)

    def test_riemannian_zero_when_exact(self, batch):
        key_R = exp_so3(batch["centers"])
        ind = jnp.argmax(batch["scores"], axis=-1)
        residual = jnp.zeros((B, D))
        R_true = key_R[ind]
        total = float(
            riemannian_loss(batch["scores"], residual, batch["bin_true"], R_true, key_R)
        )
        lc = float(cross_entropy(batch["scores"], batch["bin_true"]))
        np.testing.assert_allclose(total, lc, atol=5e-3)

    def test_per_bin_residual_selection(self, batch, rng):
        res_per_bin = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
        ind = np.argmax(np.asarray(batch["scores"]), axis=1)
        got = float(
            per_bin_residual_loss(
                batch["scores"], batch["residual"], batch["bin_true"], res_per_bin, alpha=1.0
            )
        )
        lc = float(cross_entropy(batch["scores"], batch["bin_true"]))
        target = np.asarray(res_per_bin)[np.arange(B), ind]
        lr = np.mean((np.asarray(batch["residual"]) - target) ** 2)
        np.testing.assert_allclose(got, lc + lr, rtol=1e-5)

    def test_all_losses_grad_finite(self, batch, rng):
        def run(fn, *args, **kw):
            g = jax.grad(lambda r: fn(batch["scores"], r, *args, **kw))(batch["residual"])
            assert np.all(np.isfinite(np.asarray(g)))

        run(simple_loss, batch["bin_true"], batch["residual"] + 0.1)
        run(bd_loss, batch["bin_true"], batch["y_true"], batch["centers"])
        run(bd_loss, batch["bin_true"], batch["y_true"], batch["centers"],
            regression_loss=lambda p, t: geodesic_aa(p, t))
        run(relaxed_bd_loss, batch["soft_bins"], batch["y_true"], batch["centers"])
        run(probabilistic_loss, batch["bin_true"], batch["y_true"], batch["centers"])


class TestSelfBalance:
    def test_warmup_formula(self):
        lc, lr, s = jnp.float32(1.0), jnp.float32(2.0), jnp.float32(0.5)
        loss, s_next = self_balanced(lc, lr, s, mode="warmup")
        np.testing.assert_allclose(float(loss), 1.0 + 0.5 * np.exp(-1.0) * 2.0 + 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(s_next), 0.5 * np.log(2.0), rtol=1e-5)

    def test_main_formula(self):
        lc, lr, s = jnp.float32(1.0), jnp.float32(2.0), jnp.float32(0.5)
        loss, s_next = self_balanced(lc, lr, s, mode="main")
        np.testing.assert_allclose(float(loss), 1.0 + np.exp(-0.5) * 2.0 + 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(s_next), np.log(2.0), rtol=1e-5)

    def test_no_gradient_through_s(self):
        def f(s):
            loss, _ = self_balanced(jnp.float32(1.0), jnp.float32(2.0), s, mode="main")
            return loss

        g = jax.grad(f)(jnp.float32(0.5))
        np.testing.assert_allclose(float(g), 0.0)

    def test_init(self):
        assert float(init_log_balance()) == 0.0


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestQuatProbabilisticParity:
    """probabilistic_quat[_multires] problems vs the reference's OWN
    RelaXedProbabilisticLossQ / RelaXedProbabilisticMultiresLossQ
    (binDeltaLosses.py:149-166,197-208) — the reference-dormant quaternion
    loss variants, instantiated from /root/reference with a fake kmeans
    pickle and .cuda() no-op'd."""

    @pytest.fixture()
    def ref_mods(self):
        import torch
        from torch import nn

        sys.path.insert(0, REFERENCE)
        mc, tc = nn.Module.cuda, torch.Tensor.cuda
        nn.Module.cuda = lambda self, *a, **k: self
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            import binDeltaLosses
            import quaternion as ref_quaternion

            yield binDeltaLosses, ref_quaternion
        finally:
            nn.Module.cuda, torch.Tensor.cuda = mc, tc
            sys.path.remove(REFERENCE)
            for m in ("binDeltaLosses", "quaternion", "helperFunctions",
                      "axisAngle"):
                sys.modules.pop(m, None)

    @staticmethod
    def _kmeans_pickle(tmp_path, centers_aa):
        import pickle

        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=len(centers_aa))
        km.cluster_centers_ = np.asarray(centers_aa, np.float64)
        f = tmp_path / "kmeans.pkl"
        with open(f, "wb") as fh:
            pickle.dump(km, fh)
        return str(f)

    @pytest.fixture()
    def quat_batch(self, rng):
        centers_aa = (0.7 * rng.standard_normal((K, D))).astype(np.float32)
        y = rng.standard_normal((B, 4)).astype(np.float32)
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        scores = rng.standard_normal((B, K)).astype(np.float32)
        return centers_aa, y, scores

    def test_targets_match_xpbd_generator_q(self, quat_batch):
        """targets == XPBDGeneratorQ's host formula
        (binDeltaGenerators.py:103-109): normalized exp(-10*d^2) over
        quaternion sqeuclidean to the CONVERTED dictionary, soft-mean
        residual."""
        from scipy.spatial.distance import cdist

        from multi_modal_regression_tpu.geometry.quaternion import (
            convert_dictionary,
        )
        from multi_modal_regression_tpu.train.problems import make_problem

        centers_aa, y, _ = quat_batch
        problem = make_problem("probabilistic_quat", centers_aa, gamma=10.0)
        tg = problem.targets(jnp.asarray(y))
        Cq = np.asarray(convert_dictionary(jnp.asarray(centers_aa)))
        soft = np.exp(-10.0 * cdist(y, Cq, "sqeuclidean"))
        soft /= soft.sum(1, keepdims=True)
        np.testing.assert_allclose(np.asarray(tg["soft"]), soft, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tg["res"]), y - soft @ Cq, rtol=1e-4, atol=1e-5
        )

    def test_single_delta_parity(self, ref_mods, quat_batch, rng, tmp_path):
        import torch

        from multi_modal_regression_tpu.train.problems import make_problem

        bdl, ref_qt = ref_mods
        centers_aa, y, scores = quat_batch
        residual = (0.1 * rng.standard_normal((B, 4))).astype(np.float32)
        problem = make_problem("probabilistic_quat", centers_aa, gamma=10.0)
        tg = problem.targets(jnp.asarray(y))
        lc, lr = problem.main_losses(
            (jnp.asarray(scores), jnp.asarray(residual)), tg
        )
        ref_loss = bdl.RelaXedProbabilisticLossQ(
            1.0, self._kmeans_pickle(tmp_path, centers_aa),
            ref_qt.geodesic_loss(reduce=False),
        )
        want = float(ref_loss(
            (torch.tensor(scores), torch.tensor(residual)),
            (torch.tensor(np.asarray(tg["soft"])), torch.tensor(y)),
        ))
        np.testing.assert_allclose(float(lc) + float(lr), want, rtol=1e-4)

    def test_multires_parity(self, ref_mods, quat_batch, rng, tmp_path):
        import torch

        from multi_modal_regression_tpu.train.problems import make_problem

        bdl, ref_qt = ref_mods
        centers_aa, y, scores = quat_batch
        residual = (0.1 * rng.standard_normal((B, K, 4))).astype(np.float32)
        problem = make_problem(
            "probabilistic_quat_multires", centers_aa, gamma=10.0,
            multires=True,
        )
        tg = problem.targets(jnp.asarray(y))
        lc, lr = problem.main_losses(
            (jnp.asarray(scores), jnp.asarray(residual)), tg
        )
        ref_loss = bdl.RelaXedProbabilisticMultiresLossQ(
            1.0, self._kmeans_pickle(tmp_path, centers_aa),
            ref_qt.geodesic_loss(reduce=False),
        )
        want = float(ref_loss(
            (torch.tensor(scores), torch.tensor(residual)),
            (torch.tensor(np.asarray(tg["soft"])), torch.tensor(y)),
        ))
        np.testing.assert_allclose(float(lc) + float(lr), want, rtol=1e-4)

    def test_decode_renormalized_argmax(self, quat_batch, rng):
        from multi_modal_regression_tpu.geometry.quaternion import (
            convert_dictionary,
        )
        from multi_modal_regression_tpu.train.problems import make_problem

        centers_aa, _, scores = quat_batch
        residual = (0.1 * rng.standard_normal((B, K, 4))).astype(np.float32)
        problem = make_problem(
            "probabilistic_quat_multires", centers_aa, gamma=10.0,
            multires=True,
        )
        got = np.asarray(
            problem.decode((jnp.asarray(scores), jnp.asarray(residual)))
        )
        Cq = np.asarray(convert_dictionary(jnp.asarray(centers_aa)))
        ind = np.argmax(scores, axis=1)
        want = Cq[ind] + residual[np.arange(B), ind]
        want /= np.linalg.norm(want, axis=1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=1), 1.0, rtol=1e-5
        )
