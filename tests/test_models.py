"""Model-zoo tests: shapes, head-bank equivalence, BN semantics.

The key invariant: a MultiHeadMLP bank computed with one einsum per layer
must agree with applying each head's parameters independently (the
reference's ModuleList-loop semantics, binDeltaModels.py:112-121).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_regression_tpu.models import (
    MultiHeadMLP,
    OneBinDeltaModel,
    OneDeltaPerBinModel,
    ProbabilisticOneDeltaPerBinModel,
    PerClassRegressionModel,
    IndependentBDModel,
    LabelConcatBDModel,
    ResNetBackbone,
    select_class,
)

B, C, K, ND = 6, 4, 5, 3
TINY = dict(
    num_classes=C, N0=128, N1=32, N2=16,
    feature_network="resnet18", feature_layer="layer4",
)


def tiny_images(rng, n=B, size=32):
    return jnp.asarray(rng.standard_normal((n, size, size, 3)), jnp.float32)


def test_multihead_matches_per_head_loop(rng):
    """Bank einsum == looping over heads with the same slices of params."""
    m = MultiHeadMLP(num_heads=C, features=(8, K))
    x = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (B, C, K)

    p = variables["params"]
    bs = variables["batch_stats"]["bn1"]
    for h in range(C):
        z = x @ p["fc1_kernel"][h]
        mean, var = bs["mean"][h], bs["var"][h]
        z = (z - mean) / np.sqrt(var + 1e-5)
        z = z * p["bn1"]["scale"][h] + p["bn1"]["bias"][h]
        z = np.maximum(z, 0.0)
        z = z @ p["fc2_kernel"][h] + p["fc2_bias"][h]
        np.testing.assert_allclose(out[:, h], z, rtol=1e-4, atol=1e-5)


def test_multihead_bn_train_stats_per_head(rng):
    """In train mode BN normalizes per (head, feature) over the batch."""
    m = MultiHeadMLP(num_heads=C, features=(8, K))
    x = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out, mutated = m.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (B, C, K)
    # running stats moved away from init (mean 0 / var 1)
    assert not np.allclose(mutated["batch_stats"]["bn1"]["mean"], 0.0)


def test_select_class(rng):
    per_head = jnp.asarray(rng.standard_normal((B, C, K)), jnp.float32)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    got = select_class(per_head, label)
    for i in range(B):
        np.testing.assert_array_equal(got[i], per_head[i, int(label[i])])


def test_resnet_backbone_feature_dims(rng):
    x = tiny_images(rng, n=2, size=64)
    for stages, dim in [(2, 512), (3, 1024), (4, 2048)]:
        bb = ResNetBackbone(arch="resnet50", num_stages=stages)
        variables = bb.init(jax.random.PRNGKey(0), x, train=False)
        feat = bb.apply(variables, x, train=False)
        assert feat.shape == (2, dim)
        assert bb.feature_dim == dim


@pytest.mark.parametrize(
    "cls,extra",
    [
        (OneBinDeltaModel, dict(num_clusters=K, ndim=ND)),
        (OneDeltaPerBinModel, dict(num_clusters=K, N3=8, ndim=ND)),
    ],
)
def test_bin_delta_shapes(rng, cls, extra):
    model = cls(**TINY, **extra)
    x = tiny_images(rng)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, label, train=False)
    scores, residual = model.apply(variables, x, label, train=False)
    assert scores.shape == (B, K)
    assert residual.shape == (B, ND)


def test_probabilistic_returns_all_deltas(rng):
    model = ProbabilisticOneDeltaPerBinModel(**TINY, num_clusters=K, N3=8, ndim=ND)
    x = tiny_images(rng)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, label, train=False)
    scores, deltas = model.apply(variables, x, label, train=False)
    assert scores.shape == (B, K)
    assert deltas.shape == (B, K, ND)


def test_delta_per_bin_picks_argmax_delta(rng):
    """OneDeltaPerBin's residual equals the probabilistic model's delta at
    the argmax bin (they share the same architecture)."""
    kwargs = dict(**TINY, num_clusters=K, N3=8, ndim=ND)
    x = tiny_images(rng)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    prob = ProbabilisticOneDeltaPerBinModel(**kwargs)
    variables = prob.init(jax.random.PRNGKey(0), x, label, train=False)
    scores, deltas = prob.apply(variables, x, label, train=False)
    top1 = OneDeltaPerBinModel(**kwargs)
    scores2, residual = top1.apply(variables, x, label, train=False)
    np.testing.assert_allclose(scores, scores2, rtol=1e-6)
    ind = np.argmax(np.asarray(scores), axis=-1)
    np.testing.assert_allclose(
        residual, np.asarray(deltas)[np.arange(B), ind], rtol=1e-6
    )


def test_regression_model_pi_tanh_bounds(rng):
    model = PerClassRegressionModel(**TINY, ndim=ND, nonlinearity="pi_tanh")
    x = tiny_images(rng)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, label, train=False)
    y = model.apply(variables, x, label, train=False)
    assert y.shape == (B, ND)
    assert np.all(np.abs(np.asarray(y)) <= np.pi)


def test_independent_bd_shapes(rng):
    model = IndependentBDModel(**TINY, num_clusters=K, N3=8, ndim=ND)
    x = tiny_images(rng)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    scores, residual = model.apply(variables, x, train=False)
    assert scores.shape == (B, K)
    assert residual.shape == (B, ND)


def test_label_concat_bd_uses_label(rng):
    model = LabelConcatBDModel(**TINY, num_clusters=K, ndim=ND)
    x = tiny_images(rng)
    l0 = jnp.zeros(B, jnp.int32)
    l1 = jnp.ones(B, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, l0, train=False)
    s0, _ = model.apply(variables, x, l0, train=False)
    s1, _ = model.apply(variables, x, l1, train=False)
    assert s0.shape == (B, K)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_quat_nonlinearity_unit_norm(rng):
    model = PerClassRegressionModel(**TINY, ndim=4, nonlinearity="quat")
    x = tiny_images(rng)
    label = jnp.asarray(rng.integers(0, C, B), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, label, train=False)
    q = model.apply(variables, x, label, train=False)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, rtol=1e-5)


def test_batchnorm_running_stats_match_torch(rng):
    """TorchBatchNorm's running-stat update == torch.nn.BatchNorm (Bessel-
    corrected running variance — the flax default's biased update diverges
    by (n-1)/n, ~1% at head-bank batch sizes; models/norm.py)."""
    import torch

    from multi_modal_regression_tpu.models.norm import TorchBatchNorm

    n, feat = 10, 7
    bn_j = TorchBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    bn_t = torch.nn.BatchNorm1d(feat, momentum=0.1, eps=1e-5)
    bn_t.train()
    x0 = rng.standard_normal((n, feat)).astype(np.float32)
    variables = bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    for i in range(3):
        x = (rng.standard_normal((n, feat)) * (1.5 + i)).astype(np.float32)
        y_j, variables = bn_j.apply(
            variables, jnp.asarray(x), mutable=["batch_stats"]
        )
        variables = {"params": bn_j.init(jax.random.PRNGKey(0), jnp.asarray(x0))["params"], **variables}
        with torch.no_grad():
            y_t = bn_t(torch.from_numpy(x))
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy(), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        bn_t.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )
