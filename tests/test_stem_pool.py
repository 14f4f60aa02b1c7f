"""Fused stem bn+relu+maxpool kernel (ops/stem_pool.py) vs XLA composite."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_regression_tpu.ops import stem_pool as sp


def _data(seed=0, shape=(2, 16, 12, 8)):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    a = jnp.asarray(rng.uniform(0.5, 2.0, shape[-1]), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape[-1]) * 0.1, jnp.float32)
    return y, a, b


def test_forward_matches_composite():
    y, a, b = _data()
    p_i = sp.stem_bn_relu_pool(y, a, b, "interpret")
    p_x = sp.stem_bn_relu_pool(y, a, b, "xla")
    np.testing.assert_array_equal(
        np.asarray(p_i, np.float32), np.asarray(p_x, np.float32)
    )


def test_forward_matches_flax_maxpool():
    """Same as the unfused backbone stem tail: flax max_pool semantics."""
    from flax import linen as nn

    y, a, b = _data(1)
    z = nn.relu(y * a.astype(y.dtype) + b.astype(y.dtype))
    ref = nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    p = sp.stem_bn_relu_pool(y, a, b, "interpret")
    np.testing.assert_array_equal(
        np.asarray(p, np.float32), np.asarray(ref, np.float32)
    )


def test_gradients_match_composite():
    y, a, b = _data(2)

    def loss(impl):
        return lambda y, a, b: jnp.sum(
            jnp.tanh(sp.stem_bn_relu_pool(y, a, b, impl).astype(jnp.float32))
            ** 2
        )

    g_i = jax.grad(loss("interpret"), (0, 1, 2))(y, a, b)
    g_x = jax.grad(loss("xla"), (0, 1, 2))(y, a, b)
    # dy: positions may differ ONLY at positive bf16 ties inside a pool
    # window, where the kernel and select_and_scatter route the gradient to
    # different (equally valid) argmax positions. Routing preserves the
    # per-channel gradient mass, so sums must agree tightly and the number
    # of differing positions must be a tiny fraction.
    gy_i = np.asarray(g_i[0], np.float32)
    gy_x = np.asarray(g_x[0], np.float32)
    denom = max(np.abs(gy_x).max(), 1e-6)
    mism = np.abs(gy_i - gy_x) / denom > 2e-2
    assert mism.mean() < 0.01, f"{mism.sum()} rerouted positions"
    np.testing.assert_allclose(
        gy_i.sum(axis=(0, 1, 2)), gy_x.sum(axis=(0, 1, 2)),
        rtol=2e-2, atol=1e-2,
    )
    for name, gi, gx in zip("ab", g_i[1:], g_x[1:]):
        gi = np.asarray(gi, np.float32)
        gx = np.asarray(gx, np.float32)
        denom = max(np.abs(gx).max(), 1e-6)
        assert np.abs(gi - gx).max() / denom < 2e-2, name


def test_backbone_stem_path_matches_default():
    """ResNetBackbone with stem_pool='xla' (explicit folded BN + composite
    pool) reproduces the flax-module stem numerics."""
    from multi_modal_regression_tpu.models.backbones import ResNetBackbone

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    ref = ResNetBackbone(arch="resnet50", num_stages=2, dtype=jnp.bfloat16)
    alt = ResNetBackbone(
        arch="resnet50", num_stages=2, dtype=jnp.bfloat16, stem_pool="xla"
    )
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    v2 = alt.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    y_ref = ref.apply(variables, x, train=False)
    y_alt = alt.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_alt, np.float32),
        rtol=0.05, atol=0.05,
    )
    # train mode: forward + batch-stat updates agree
    yr, mr = ref.apply(variables, x, train=True, mutable=["batch_stats"])
    ya, ma = alt.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(yr, np.float32), np.asarray(ya, np.float32),
        rtol=0.05, atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(mr["batch_stats"]["bn1"]["mean"]),
        np.asarray(ma["batch_stats"]["bn1"]["mean"]),
        rtol=1e-2, atol=1e-3,
    )
