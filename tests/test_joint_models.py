"""Joint cat+pose model family: shapes, mixing semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_regression_tpu.models import (
    ElhoseinyBDModel,
    ElhoseinyRegressionModel,
    JointCatPoseBDModel,
    JointCatPoseBDModel2,
    JointCatPoseRegModel,
    class_weights,
    mix_heads,
)

B, C, K, ND = 5, 4, 6, 3
TINY = dict(
    num_classes=C, N0=128, N1=32, N2=16,
    feature_network="resnet18", feature_layer="layer4",
)
TINY2 = dict(num_classes=C, N0=128, N1=32, N2=16, arch="resnet18")


def tiny_images(rng, n=B, size=32):
    return jnp.asarray(rng.standard_normal((n, size, size, 3)), jnp.float32)


def test_class_weights_modes(rng):
    logits = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    top1 = class_weights(logits, "top1")
    assert np.allclose(np.sum(np.asarray(top1), -1), 1.0)
    assert np.array_equal(np.argmax(np.asarray(top1), -1), np.argmax(np.asarray(logits), -1))
    wgt = class_weights(logits, "weighted")
    np.testing.assert_allclose(np.asarray(wgt), np.asarray(jax.nn.softmax(logits, -1)))
    st = class_weights(logits, "top1_st")
    np.testing.assert_allclose(np.asarray(st), np.asarray(top1), atol=1e-6)


def test_top1_st_backward_is_softmax_grad(rng):
    """Straight-through: value is hard one-hot, gradient is softmax's."""
    logits = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    g_st = jax.grad(lambda l: jnp.sum(class_weights(l, "top1_st") * v))(logits)
    g_soft = jax.grad(lambda l: jnp.sum(jax.nn.softmax(l, -1) * v))(logits)
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_soft), rtol=1e-5)
    g_hard = jax.grad(lambda l: jnp.sum(class_weights(l, "top1") * v))(logits)
    np.testing.assert_allclose(np.asarray(g_hard), 0.0, atol=1e-7)


def test_mix_heads_weighted_is_convex_combination(rng):
    per_head = jnp.asarray(rng.standard_normal((B, C, K)), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, C)), jnp.float32))
    got = mix_heads(per_head, w)
    want = np.einsum("bcd,bc->bd", np.asarray(per_head), np.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


@pytest.mark.parametrize("multires", [False, True])
@pytest.mark.parametrize("mixing", ["top1", "weighted"])
def test_joint_v1_shapes(rng, multires, mixing):
    model = JointCatPoseBDModel(
        **TINY, num_clusters=K, N3=8, ndim=ND, multires=multires, mixing=mixing
    )
    x = tiny_images(rng)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cat, scores, residual = model.apply(variables, x, train=False)
    assert cat.shape == (B, C)
    assert scores.shape == (B, K)
    assert residual.shape == (B, ND)


def test_joint_v2_shapes(rng):
    model = JointCatPoseBDModel2(**TINY2, num_clusters=K, ndim=ND, mixing="weighted")
    x = tiny_images(rng, size=64)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cat, scores, residual = model.apply(variables, x, train=False)
    assert cat.shape == (B, C)
    assert scores.shape == (B, K)
    assert residual.shape == (B, ND)
    # the two layer4 branches are distinct parameter trees
    params = variables["params"]
    assert "pose_stage" in params and "category_stage" in params


def test_joint_v3_shapes_and_bounds(rng):
    model = JointCatPoseRegModel(**TINY, ndim=ND, mixing="top1")
    x = tiny_images(rng)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cat, y = model.apply(variables, x, train=False)
    assert cat.shape == (B, C)
    assert y.shape == (B, ND)
    assert np.all(np.abs(np.asarray(y)) <= np.pi)


def test_elhoseiny_bd_shapes(rng):
    model = ElhoseinyBDModel(**TINY, num_clusters=K, N3=8, ndim=ND)
    x = tiny_images(rng)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cat, scores, residual = model.apply(variables, x, train=False)
    assert cat.shape == (B, C)
    assert scores.shape == (B, K)
    assert residual.shape == (B, ND)


def test_elhoseiny_regression_shapes(rng):
    model = ElhoseinyRegressionModel(**TINY, ndim=ND)
    x = tiny_images(rng)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cat, y = model.apply(variables, x, train=False)
    assert cat.shape == (B, C)
    assert y.shape == (B, ND)
