"""Pretrained-weight conversion: tree structure + numerical conv/BN parity.

torchvision itself is not installed; state_dicts are synthesized with the
torchvision key/shape conventions, and numerical parity is checked against
torch.nn.functional ops (the ground truth for what those weights expect).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multi_modal_regression_tpu.models.backbones import ResNetBackbone
from multi_modal_regression_tpu.models.pretrained import (
    load_torchvision_resnet,
)


def _resnet18_state_dict(rng, num_stages=4):
    """Random state_dict with torchvision resnet18 keys/shapes."""
    sd = {}

    def conv(k, o, i, s):
        sd[k + ".weight"] = rng.standard_normal((o, i, s, s)).astype(np.float32) * 0.05

    def bn(k, c):
        sd[k + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[k + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[k + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[k + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_c = 64
    for stage in range(num_stages):
        w = widths[stage]
        for block in range(2):
            p = f"layer{stage + 1}.{block}"
            conv(p + ".conv1", w, in_c if block == 0 else w, 3)
            bn(p + ".bn1", w)
            conv(p + ".conv2", w, w, 3)
            bn(p + ".bn2", w)
            if block == 0 and in_c != w:
                conv(p + ".downsample.0", w, in_c, 1)
                bn(p + ".downsample.1", w)
        in_c = w
    return sd


def test_resnet_conversion_matches_flax_tree(rng):
    sd = _resnet18_state_dict(rng)
    params, stats = load_torchvision_resnet(sd, "resnet18", num_stages=4)
    bb = ResNetBackbone(arch="resnet18", num_stages=4)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    want_p = jax.tree.map(lambda a: a.shape, variables["params"])
    got_p = jax.tree.map(lambda a: np.shape(a), params)
    assert want_p == got_p
    want_s = jax.tree.map(lambda a: a.shape, variables["batch_stats"])
    got_s = jax.tree.map(lambda a: np.shape(a), stats)
    assert want_s == got_s


def test_converted_backbone_matches_torch_functional(rng):
    """Full converted resnet18 forward == the same net built from
    torch.nn.functional ops on the original state_dict (eval mode)."""
    sd = _resnet18_state_dict(rng)
    params, stats = load_torchvision_resnet(sd, "resnet18", num_stages=4)
    bb = ResNetBackbone(arch="resnet18", num_stages=4)
    x_np = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    got = np.asarray(
        bb.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x_np),
            train=False,
        )
    )

    # torch reference (NCHW), functional, eval-mode BN
    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))

    def tbn(x, p):
        return F.batch_norm(
            x, t[p + ".running_mean"], t[p + ".running_var"],
            t[p + ".weight"], t[p + ".bias"], training=False, eps=1e-5,
        )

    x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(tbn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for stage in range(4):
        for block in range(2):
            p = f"layer{stage + 1}.{block}"
            stride = 2 if stage > 0 and block == 0 else 1
            res = x
            y = F.conv2d(x, t[p + ".conv1.weight"], stride=stride, padding=1)
            y = F.relu(tbn(y, p + ".bn1"))
            y = F.conv2d(y, t[p + ".conv2.weight"], stride=1, padding=1)
            y = tbn(y, p + ".bn2")
            if p + ".downsample.0.weight" in t:
                res = tbn(
                    F.conv2d(x, t[p + ".downsample.0.weight"], stride=stride),
                    p + ".downsample.1",
                )
            x = F.relu(y + res)
    want = x.mean(dim=(2, 3)).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
