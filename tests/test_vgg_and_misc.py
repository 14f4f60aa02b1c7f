"""Coverage for the VGG path, my_proj nonlinearity, and multires presets."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models import VGGBackbone
from multi_modal_regression_tpu.models.heads import apply_output_nonlinearity
from multi_modal_regression_tpu.models.pretrained import load_torchvision_vgg
from multi_modal_regression_tpu.train import Trainer, get_config

VGG13 = (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


def _vgg13_bn_state_dict(rng):
    sd = {}
    ti = 0
    in_c = 3
    for v in VGG13:
        if v == "M":
            ti += 1
            continue
        sd[f"features.{ti}.weight"] = (
            rng.standard_normal((v, in_c, 3, 3)).astype(np.float32) * 0.05
        )
        sd[f"features.{ti}.bias"] = rng.standard_normal(v).astype(np.float32) * 0.1
        bn = f"features.{ti + 1}"
        sd[bn + ".weight"] = rng.uniform(0.5, 1.5, v).astype(np.float32)
        sd[bn + ".bias"] = rng.standard_normal(v).astype(np.float32) * 0.1
        sd[bn + ".running_mean"] = rng.standard_normal(v).astype(np.float32) * 0.1
        sd[bn + ".running_var"] = rng.uniform(0.5, 1.5, v).astype(np.float32)
        ti += 3
        in_c = v
    # classifier expects 512 * 7 * 7 inputs (224-px images)
    sd["classifier.0.weight"] = (
        rng.standard_normal((4096, 512 * 7 * 7)).astype(np.float32) * 0.01
    )
    sd["classifier.0.bias"] = rng.standard_normal(4096).astype(np.float32) * 0.1
    return sd


def test_vgg_conversion_matches_torch_functional(rng):
    """Converted VGG13-bn fc6 backbone == torch.nn.functional reference,
    including the NCHW->flatten element order into fc6."""
    sd = _vgg13_bn_state_dict(rng)
    params, stats = load_torchvision_vgg(sd, "vgg13", "fc6")
    bb = VGGBackbone(arch="vgg13", layer="fc6")
    x_np = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    got = np.asarray(
        bb.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x_np),
            train=False,
        )
    )

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)))
    ti = 0
    for v in VGG13:
        if v == "M":
            x = F.max_pool2d(x, 2, 2)
            ti += 1
            continue
        x = F.conv2d(x, t[f"features.{ti}.weight"], t[f"features.{ti}.bias"],
                     padding=1)
        bn = f"features.{ti + 1}"
        x = F.batch_norm(x, t[bn + ".running_mean"], t[bn + ".running_var"],
                         t[bn + ".weight"], t[bn + ".bias"], training=False,
                         eps=1e-5)
        x = F.relu(x)
        ti += 3
    x = x.flatten(1)
    x = F.relu(F.linear(x, t["classifier.0.weight"], t["classifier.0.bias"]))
    want = x.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_my_proj_wraps_angle(rng):
    """myProj: angle = fmod(|y|, pi), axis preserved
    (learnGeodesicRegressionModel.py:76-80)."""
    y = rng.standard_normal((16, 3)).astype(np.float32) * 3.0
    got = np.asarray(apply_output_nonlinearity(jnp.asarray(y), "my_proj"))
    norm = np.linalg.norm(y, axis=-1, keepdims=True)
    want = np.fmod(norm, np.pi) * (y / norm)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(np.linalg.norm(got, axis=-1) <= np.pi + 1e-5)


def test_multires_preset_step(rng):
    """geodesic_bd_multires (OneDeltaPerBin) takes a finite train step."""
    centers = (0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    cfg = get_config(
        "geodesic_bd_multires",
        feature_network="resnet18", feature_layer="layer4",
        num_classes=3, N0=512, N1=32, N2=16, N3=8, dict_size=4, image_size=32,
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    batch = trainer.shard_batch({
        "xdata": rng.integers(0, 256, (6, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (6, 3)).astype(np.float32),
        "label": (np.arange(6) % 3).astype(np.int32),
    })
    for phase in ("warmup", "main"):
        state, m = trainer.train_step_fn(phase)(state, batch)
        assert np.isfinite(float(m["loss"])), phase


def test_probabilistic_multires_preset_step(rng):
    """probabilistic_bd_multires returns per-cluster deltas and steps."""
    from multi_modal_regression_tpu.dictionary.gmm import GMMDictionary

    k = 4
    means = (0.7 * rng.standard_normal((k, 3))).astype(np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32)[None] * 0.3, (k, 1, 1))
    w = np.full(k, 1.0 / k, np.float32)
    gmm = GMMDictionary(means=means, covariances=covs, weights=w)
    cfg = get_config(
        "probabilistic_bd_multires",
        feature_network="resnet18", feature_layer="layer4",
        num_classes=3, N0=512, N1=32, N2=16, N3=8, dict_size=k, image_size=32,
    )
    trainer = Trainer(cfg, dictionary=gmm)
    state = trainer.init_state()
    batch = trainer.shard_batch({
        "xdata": rng.integers(0, 256, (6, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (6, 3)).astype(np.float32),
        "label": (np.arange(6) % 3).astype(np.int32),
    })
    for phase in ("warmup", "main"):
        state, m = trainer.train_step_fn(phase)(state, batch)
        assert np.isfinite(float(m["loss"])), phase


def test_train_flip_augmentation(rng):
    """train_flip=True: the step runs, the rng key advances, and the flip's
    pose transform keeps the objective consistent (loss comparable)."""
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary

    centers = (0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    cfg = get_config(
        "geodesic_bd", feature_network="resnet18", feature_layer="layer4",
        num_classes=3, N0=512, N1=32, N2=16, dict_size=4, image_size=32,
        train_flip=True,
    )
    trainer = Trainer(cfg, dictionary=KMeansDictionary(cluster_centers=centers))
    state = trainer.init_state()
    rng0 = np.asarray(jax.device_get(state.rng))
    batch = trainer.shard_batch({
        "xdata": rng.integers(0, 256, (6, 32, 32, 3), np.uint8),
        "euler": rng.uniform(-90, 90, (6, 3)).astype(np.float32),
        "label": (np.arange(6) % 3).astype(np.int32),
    })
    state, m = trainer.train_step_fn("main")(state, batch)
    assert np.isfinite(float(m["loss"]))
    rng1 = np.asarray(jax.device_get(state.rng))
    assert not np.array_equal(rng0, rng1)  # key advanced


def test_flip_pose_matches_flipped_image_pose(rng):
    """Geometry consistency: rendering the pose-pattern at (az,el,ct),
    flipping the image, equals rendering at (-az, el, -ct) mirrored content
    — i.e. the euler transform tracks the pixel flip. We verify through the
    targets: euler_to_pose(flip(euler)) == pose of the mirrored rotation."""
    import jax.numpy as jnp

    from multi_modal_regression_tpu.data.targets import euler_to_pose
    from multi_modal_regression_tpu.geometry.so3 import (
        exp_so3,
        rotation_from_euler,
    )
    from multi_modal_regression_tpu.ops.augment import flip_pose_euler

    euler = jnp.asarray(rng.uniform(-60, 60, (8, 3)), jnp.float32)
    flip = jnp.ones(8, bool)
    y_f = euler_to_pose(flip_pose_euler(euler, flip))
    # mirrored rotation: M R M with M = diag(-1, 1, 1) equals
    # R(-az, el, -ct) for the ZXZ convention
    M = jnp.diag(jnp.asarray([-1.0, 1.0, 1.0]))
    R = rotation_from_euler(euler[:, 0], euler[:, 1], euler[:, 2])
    R_mirror = M @ R @ M
    np.testing.assert_allclose(
        np.asarray(exp_so3(y_f)), np.asarray(R_mirror), atol=1e-5
    )


def test_probabilistic_quaternion_preset_steps(rng):
    """probabilistic_bd_quaternion[_multires]: both phases step finitely
    (the reference-dormant RelaXedProbabilisticLossQ variants wired as
    presets; loss parity vs the reference classes in test_losses.py)."""
    from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary

    centers = (0.7 * rng.standard_normal((4, 3))).astype(np.float32)
    for preset in (
        "probabilistic_bd_quaternion", "probabilistic_bd_quaternion_multires"
    ):
        cfg = get_config(
            preset,
            feature_network="resnet18", feature_layer="layer4",
            num_classes=3, N0=512, N1=32, N2=16, N3=8, dict_size=4,
            image_size=32,
        )
        assert cfg.ndim == 4
        trainer = Trainer(
            cfg, dictionary=KMeansDictionary(cluster_centers=centers)
        )
        state = trainer.init_state()
        batch = trainer.shard_batch({
            "xdata": rng.integers(0, 256, (6, 32, 32, 3), np.uint8),
            "euler": rng.uniform(-90, 90, (6, 3)).astype(np.float32),
            "label": (np.arange(6) % 3).astype(np.int32),
        })
        for phase in ("warmup", "main"):
            state, m = trainer.train_step_fn(phase)(state, batch)
            assert np.isfinite(float(m["loss"])), (preset, phase)
