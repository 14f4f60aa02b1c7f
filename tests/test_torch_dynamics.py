"""Cross-framework training-dynamics parity: the reference's OWN torch
modules vs this framework's compiled train step.

The strongest acceptance-gate evidence obtainable without the PASCAL3D+
artifacts: assemble the reference training loop from the reference's own
code — `binDeltaModels.OneBinDeltaModel` / `OneDeltaPerBinModel`
(binDeltaModels.py:99-151), `axisAngle.geodesic_loss` (axisAngle.py:103-120),
torch.optim.Adam at init_lr with the host-lagged self-balance scalar and the
warmup->main phase transition (learnGeodesicBDModel.py:106-205) — and run it
head-to-head against `Trainer`'s compiled step from IDENTICAL initial
weights (converted with models.pretrained.load_reference_bd_checkpoint) on
identical batches. Multi-step loss/Lc/Lr/s trajectories and the final
parameters must agree within float-accumulation tolerance.

What this certifies by measurement (previously only by construction):
  - Adam update math (bias correction, eps placement) == torch.optim.Adam
  - the one-step-lagged `s` protocol in both its warm-up and main forms
  - warmup (CE + MSE on residuals) -> main (CE + geodesic on decoded pose)
    phase semantics including the s reset between phases
  - train-mode BatchNorm batch-statistics use in backbone and head banks
  - the einsum head banks == the reference's per-class ModuleList loop
  - hard_bin_targets == the host-side kmeans assignment protocol

torchvision is not installed; the backbone is a torch resnet18 built here
with torchvision's module names (the same synthesized-state-dict convention
as test_pretrained.py) and injected as the reference model's feature_model
(the reference wraps torchvision children in nn.Sequential the same way,
featureModels.py:34-41).
"""

import math
import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
from torch import nn

from multi_modal_regression_tpu.data.loader import IMAGENET_MEAN, IMAGENET_STD
from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models.pretrained import (
    load_reference_bd_checkpoint,
)
from multi_modal_regression_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
)
from multi_modal_regression_tpu.train import get_config
from multi_modal_regression_tpu.train.trainer import Trainer

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)

pytestmark = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference repo not mounted"
)

C, K, NDIM = 12, 8, 3
N0, N1, N2, N3 = 512, 32, 16, 12
SIZE, B = 32, 12
N_WARMUP, N_MAIN, N_BATCHES = 4, 6, 3


# ---------------------------------------------------------------------------
# reference-module import (torchvision stubbed, .cuda() no-op'd)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_modules(request):
    """Import the reference's binDeltaModels + axisAngle with a torchvision
    stub (featureModels.py imports it at module scope) and .cuda() patched
    to a no-op (the reference hard-codes .cuda() in __init__/forward,
    binDeltaModels.py:106-117 — this box is CPU-only torch)."""
    stub = types.ModuleType("torchvision")
    stub.models = types.ModuleType("torchvision.models")
    stub.transforms = types.ModuleType("torchvision.transforms")
    saved = {
        k: sys.modules.get(k)
        for k in ("torchvision", "torchvision.models", "torchvision.transforms")
    }
    sys.modules["torchvision"] = stub
    sys.modules["torchvision.models"] = stub.models
    sys.modules["torchvision.transforms"] = stub.transforms
    sys.path.insert(0, REFERENCE)
    module_cuda = nn.Module.cuda
    tensor_cuda = torch.Tensor.cuda
    nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import axisAngle
        import binDeltaLosses
        import binDeltaModels
        import helperFunctions

        yield binDeltaModels, axisAngle, helperFunctions, binDeltaLosses
    finally:
        nn.Module.cuda = module_cuda
        torch.Tensor.cuda = tensor_cuda
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in ("axisAngle", "binDeltaLosses", "binDeltaModels",
                  "featureModels", "helperFunctions", "quaternion",
                  "objectnetHelperFunctions", "poseModels"):
            sys.modules.pop(k, None)


# ---------------------------------------------------------------------------
# torch resnet18 with torchvision names (the reference feature_model shape)
# ---------------------------------------------------------------------------


class _BasicBlock(nn.Module):
    """torchvision BasicBlock layout (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
            if stride != 1 or cin != cout
            else None
        )

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + res)


class TorchResNet18Features(nn.Module):
    """The reference's resnet feature wrapper (featureModels.py:34-41):
    nn.Sequential of [conv1, bn1, relu, maxpool, layer1..layer4] named
    `features`, followed by global average pooling to (B, 512)."""

    def __init__(self):
        super().__init__()
        widths = [64, 128, 256, 512]
        layers = []
        cin = 64
        for si, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                blocks.append(
                    _BasicBlock(cin if bi == 0 else w, w, 2 if si > 0 and bi == 0 else 1)
                )
                cin = w
            layers.append(nn.Sequential(*blocks))
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, 1),
            *layers,
        )

    def forward(self, x):
        x = self.features(x)
        return x.mean(dim=(2, 3))


# ---------------------------------------------------------------------------
# shared fixtures: batches + the reference training loop
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(3)
    return (0.8 * rng.standard_normal((K, NDIM))).astype(np.float32)


@pytest.fixture(scope="module")
def batches(centers):
    """N_BATCHES fixed batches in both frameworks' native forms."""
    rng = np.random.default_rng(7)
    out = []
    for _ in range(N_BATCHES):
        xdata = rng.integers(0, 256, (B, SIZE, SIZE, 3), np.uint8)
        euler = rng.uniform(-60, 60, (B, 3)).astype(np.float32)
        label = (np.arange(B) % C).astype(np.int32)
        y = np.asarray(euler_to_pose(jnp.asarray(euler), "axis_angle"))
        d2 = ((y[:, None, :] - centers[None]) ** 2).sum(-1)
        bins = np.argmin(d2, axis=-1)
        res = y - centers[bins]
        xn = (xdata.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        out.append(
            dict(
                jax={"xdata": xdata, "euler": euler, "label": label},
                x_t=torch.from_numpy(np.transpose(xn, (0, 3, 1, 2))).contiguous(),
                label_t=torch.from_numpy(label.astype(np.int64)[:, None]),
                bins_t=torch.from_numpy(bins.astype(np.int64)),
                res_t=torch.from_numpy(res.astype(np.float32)),
                y_t=torch.from_numpy(y.astype(np.float32)),
            )
        )
    return out


def run_reference_loop(model, batches, centers, geodesic_loss_cls, lr=1e-4,
                       main_balance="main", dual_stream=False):
    """The reference training protocol, verbatim semantics
    (learnGeodesicBDModel.py:96-205,240): Adam over all params, warm-up
    phase with Lc + 0.5*exp(-2s)*MSE + s and s' = 0.5*log(Lr), then s reset
    to 0 and the main phase with Lc + exp(-s)*geodesic(decoded) + s and
    s' = log(Lr); `s` always enters the loss as the PREVIOUS step's host
    float. main_balance="warmup" keeps the warm-up balance FORM in the main
    phase — learnEuclideanBDModel.py:178,183 uses 0.5*exp(-2s)*Lr with
    s' = 0.5*log(Lr) in BOTH its loops, only the Lr definition changes.
    dual_stream=True runs the reference's dual-loader forward — model(real)
    and model(render) as two separate calls with the losses on the
    torch.cat of the outputs (learnGeodesicBDModel.py:116-127), exercising
    per-stream train-mode BatchNorm statistics."""
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    gve = geodesic_loss_cls()
    centers_t = torch.from_numpy(centers)

    def forward(b):
        if not dual_stream:
            return model(b["x_t"], b["label_t"])
        n = b["x_t"].shape[0] // 2
        o_r = model(b["x_t"][:n], b["label_t"][:n])
        o_s = model(b["x_t"][n:], b["label_t"][n:])
        return [torch.cat([a, c]) for a, c in zip(o_r, o_s)]

    traj = []
    model.train()
    s = 0.0
    for i in range(N_WARMUP):
        b = batches[i % len(batches)]
        out = forward(b)
        Lc = ce(out[0], b["bins_t"])
        Lr = mse(out[1], b["res_t"])
        loss = Lc + 0.5 * math.exp(-2 * s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = 0.5 * math.log(Lr.item())
        traj.append(
            dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s)
        )
    s = 0.0  # reset between phases (learnGeodesicBDModel.py:240)
    for i in range(N_MAIN):
        b = batches[i % len(batches)]
        out = forward(b)
        _, ind = torch.max(out[0], dim=1)
        ypred = torch.index_select(centers_t, 0, ind) + out[1]
        Lc = ce(out[0], b["bins_t"])
        Lr = gve(ypred, b["y_t"])
        if main_balance == "warmup":
            loss = Lc + 0.5 * math.exp(-2 * s) * Lr + s
        else:
            loss = Lc + math.exp(-s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = (0.5 * math.log(Lr.item()) if main_balance == "warmup"
             else math.log(Lr.item()))
        traj.append(
            dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s)
        )
    return traj


def run_jax_loop(cfg, centers, batches, init_variables, dual_stream=False):
    """The same protocol through Trainer's compiled warmup/main steps."""
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=init_variables["params"],
        batch_stats=init_variables["batch_stats"],
    )
    # re-init the optimizer state from the REPLACED params: Adam moments
    # take the params' dtype (identical for f32; the x64 variant would
    # otherwise accumulate its second moments in f32)
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj = []
    step = trainer.train_step_fn("warmup", dual_stream=dual_stream)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj.append({k: float(v) for k, v in metrics.items()})
    if cfg.reset_s_between_phases:  # riemannian_bd carries s across phases
        state = state.replace(s=jnp.zeros((), jnp.float32))
    step = trainer.train_step_fn("main", dual_stream=dual_stream)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj.append({k: float(v) for k, v in metrics.items()})
    return traj, jax.device_get(state)


def assert_trajectories_match(traj_ref, traj_jax, n_strict=N_WARMUP + 2):
    """Per-step agreement with a float-accumulation growth schedule: the
    frameworks share initial weights and batches, so step 0 differs only by
    reduction order (~1e-5 relative); each Adam step then amplifies the
    divergence a few-fold (eps-dominated early second moments — the same
    growth measured between XLA mesh layouts in __graft_entry__.py). A
    semantic mismatch (wrong bias correction, un-lagged s, wrong BN mode,
    wrong loss form) shows up as an O(1) break in the first step or two.

    Steps >= n_strict (warmup + 2 main steps — past every semantic
    transition) get only a gross-break bound: the main phase's
    `centers[argmax(scores)]` decode is discontinuous, so once accumulated
    drift crosses a near-tied score margin a single bin flip steps Lr by
    O(10%) (measured at step 6 with this seed) while both loops stay
    semantically identical — chaos amplification, not a parity gap."""
    assert len(traj_ref) == len(traj_jax)
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        rtol = min(2e-3 * (2.0 ** t), 0.05) if t < n_strict else 0.35
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=rtol, atol=rtol,
                err_msg=f"step {t} metric '{k}' diverged (torch vs jax)",
            )


def _max_abs_err(tree_a, tree_b):
    leaves_a, leaves_b = jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)
    assert len(leaves_a) == len(leaves_b) and leaves_a
    return max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(leaves_a, leaves_b)
    )


def assert_final_states_match(final_state, final_ref, lr, bn_median_bound=2e-2):
    """Post-training params agree to an ABSOLUTE bound of a few Adam steps:
    each Adam update displaces a parameter by ~lr, so even after the
    argmax-decode bin flip (gradients then differ O(1) for the ~4 tail
    steps) the frameworks' params can only be ~4*2*lr apart. A wrong
    update rule (eps placement, bias correction, weight decay) breaks this
    by the full 10-step displacement. BN running stats (EMAs of forward
    batch statistics, barely touched by the tail drift) must agree tightly
    — this cross-checks the Bessel-corrected running-var update
    (models/norm.py) against torch's own."""
    assert _max_abs_err(final_state.params, final_ref["params"]) < 20 * lr
    for a, b in zip(
        jax.tree.leaves(final_state.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 0.05)
        # post-flip activation drift perturbs a FEW elements by up to ~7%
        # of scale (chaos); a biased (flax-default) running-var update
        # would shift EVERY head-bank var element systematically by
        # (1-0.9^10)*(B/(B-1)-1) ~ 6% at B=12. Median deviation separates
        # the two; the max bound catches gross breaks.
        rel = np.abs(a - b) / (np.abs(b) + 0.05 * scale)
        assert np.median(rel) < bn_median_bound, (
            f"systematic batch_stats shift: {np.median(rel)}"
        )
        assert rel.max() < 0.5, f"batch_stats gross break: {rel.max()}"


def _torch_seed_all(seed):
    torch.manual_seed(seed)


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def _make_cfg(preset):
    return get_config(
        preset,
        feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float32",
        optimizer_dtype="float32",  # bit-match torch.optim.Adam
    )


def test_geodesic_bd_dynamics_match_reference(ref_modules, centers, batches):
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(0)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("geodesic_bd")
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches, variables)
    traj_ref = run_reference_loop(
        model, batches, centers, axisAngle.geodesic_loss, lr=cfg.init_lr
    )
    assert_trajectories_match(traj_ref, traj_jax)

    # final parameters: convert the post-training torch state and compare
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(final_state, final_ref, cfg.init_lr)


def test_geodesic_bd_multires_dynamics_match_reference(
    ref_modules, centers, batches
):
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(1)
    model = binDeltaModels.OneDeltaPerBinModel(
        "none", C, K, N0, N1, N2, N3, NDIM
    )
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("geodesic_bd_multires")
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches, variables)
    traj_ref = run_reference_loop(
        model, batches, centers, axisAngle.geodesic_loss, lr=cfg.init_lr
    )
    assert_trajectories_match(traj_ref, traj_jax)

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(final_state, final_ref, cfg.init_lr)


def test_euclidean_bd_dynamics_match_reference(ref_modules, centers, batches):
    """learnEuclideanBDModel.py:104-203,238 executed head-to-head. Beyond
    the geodesic tests this certifies the script's one semantic quirk by
    measurement: its MAIN phase keeps the warm-up balance FORM — loss =
    Lc + 0.5*exp(-2s)*MSE(decoded, y) + s with s' = 0.5*log(Lr) at
    :178,183 (contrast learnGeodesicBDModel.py:189's exp(-s)/log(Lr)) —
    while s IS reset at the phase boundary (:238). The forms diverge O(1)
    in both the loss and the carried s from the first main step, so a
    form mismatch cannot hide inside the strict window."""
    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(12)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("euclidean_bd")
    assert cfg.reset_s_between_phases  # the :238 reset, unlike riemannian
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches, variables)
    traj_ref = run_reference_loop(
        model, batches, centers, nn.MSELoss, lr=cfg.init_lr,
        main_balance="warmup",
    )
    assert_trajectories_match(traj_ref, traj_jax)

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    # chaos tail is larger here than for geodesic/laplacian: MSE on the
    # DECODED pose jumps O(|c_i - c_j|^2) when an argmax bin flips (the
    # geodesic loss is angle-bounded by pi), and s = 0.5*log(Lr) amplifies
    # it — measured median BN-stat drift 0.021 vs the 0.02 default. The
    # systematic-bias signature this bound discriminates against (biased
    # running-var: ~6.5% on EVERY element at B=12) still clears 3.5e-2.
    assert_final_states_match(
        final_state, final_ref, cfg.init_lr, bn_median_bound=3.5e-2
    )


def test_laplacian_bd_dynamics_match_reference(ref_modules, centers, batches):
    """learnLaplacianBDModel.py executed head-to-head: the geodesic
    two-phase template (main balance Lc + exp(-s)*Lr + s, s' = log(Lr),
    s reset between phases) with main Lr = L1(decoded, y) — the
    reference's l1_loss on the argmax-decoded pose. torch's own nn.L1Loss
    is the main-phase criterion here, so the compiled step's l1 primitive
    (losses/primitives.py) is itself under test, gradients included
    (d|x|/dx sign conventions at zero never trigger: residuals are
    generically nonzero)."""
    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(13)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("laplacian_bd")
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches, variables)
    traj_ref = run_reference_loop(
        model, batches, centers, nn.L1Loss, lr=cfg.init_lr
    )
    assert_trajectories_match(traj_ref, traj_jax)

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(final_state, final_ref, cfg.init_lr)


# ---------------------------------------------------------------------------
# x64 strict window (round-5 ask #4): at f64 the chaos tail vanishes and the
# WHOLE trajectory must hold a ~1e-6 bound
# ---------------------------------------------------------------------------


@pytest.fixture
def x64_mode():
    # the reference forward builds its one-hot with torch.zeros
    # (binDeltaModels.py:116) — default-f32 unless the default dtype is
    # raised, which is exactly how the reference would run in double
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)
        jax.config.update("jax_enable_x64", False)


def _f64_batches(batches, centers):
    """Rebuild the batches with the ENTIRE input path in f64: the torch-side
    tensors come from the same jax functions the compiled step runs
    in-graph (normalize_images / euler_to_pose / hard_bin_targets), so
    the frameworks' inputs agree to f64 codegen noise (~1e-16) instead of
    the f32-rounding (~1e-7) that dominated a widened-f32 pipeline."""
    from multi_modal_regression_tpu.data.loader import normalize_images
    from multi_modal_regression_tpu.data.targets import hard_bin_targets

    C_f32 = jnp.asarray(centers, jnp.float32)  # the problem's stored dtype
    batches64 = []
    for b in batches:
        jb = b["jax"]
        euler64 = jb["euler"].astype(np.float64)
        xn64 = np.asarray(
            normalize_images(jnp.asarray(jb["xdata"]), dtype=jnp.float64)
        )
        y64 = np.asarray(euler_to_pose(jnp.asarray(euler64), "axis_angle"))
        bins64, res64 = hard_bin_targets(jnp.asarray(y64), C_f32)
        batches64.append(
            dict(
                jax={**jb, "euler": euler64},
                x_t=torch.from_numpy(
                    np.transpose(xn64, (0, 3, 1, 2))
                ).contiguous(),
                label_t=torch.from_numpy(jb["label"].astype(np.int64)[:, None]),
                bins_t=torch.from_numpy(np.asarray(bins64).astype(np.int64)),
                res_t=torch.from_numpy(np.asarray(res64)),
                y_t=torch.from_numpy(y64),
            )
        )
    return batches64


def test_geodesic_bd_dynamics_x64_strict(ref_modules, centers, batches, x64_mode):
    """The f32 tests justify their loose late-step tolerances with
    float-accumulation growth + argmax-decode chaos. Here both frameworks
    run in double (torch .double() model, compute_dtype='float64' under
    jax_enable_x64): the shared f32-derived inputs widen bit-identically,
    so the only remaining divergence is f64 reduction order and ulp-level
    transcendental differences — amplified through all 10 Adam steps that
    still leaves ~1e-9 relative. EVERY step must agree to 1e-6, with no
    chaos carve-out: a subtle update-rule, s-protocol, or BN-semantics
    error invisible inside f32 drift has nowhere to hide."""
    import dataclasses

    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(6)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = dataclasses.replace(_make_cfg("geodesic_bd"), compute_dtype="float64")
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert jax.tree.leaves(variables["params"])[0].dtype == np.float64

    batches64 = _f64_batches(batches, centers)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches64, variables)
    traj_ref = run_reference_loop(
        model, batches64, centers, axisAngle.geodesic_loss, lr=cfg.init_lr
    )

    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"x64 step {t} metric '{k}' diverged (torch vs jax)",
            )

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    # ~1e3x amplification of ~1e-13 step noise: far under 1e-8, while any
    # semantic error displaces params by O(lr)=1e-4 per wrong step
    assert _max_abs_err(final_state.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final_state.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() < 1e-8, "BN running stats diverged at f64"


def test_geodesic_bd_dual_stream_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """The dual-loader forward protocol head-to-head AT f64, uniform 1e-6
    on every step: every two-loader reference script calls model(real) and
    model(render) SEPARATELY and cats the outputs before the loss
    (learnGeodesicBDModel.py:116-127), so train-mode BatchNorm normalizes
    each stream by its OWN batch statistics and the running stats take two
    sequential EMA updates per step (real first). The torch side does
    exactly that with the reference's own modules; the jax side runs
    Trainer's dual_stream step (steps.make_train_step dual_stream_bn —
    what Trainer.fit compiles when a render loader is present and
    cfg.bn_per_stream is on). The single-forward variant diverges from this
    loop at step 0 (per-stream statistics change the normalization), so
    f64-tight agreement certifies the split, the EMA chain order, and the
    concat layout — with no chaos carve-out anywhere. (At f32 the same
    comparison holds warmup-tight but hits an argmax-decode bin flip by
    main step 0: half-size statistics batches make near-tied score margins
    noisier, the chaos mechanism assert_trajectories_match documents.)"""
    import dataclasses

    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(15)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = dataclasses.replace(_make_cfg("geodesic_bd"), compute_dtype="float64")
    assert cfg.bn_per_stream  # reference-exact default
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    batches64 = _f64_batches(batches, centers)
    traj_jax, final_state = run_jax_loop(
        cfg, centers, batches64, variables, dual_stream=True
    )
    traj_ref = run_reference_loop(
        model, batches64, centers, axisAngle.geodesic_loss, lr=cfg.init_lr,
        dual_stream=True,
    )
    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"dual x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final_state.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final_state.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running-stat chain diverged at f64"
        )


# ---------------------------------------------------------------------------
# evaluation protocol: the reference's OWN mySGD loop vs
# SnapshotEnsembleEvaluator (round-5 ask #3)
# ---------------------------------------------------------------------------

# cycle length 4 with 10 fine-tune steps -> snapshots at steps 1, 5, 9
# ((count % c == c/2) with 1-based count, evaluateGeodesicBDModel.py:141)
EVAL_C, N_EVAL_STEPS = 4, 10
# the reference defaults (alpha1=1e-6, alpha2=1e-8) move parameters by
# ~1e-5 over 10 steps — too little signal to detect a schedule off-by-one.
# Scaled up 100x, the triangle wave's shape is visible in the loss
# trajectory while SGD stays stable; both sides get the same values.
EVAL_A1, EVAL_A2 = 1e-4, 1e-6


class _ListLoader:
    """Duck-typed loader: a fixed list of batch dicts (the loaders' only
    contract with Trainer/evaluator is iteration + len)."""

    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __iter__(self):
        return iter([dict(d) for d in self._items])


def _torch_testing(model, batches, centers_t):
    """The reference's testing() pass (evaluateGeodesicBDModel.py:157-178):
    eval-mode forward, decode centers[argmax] + residual."""
    model.eval()
    trues, preds, labels = [], [], []
    with torch.no_grad():
        for b in batches:
            out = model(b["x_t"], b["label_t"])
            ind = torch.argmax(out[0], dim=1)
            preds.append(
                (torch.index_select(centers_t, 0, ind) + out[1]).numpy().copy()
            )
            trues.append(b["y_t"].numpy())
            labels.append(b["label_t"].numpy().ravel())
    model.train()
    return (
        np.concatenate(trues),
        np.concatenate(preds),
        np.concatenate(labels),
    )


def run_reference_eval_loop(model, batches, centers, axisAngle, helperFunctions):
    """The reference fine-tune protocol, verbatim semantics
    (evaluateGeodesicBDModel.py:92-145): their OWN mySGD optimizer
    (triangular cyclical rate, helperFunctions.py:74-120) over all params,
    main-form loss with the lagged s starting at 0, and a testing() snapshot
    whenever count % c == c/2; per-snapshot MedErr via their own
    get_error2."""
    opt = helperFunctions.mySGD(
        model.parameters(), c=EVAL_C, alpha1=EVAL_A1, alpha2=EVAL_A2
    )
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers)
    traj, snaps = [], []
    model.train()
    s = 0.0
    for i in range(N_EVAL_STEPS):
        b = batches[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        _, ind = torch.max(out[0], dim=1)
        ypred = torch.index_select(centers_t, 0, ind) + out[1]
        Lc = ce(out[0], b["bins_t"])
        Lr = gve(ypred, b["y_t"])
        loss = Lc + math.exp(-s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = math.log(Lr.item())
        traj.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s))
        if (i + 1) % EVAL_C == EVAL_C // 2:
            ytrue, ypred_np, labels = _torch_testing(model, batches, centers_t)
            snaps.append(
                dict(
                    med=float(
                        axisAngle.get_error2(ytrue, ypred_np, labels, C)
                    ),
                    ypred=ypred_np,
                )
            )
    return traj, snaps


def run_jax_eval_loop(cfg, centers, batches, init_variables):
    """The same protocol through the real SnapshotEnsembleEvaluator."""
    from multi_modal_regression_tpu.train.evaluator import (
        SnapshotEnsembleEvaluator,
    )

    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=init_variables["params"],
        batch_stats=init_variables["batch_stats"],
    )
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    ev = SnapshotEnsembleEvaluator(
        trainer, cycle_len=EVAL_C, record_history=True
    )
    train_batches = [
        batches[i % len(batches)]["jax"] for i in range(N_EVAL_STEPS)
    ]
    test_batches = [
        {**b["jax"], "valid": np.ones(B, bool)} for b in batches
    ]
    # single-loader protocol: render=None passes batches through unchanged,
    # matching the torch loop's one forward per step (the harness convention
    # set by run_reference_loop — BN batch stats over the full batch)
    ev.run(
        state,
        _ListLoader(train_batches),
        None,
        _ListLoader(test_batches),
        num_epochs=1,
    )
    return ev


def test_eval_protocol_dynamics_match_reference(ref_modules, centers, batches):
    """Round-5 ask #3: the last executing-code parity gap reachable without
    the dataset — the EVALUATION protocol run head-to-head. Certifies by
    measurement: cyclical_sgd == mySGD (triangle wave incl. the 1-based
    step offset), the fine-tune s-reset, snapshot cadence, eval-mode BN in
    the snapshot pass, and the decode+MedErr chain."""
    binDeltaModels, axisAngle, helperFunctions, _ = ref_modules
    _torch_seed_all(2)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    import dataclasses

    cfg = dataclasses.replace(
        _make_cfg("geodesic_bd"),
        eval_alpha1=EVAL_A1, eval_alpha2=EVAL_A2, max_iterations=0,
    )
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    ev = run_jax_eval_loop(cfg, centers, batches, variables)
    traj_ref, snaps_ref = run_reference_eval_loop(
        model, batches, centers, axisAngle, helperFunctions
    )

    # trajectories: SGD has no eps-dominated second moment, so divergence
    # growth is much slower than Adam's; argmax-decode bin flips remain the
    # only chaos source (same as the training tests)
    assert len(ev.history) == N_EVAL_STEPS
    assert_trajectories_match(traj_ref, ev.history, n_strict=6)

    # snapshot cadence (steps 1, 5, 9) and per-snapshot MedErr sequence.
    # Per-row comparison is flip-tolerant, like the training tests'
    # post-n_strict window: the random-init model has near-tied bin scores,
    # and once cross-framework drift crosses a tied margin one row decodes
    # to a different center (measured: exactly 1/36 rows at O(1), all
    # others < 5e-3). A semantic break (wrong schedule, wrong BN mode,
    # wrong decode) moves MANY rows, not one.
    assert len(ev.snapshots) == len(snaps_ref) == 3
    for ours, ref in zip(ev.snapshots, snaps_ref):
        row_diff = np.linalg.norm(ours.ypred - ref["ypred"], axis=-1)
        flips = int((row_diff > 0.1).sum())
        assert flips <= 2, f"{flips} rows flipped bins (chaos would be ~1)"
        assert np.median(row_diff) < 1e-3
        if flips:
            assert row_diff[row_diff <= 0.1].max() < 0.02
        # one flipped row shifts one class's 3-sample median, moving the
        # 12-class mean by up to a few degrees; flip-free snapshots must
        # agree tightly
        med_atol = 3.0 if flips else 0.1
        np.testing.assert_allclose(
            ours.med_err, ref["med"], rtol=1e-3, atol=med_atol
        )

    # the ensemble runs on the parity-checked snapshots
    med, _ = ev.ensemble()
    assert np.isfinite(med)


# ---------------------------------------------------------------------------
# probabilistic (soft-bin) protocol: KL soft bins + expected geodesic
# (round-5 ask #6 — learnProbabilisticBDModel.py executed head-to-head)
# ---------------------------------------------------------------------------

N_PROB_STEPS = 8


@pytest.fixture(scope="module")
def gmm_dictionary(centers):
    """A small full-covariance GMM over the pose space shared by both
    frameworks; the torch side computes its soft targets with sklearn's own
    predict_proba (the reference pickles an sklearn GMM and calls exactly
    that, binDeltaGenerators.py:40-52), keeping the target computation
    independent of our in-graph responsibilities."""
    from multi_modal_regression_tpu.dictionary.gmm import GMMDictionary

    rng = np.random.default_rng(21)
    K_, D = centers.shape
    A = 0.25 * rng.standard_normal((K_, D, D)).astype(np.float32)
    covs = (
        np.einsum("kij,klj->kil", A, A)
        + 0.3 * np.eye(D, dtype=np.float32)[None]
    )
    w = rng.uniform(0.5, 1.5, K_).astype(np.float32)
    w /= w.sum()
    return GMMDictionary(
        means=centers.copy(), covariances=covs, weights=w
    )


def _sklearn_predict_proba(gmm_dict, y):
    from sklearn.mixture import GaussianMixture
    from sklearn.mixture._gaussian_mixture import (
        _compute_precision_cholesky,
    )

    g = GaussianMixture(
        n_components=gmm_dict.n_components, covariance_type="full"
    )
    g.means_ = gmm_dict.means.astype(np.float64)
    g.covariances_ = gmm_dict.covariances.astype(np.float64)
    g.weights_ = gmm_dict.weights.astype(np.float64)
    g.precisions_cholesky_ = _compute_precision_cholesky(
        g.covariances_, "full"
    )
    return g.predict_proba(y.astype(np.float64)).astype(np.float32)


def run_reference_prob_loop(model, batches, soft_targets, centers, axisAngle, lr):
    """learnProbabilisticBDModel.py:96-135, verbatim semantics: Adam at
    init_lr, Lc = KLDivLoss (elementwise mean) on log-softmax scores vs GMM
    responsibilities, Lr = softmax-expected per-sample geodesic over all K
    candidate decodes, self-balance s lagged one step (no warmup phase —
    the script trains single-phase)."""
    import torch.nn.functional as F

    opt = torch.optim.Adam(model.parameters(), lr=lr)
    kl = nn.KLDivLoss()
    gve = axisAngle.geodesic_loss(reduce=False)
    centers_t = torch.from_numpy(centers)
    traj = []
    model.train()
    s = 0.0
    for i in range(N_PROB_STEPS):
        b = batches[i % len(batches)]
        soft_t = torch.from_numpy(soft_targets[i % len(batches)])
        out = model(b["x_t"], b["label_t"])
        Lc = kl(F.log_softmax(out[0], dim=1), soft_t)
        # per-cluster candidate decode, reference arg order
        # gve_loss(ydata, residual + center_j) (learnProbabilisticBDModel.py:125)
        Lr = torch.stack(
            [gve(b["y_t"], out[1] + centers_t[j]) for j in range(K)]
        )
        Lr = torch.mean(
            torch.sum(F.softmax(out[0], dim=1) * torch.t(Lr), dim=1)
        )
        loss = Lc + math.exp(-s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = math.log(Lr.item())
        traj.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s))
    return traj


def test_probabilistic_bd_dynamics_match_reference(
    ref_modules, centers, batches, gmm_dictionary
):
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(4)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("probabilistic_bd")
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    trainer = Trainer(
        cfg,
        dictionary=gmm_dictionary,
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    step = trainer.train_step_fn("main")
    traj_jax = []
    for i in range(N_PROB_STEPS):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})

    soft_targets = [
        _sklearn_predict_proba(gmm_dictionary, b["y_t"].numpy())
        for b in batches
    ]
    traj_ref = run_reference_prob_loop(
        model, batches, soft_targets, centers, axisAngle, lr=cfg.init_lr
    )
    # the expected-geodesic loss is SMOOTH in the scores (no argmax decode
    # inside the loss), so the argmax bin-flip chaos of the hard-decode
    # tests is absent; the whole trajectory holds the strict
    # float-accumulation growth schedule
    assert_trajectories_match(traj_ref, traj_jax, n_strict=N_PROB_STEPS)

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(
        jax.device_get(state), final_ref, cfg.init_lr
    )


# ---------------------------------------------------------------------------
# quaternion protocol: converted dictionary + quaternion geodesic loss
# (learnGeodesicBDModel_quaternion.py executed head-to-head)
# ---------------------------------------------------------------------------


def test_geodesic_bd_quaternion_dynamics_match_reference(
    ref_modules, centers, batches
):
    """The quaternion BD loop (learnGeodesicBDModel_quaternion.py:96-239 —
    same two-phase template as geodesic_bd incl. the :239 s reset, with the
    GBDGeneratorQ target chain: kmeans dictionary CONVERTED to quaternions,
    bins/residuals in quaternion space, binDeltaGenerators.py:60-84) and the
    reference's own quaternion.geodesic_loss (quaternion.py:149-163) in the
    main phase. Torch-side targets run the reference's own euler->R->q
    chain (helperFunctions.rotation_matrix + quaternion.get_y +
    convert_dictionary), so the in-graph euler_to_pose('quaternion') +
    convert_dictionary + hard_bin_targets path is itself under test."""
    import quaternion as ref_quaternion  # /root/reference, via ref_modules

    binDeltaModels, _, helperFunctions, _ = ref_modules
    _torch_seed_all(8)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, 4)
    model.feature_model = TorchResNet18Features()

    cfg = get_config(
        "geodesic_bd_quaternion",
        feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.ndim == 4

    Cq = ref_quaternion.convert_dictionary(centers.astype(np.float64))
    qbatches = []
    for b in batches:
        euler = b["jax"]["euler"]
        yq = np.stack(
            [ref_quaternion.get_y(helperFunctions.rotation_matrix(*e))
             for e in euler]
        )
        d2 = ((yq[:, None, :] - Cq[None]) ** 2).sum(-1)
        bins = np.argmin(d2, axis=-1)  # kmeans.predict in quat space
        res = yq - Cq[bins]
        qbatches.append(
            dict(
                jax=b["jax"],
                x_t=b["x_t"],
                label_t=b["label_t"],
                bins_t=torch.from_numpy(bins.astype(np.int64)),
                res_t=torch.from_numpy(res.astype(np.float32)),
                y_t=torch.from_numpy(yq.astype(np.float32)),
            )
        )

    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, qbatches, variables)
    traj_ref = run_reference_loop(
        model, qbatches, Cq.astype(np.float32),
        ref_quaternion.geodesic_loss, lr=cfg.init_lr,
    )
    assert_trajectories_match(traj_ref, traj_jax)

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    # BN-stat chaos runs a touch hotter here than in the axis-angle tests
    # (the quat geodesic's d(acos) diverges as |<q1,q2>| -> 1, so well-fit
    # samples amplify drift): measured median deviation 2.2-2.9e-2 across
    # seeds vs the ~5.9e-2 EVERY-element signature of a biased
    # (flax-default) running-var update — 4e-2 still separates the two.
    assert_final_states_match(
        final_state, final_ref, cfg.init_lr, bn_median_bound=4e-2
    )


# ---------------------------------------------------------------------------
# Riemannian protocol: tangent-residual warmup + SO(3) expm-composed main
# loss, and the one CARRIED (un-reset) self-balance s in the reference
# (learnRiemannianBDModel.py executed head-to-head)
# ---------------------------------------------------------------------------


def run_reference_riemannian_loop(
    model, batches, extras, rotations_dict, binDeltaLosses, lr, capture=None
):
    """learnRiemannianBDModel.py:136-233, verbatim semantics: warmup =
    CE + MSE on the TANGENT residual log(R_bin^T R) (training_init, :158),
    main = CE + geodesic(R_dict[argmax] @ expm(res), R_true) via the
    reference's OWN binDeltaLosses.RiemannianLoss (identical math to the
    script's inline riemannian_exp+geodesic_loss, binDeltaLosses.py:211-239),
    with its alpha set to the self-balance weight exp(-s) each step. The
    script's one deviation from the geodesic template: `s` is NEVER reset
    between the phases (its only assignment outside the loops is the
    module-level init at :133 — contrast learnGeodesicBDModel.py:240)."""
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    riem = binDeltaLosses.RiemannianLoss(1.0, rotations_dict)
    traj = []
    model.train()
    s = 0.0
    for i in range(N_WARMUP):
        b, e = batches[i % len(batches)], extras[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        Lc = ce(out[0], b["bins_t"])
        Lr = mse(out[1], e["res_t"])
        loss = Lc + 0.5 * math.exp(-2 * s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = 0.5 * math.log(Lr.item())
        traj.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s))
    # NO s reset here (learnRiemannianBDModel.py)
    if capture is not None:  # phase-boundary state for the isolation check
        import copy

        capture["state_dict"] = copy.deepcopy(model.state_dict())
        capture["s"] = s
    for i in range(N_MAIN):
        b, e = batches[i % len(batches)], extras[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        alpha = math.exp(-s)
        riem.alpha = alpha  # total = Lc + alpha*Lr (torch.add, :239)
        total = riem((out[0], out[1]), (b["bins_t"], e["rot_t"]))
        loss = total + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            lc_v = riem.ce(out[0], b["bins_t"]).item()
        lr_v = (total.item() - lc_v) / alpha
        s = math.log(lr_v)
        traj.append(dict(loss=loss.item(), lc=lc_v, lr=lr_v, s=s))
    return traj


def test_riemannian_bd_dynamics_match_reference(ref_modules, centers, batches):
    """Certifies by measurement, beyond the geodesic tests: the RBDGenerator
    target chain (hard bin + log(R_bin^T R) tangent residual + R matrices —
    binDeltaGenerators.py:125-139, computed here with the reference's own
    get_R/get_y vs our in-graph tangent_residual_targets), the expm-composed
    main loss (batched exp_so3 == the reference's per-sample Rodrigues loop),
    and the reference's carried-s phase transition (reset_s_between_phases
    =False): the first main step must use the warmup-final s, not 0."""
    binDeltaModels, axisAngle, _, binDeltaLosses = ref_modules
    _torch_seed_all(5)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = _make_cfg("riemannian_bd")
    assert not cfg.reset_s_between_phases

    # torch-side targets through the reference's OWN geometry code
    # (RBDGenerator.__getitem__, binDeltaGenerators.py:125-139)
    rotations_dict = np.stack(
        [axisAngle.get_R(centers[i]) for i in range(K)]
    ).astype(np.float32)
    extras = []
    for b in batches:
        y = b["y_t"].numpy()
        bins = b["bins_t"].numpy()
        R = np.stack([axisAngle.get_R(y[i]) for i in range(len(y))])
        res = np.stack(
            [axisAngle.get_y(rotations_dict[bins[i]].T @ R[i])
             for i in range(len(y))]
        )
        extras.append(
            dict(
                rot_t=torch.from_numpy(R.astype(np.float32)),
                res_t=torch.from_numpy(res.astype(np.float32)),
            )
        )

    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches, variables)
    cap = {}
    traj_ref = run_reference_riemannian_loop(
        model, batches, extras, rotations_dict, binDeltaLosses,
        lr=cfg.init_lr, capture=cap,
    )
    # full-trajectory strict window: warmup only. The main phase is MORE
    # chaotic than geodesic_bd's: besides the argmax key-rotation select,
    # the trace-angle d(acos) spikes to ~1/sqrt(2*eps) at its +/-(1-eps)
    # clamp, so warmup float drift crosses a near-tied bin margin by the
    # first main step (measured: step 4 Lr jumps 19% while Lc agrees to
    # 4e-4 — one flipped row, exactly the geodesic tests' chaos signature).
    assert_trajectories_match(traj_ref, traj_jax, n_strict=N_WARMUP)

    # ...so main-phase semantics are certified by ISOLATION instead: one
    # compiled main step from the CONVERTED torch phase-boundary state
    # (same params, same batch, same carried s) must reproduce the torch
    # loop's first main step to float-reduction noise — this is immune to
    # the drift chaos and pins the carried-s protocol, the expm-composed
    # decode, and the trace-angle loss in one measurement.
    mid = load_reference_bd_checkpoint(cap["state_dict"], cfg)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=mid["params"],
        batch_stats=mid["batch_stats"],
        s=jnp.float32(cap["s"]),
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    step = trainer.train_step_fn("main")
    _, m = step(state, trainer.shard_batch(batches[0]["jax"]))
    for k in ("loss", "lc", "lr", "s"):
        np.testing.assert_allclose(
            float(m[k]), traj_ref[N_WARMUP][k], rtol=2e-4, atol=2e-5,
            err_msg=f"first main step metric '{k}' diverged from the "
                    f"identical phase-boundary state (semantic break)",
        )

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(final_state, final_ref, cfg.init_lr)


# ---------------------------------------------------------------------------
# ObjectNet label-concat protocol: shared heads on features+one-hot, fixed
# loss weights, torch's own per-epoch LambdaLR
# (learnObjectnetBDModel.py executed head-to-head)
# ---------------------------------------------------------------------------


def test_objectnet_bd_dynamics_match_reference(ref_modules, centers, batches):
    """learnObjectnetBDModel.py:95-196 executed head-to-head with the
    compiled objectnet_bd Trainer step. Certifies by measurement, beyond
    the per-class-bank tests: the LABEL-CONCAT architecture (features +
    one-hot into SHARED bin/res heads, objectnetHelperFunctions.py:155-172,
    vs our SharedMLP after concat), the fixed-weight protocol (warmup
    Lc + Lr at :110, main Lc + 10*geodesic(decoded) at :140 — the script's
    s at :187 is written but never read), the labelconcat_bd checkpoint
    conversion, and the per-epoch LambdaLR: torch's OWN scheduler with the
    reference lambda (:87) stepped before training() (:190), so every main
    step here runs at init_lr * lambda(1) = init_lr/2 — matched on our
    side by Trainer.apply_epoch_lr(state, 0)."""
    _, axisAngle, _, _ = ref_modules
    # objectnetHelperFunctions needs more torchvision surface than the
    # shared stub carries: transforms.* at import time, models.resnet50 at
    # model construction (a placeholder with >=8 children; the feature
    # model is replaced immediately after, like every test in this file)
    tv = sys.modules["torchvision"]
    for name in ("Normalize", "Compose", "Resize", "ToTensor"):
        setattr(tv.transforms, name, lambda *a, **k: None)
    tv.models.resnet50 = lambda pretrained=True: nn.Sequential(
        *[nn.Sequential() for _ in range(9)]
    )
    import objectnetHelperFunctions as onf

    _torch_seed_all(10)
    model = onf.OneBinDeltaModel(C, dict_size=K, n0=N0, n1=N1, n2=N2, dim=NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = get_config(
        "objectnet_bd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.epoch_lr_decay == "objectnet" and not cfg.self_balance
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    # --- jax side: warmup steps, then the epoch-0 lr set, then main steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup")
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() before main
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(
        cfg.init_lr / 2.0
    )
    step = trainer.train_step_fn("main")
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})

    # --- torch side: the reference loop with torch's own LambdaLR
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda ep: (10 ** -(ep // 10)) / (1 + ep % 10)
    )
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers)
    traj_ref = []
    model.train()
    for i in range(N_WARMUP):
        b = batches[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        Lc = ce(out[0], b["bins_t"])
        Lr = mse(out[1], b["res_t"])
        loss = Lc + Lr
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(
            dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=0.0)
        )
    sched.step()  # before training() (learnObjectnetBDModel.py:190)
    assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr / 2.0)
    for i in range(N_MAIN):
        b = batches[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        ind = torch.argmax(out[0], dim=1)
        y = torch.index_select(centers_t, 0, ind) + out[1]
        Lc = ce(out[0], b["bins_t"])
        Lr = gve(y, b["y_t"])
        loss = Lc + 10 * Lr
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(
            dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=0.0)
        )

    assert_trajectories_match(traj_ref, traj_jax)
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(state, final_ref, cfg.init_lr)


class _TorchJointCatPoseV1(nn.Module):
    """The joint script's INLINE wrapper class, re-assembled verbatim around
    the reference's own OneBinDeltaModel (learnJointCatPoseModel_top1.py:
    93-127 — the class is defined inside the script, which argparses at
    import, so it cannot be imported directly): category fc on the shared
    features, hard one-hot of its argmax scattered on CPU (no gradient
    through the selection), bmm-mixed per-class bin/delta outputs."""

    def __init__(self, oracle, n0, num_classes):
        super().__init__()
        self.num_classes = oracle.num_classes
        self.num_clusters = oracle.num_clusters
        self.ndim = oracle.ndim
        self.feature_model = oracle.feature_model
        self.bin_models = oracle.bin_models
        self.res_models = oracle.res_models
        self.fc = nn.Linear(n0, num_classes)

    def forward(self, x):
        x = self.feature_model(x)
        y0 = self.fc(x)
        label = torch.argmax(y0, dim=1, keepdim=True)
        label = torch.zeros(label.size(0), self.num_classes).scatter_(
            1, label.data.cpu(), 1.0
        )
        label = label.unsqueeze(2)
        y1 = torch.stack(
            [self.bin_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)
        y2 = torch.stack(
            [self.res_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)
        y1 = torch.squeeze(torch.bmm(y1, label), 2)
        y2 = torch.squeeze(torch.bmm(y2, label), 2)
        return [y0, y1, y2]


def test_joint_cat_pose_dynamics_match_reference(ref_modules, centers, batches):
    """learnJointCatPoseModel_top1.py:93-252 executed head-to-head with the
    compiled joint_cat_pose_top1 Trainer step. Certifies by measurement,
    beyond the function-level joint tests: the top1 hard-mixing forward
    (stop-gradient one-hot == the reference's CPU scatter), the dual-stream
    protocol (category CE on REAL rows only at :176, pose CE + decoded
    geodesic on the real+render concat at :177-180 — carried here by the
    is_real row mask that Trainer._interleave ships), the fixed-weight loss
    0.1*Lc_cat + Lc_pose + alpha*Lr (:181, no self-balance), the per-epoch
    LambdaLR 1/(1+ep) stepped BEFORE each epoch (:141,247 — torch's own
    scheduler here vs Trainer.apply_epoch_lr), and the joint_bd_v1
    checkpoint conversion of the grafted category fc."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(11)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = _TorchJointCatPoseV1(oracle, N0, C)

    cfg = get_config(
        "joint_cat_pose_top1",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.epoch_lr_decay == "inv" and not cfg.self_balance
    assert cfg.num_warmup_epochs == 0 and cfg.alpha == 1.0
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    n_real = B // 2  # first half real, second half rendered
    is_real = np.arange(B) < n_real
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side: 2 main "epochs", lr set before each (factor 1/2, 1/3)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        assert float(
            state.opt_state.hyperparams["learning_rate"]
        ) == pytest.approx(cfg.init_lr / (ep + 2))
        for i in range(steps_per_epoch):
            b = dict(batches[i % len(batches)]["jax"])
            b["is_real"] = is_real
            state, metrics = step(state, trainer.shard_batch(b))
            traj_jax.append({k: float(v) for k, v in metrics.items()})

    # --- torch side: the reference loop with torch's own LambdaLR
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers)
    real_t = torch.from_numpy(is_real)
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # before training() (learnJointCatPoseModel_top1.py:247)
        assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr / (ep + 2))
        for i in range(steps_per_epoch):
            b = batches[i % len(batches)]
            out = model(b["x_t"])
            Lc_cat = ce(out[0][real_t], b["label_t"][real_t, 0])
            Lc_pose = ce(out[1], b["bins_t"])
            ind = torch.argmax(out[1], dim=1)
            y = torch.index_select(centers_t, 0, ind) + out[2]
            Lr = gve(y, b["y_t"])
            loss = 0.1 * Lc_cat + Lc_pose + Lr
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(
                    loss=loss.item(),
                    lc=0.1 * Lc_cat.item() + Lc_pose.item(),
                    lr=Lr.item(),
                    s=0.0,
                )
            )

    # strict only through the first steps: BOTH the decoded-pose argmax and
    # the top1 category mixing are discontinuous selectors, so accumulated
    # f32 drift can flip a near-tied selection well before the 6-step mark
    assert_trajectories_match(traj_ref, traj_jax, n_strict=3)
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert_final_states_match(state, final_ref, cfg.init_lr)


class _TorchJointCatPoseV1Weighted(_TorchJointCatPoseV1):
    """The weighted variant's one-line difference: pose heads mixed by the
    SOFTMAX of the category logits — differentiable, NOT detached, so
    gradients flow from the pose losses back into the category fc
    (learnJointCatPoseModel_weighted.py:108-118)."""

    def forward(self, x):
        x = self.feature_model(x)
        y0 = self.fc(x)
        label = torch.unsqueeze(torch.softmax(y0, dim=1), dim=2)
        y1 = torch.stack(
            [self.bin_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)
        y2 = torch.stack(
            [self.res_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)
        y1 = torch.squeeze(torch.bmm(y1, label), 2)
        y2 = torch.squeeze(torch.bmm(y2, label), 2)
        return [y0, y1, y2]


def test_joint_weighted_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnJointCatPoseModel_weighted.py:93-252 executed head-to-head at
    f64, uniform 1e-6 per-step bounds, through the genuine dual-loader
    two-forward protocol. Beyond the top1 test this certifies the
    DIFFERENTIABLE mixing path: the softmax of the category logits weights
    the per-class bin/delta banks with gradients flowing from the pose
    losses into the category fc (class_weights 'weighted' has no
    stop_gradient, matching the reference's un-detached softmax bmm at
    :109-117) — a wrong detach shows up as an O(1) fc-gradient break at
    step 0. Also under test: category CE on the REAL stream only (:175),
    fixed 0.1/1/alpha weights (:180), and the live per-epoch LambdaLR
    1/(1+ep) (:134-140,246)."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(20)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = _TorchJointCatPoseV1Weighted(oracle, N0, C).double()

    cfg = get_config(
        "joint_cat_pose_weighted",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.epoch_lr_decay == "inv" and not cfg.self_balance
    assert cfg.alpha == 1.0 and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n = B // 2
    is_real = np.arange(B) < n
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side: dual-stream step, lr set before each epoch
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main", dual_stream=True)
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
            state, metrics = step(state, trainer.shard_batch(b))
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop (two forwards, LambdaLR)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # before training() (learnJointCatPoseModel_weighted.py:246)
        for i in range(steps_per_epoch):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            out_bin = torch.cat([out_r[1], out_s[1]])
            out_res = torch.cat([out_r[2], out_s[2]])
            Lc_cat = ce(out_r[0], b["label_t"][:n, 0])
            Lc_pose = ce(out_bin, b["bins_t"])
            ind = torch.argmax(out_bin, dim=1)
            y = torch.index_select(centers_t, 0, ind) + out_res
            Lr = gve(y, b["y_t"])
            loss = 0.1 * Lc_cat + Lc_pose + Lr
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(
                    loss=loss.item(),
                    lc=0.1 * Lc_cat.item() + Lc_pose.item(),
                    lr=Lr.item(),
                    s=0.0,
                )
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"joint weighted x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        # 1e-7 (not the single-selector tests' 1e-8): the softmax mixing
        # makes every head bank's forward depend on ALL parameters each
        # step, so f64 reduction-order noise couples through 12 sequential
        # EMA updates — measured max ~1e-8 here vs ~1e-9 for top1/oracle
        # tests; a semantic break (wrong mode, wrong chain order) is 1e-2+
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-7, (
            "per-stream BN running stats diverged at f64"
        )


class _TorchJointCatPoseV1New(_TorchJointCatPoseV1):
    """The _top1_new wrapper's forward, verbatim semantics
    (learnJointCatPoseModel_top1_new.py:107-130): the selecting class is
    the argmax of the JOINT posterior Plc = softmax_K(bin scores) *
    softmax_C(cat logits), scattered to a detached one-hot on CPU."""

    def forward(self, x):
        x = self.feature_model(x)
        y0 = self.fc(x)
        Pc = torch.softmax(y0, dim=1)
        y1 = torch.stack(
            [self.bin_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)  # (B, K, C)
        Pl = torch.softmax(y1, dim=1)
        Plc = Pl * torch.unsqueeze(Pc, dim=1)
        ind = torch.argmax(Plc.view(x.size(0), -1), dim=1, keepdim=True)
        ic = torch.fmod(ind, self.num_classes)
        label = torch.zeros(ic.size(0), self.num_classes).scatter_(
            1, ic.data.cpu(), 1.0
        )
        label = label.unsqueeze(2)
        y1 = torch.squeeze(torch.bmm(y1, label), 2)
        y2 = torch.stack(
            [self.res_models[i](x) for i in range(self.num_classes)]
        ).permute(1, 2, 0)
        y2 = torch.squeeze(torch.bmm(y2, label), 2)
        return [y0, y1, y2]


def test_joint_top1_new_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnJointCatPoseModel_top1_new.py:107-259 executed head-to-head at
    f64, uniform 1e-6 per-step bounds, through the dual-loader two-forward
    protocol. Certifies the `joint_top1` mixing built from the round-5
    selector audit (which found this script does NOT use a straight-through
    estimator — its one-hot comes from the argmax of the JOINT posterior
    softmax(bins)*softmax(cat) and is detached by the CPU scatter). At f64
    the joint argmax is safe (frameworks' posteriors agree to ~1e-13), and
    a wrong selector source breaks Lc_pose/Lr at step 0 whenever the joint
    argmax and the plain cat argmax disagree — with a random-init fc and
    K=8 they disagree for most rows (verified in-test)."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(22)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = _TorchJointCatPoseV1New(oracle, N0, C).double()

    cfg = get_config(
        "joint_cat_pose_top1_new",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.mixing == "joint_top1" and cfg.epoch_lr_decay == "inv"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n = B // 2
    is_real = np.arange(B) < n
    n_epochs, steps_per_epoch = 2, 3

    # the selector must actually discriminate: with this seed the joint
    # argmax and the plain cat argmax disagree on some rows of batch 0
    with torch.no_grad():
        x0 = batches64[0]["x_t"]
        feats = model.feature_model(x0)
        y0 = model.fc(feats)
        y1 = torch.stack(
            [model.bin_models[i](feats) for i in range(C)]
        ).permute(1, 2, 0)
        Plc = torch.softmax(y1, dim=1) * torch.softmax(y0, dim=1).unsqueeze(1)
        ic = torch.fmod(
            torch.argmax(Plc.view(x0.size(0), -1), dim=1), C
        )
        assert (ic != torch.argmax(y0, dim=1)).any(), (
            "seed produced identical selectors; the test would not "
            "discriminate joint_top1 from top1"
        )

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main", dual_stream=True)
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
            state, metrics = step(state, trainer.shard_batch(b))
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # learnJointCatPoseModel_top1_new.py:254
        for i in range(steps_per_epoch):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            out_bin = torch.cat([out_r[1], out_s[1]])
            out_res = torch.cat([out_r[2], out_s[2]])
            Lc_cat = ce(out_r[0], b["label_t"][:n, 0])
            Lc_pose = ce(out_bin, b["bins_t"])
            ind = torch.argmax(out_bin, dim=1)
            y = torch.index_select(centers_t, 0, ind) + out_res
            Lr = gve(y, b["y_t"])
            loss = 0.1 * Lc_cat + Lc_pose + Lr
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(
                    loss=loss.item(),
                    lc=0.1 * Lc_cat.item() + Lc_pose.item(),
                    lr=Lr.item(),
                    s=0.0,
                )
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"joint top1_new x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    # 1e-7 (vs the single-selector tests' 1e-8): the joint posterior
    # couples every bin bank's softmax into the selection, so f64
    # reduction noise compounds across banks — measured 3.6e-8 here; a
    # wrong selector or update rule displaces params by O(lr)=1e-4
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-7


@pytest.mark.parametrize("mixing", ["top1", "weighted"])
def test_joint_reg_v3_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode, mixing
):
    """learnJointCatPoseModel3_{top1,weighted}.py:73-232 executed
    head-to-head at f64 with uniform 1e-6 per-step bounds — the joint
    cat+pose wrapper over the per-class REGRESSION oracle. Certified per
    variant: (1) the forward mixes RAW per-class model_3layer outputs by
    the category weights and applies pi*tanh AFTER the mixture
    (:106-116 — for softmax mixing, tanh-after-mix is NOT the mix of
    tanh'd heads, so the order is semantics, models/joint.py:279-282);
    (2) top1 = DETACHED argmax one-hot (CPU scatter) vs weighted =
    differentiable softmax with pose gradients flowing into the fc;
    (3) single main-only loss 0.1*Lc_cat(REAL rows only) + geodesic on
    the real+render concat of final poses (:155-158) with no warmup, no
    self-balance; (4) the per-epoch LambdaLR 1/(1+ep) stepped BEFORE
    each epoch (:127,221). Also certifies the joint_reg_v3 checkpoint
    conversion both ways (the forward-parity test covers f32; this runs
    the full training loop)."""
    _, axisAngle, _, _ = ref_modules
    import poseModels

    _torch_seed_all(33 if mixing == "top1" else 34)

    class _TorchJointRegV3(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, NDIM) for _ in range(C)]
            )
            self.fc = nn.Linear(N0, C)

        def forward(self, x):  # learnJointCatPoseModel3_*.py:106-116
            x = self.feature_model(x)
            y0 = self.fc(x)
            if mixing == "top1":
                label = torch.argmax(y0, dim=1, keepdim=True)
                label = torch.zeros(label.size(0), self.num_classes).scatter_(
                    1, label.data.cpu(), 1.0
                ).unsqueeze(2)
            else:
                label = torch.unsqueeze(torch.softmax(y0, dim=1), dim=2)
            y1 = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            y1 = torch.squeeze(torch.bmm(y1, label), 2)
            return [y0, float(np.pi) * torch.tanh(y1)]

    model = _TorchJointRegV3().double()

    cfg = get_config(
        f"joint_cat_pose3_{mixing}",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.mixing == mixing and not cfg.self_balance
    assert cfg.epoch_lr_decay == "inv" and cfg.num_warmup_epochs == 0
    assert cfg.alpha == 1.0 and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n = B // 2
    is_real = np.arange(B) < n
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side: 2 main "epochs", lr set before each (factor 1/2, 1/3)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main", dual_stream=True)
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        assert float(
            state.opt_state.hyperparams["learning_rate"]
        ) == pytest.approx(cfg.init_lr / (ep + 2))
        for i in range(steps_per_epoch):
            b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
            state, metrics = step(state, trainer.shard_batch(b))
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop with torch's own LambdaLR
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # before training() (learnJointCatPoseModel3_top1.py:221)
        assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr / (ep + 2))
        for i in range(steps_per_epoch):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            Lc_cat = ce(out_r[0], b["label_t"][:n].squeeze())
            y = torch.cat([out_r[1], out_s[1]])
            Lr = gve(y, b["y_t"])
            loss = 0.1 * Lc_cat + Lr
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(
                    loss=loss.item(), lc=0.1 * Lc_cat.item(),
                    lr=Lr.item(), s=0.0,
                )
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"joint v3 {mixing} x64 step {t} '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    # every per-step metric held 1e-6 above; the param bound is an ulp
    # accumulation allowance, a touch wider here than the 1e-8 of the other
    # x64 tests (measured 1.4e-8 at this seed: the mixed per-class heads
    # backprop through all C banks, ~C-fold more f64 reduction noise) —
    # still 3 orders under the ~lr displacement of a real semantic break
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-7
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_cat_given_pose_dynamics_match_reference(ref_modules, centers, batches):
    """learnCatGivenPoseModel.py:88-204 executed head-to-head: the category
    fc trained over a FROZEN bin-delta oracle. The reference freezes with
    requires_grad=False AND holds the whole net in eval mode through
    training (feature_model.eval() at :109, model.train() commented out at
    :135) — so BatchNorm runs on RUNNING stats and never updates. Certifies
    the three-way composition built for this script family: train_only
    optimizer masking x frozen_bn (eval-mode BN in the train step) x the
    per-epoch inv LambdaLR, all inside inject_hyperparams. With no argmax
    selector in the loss and no BN batch-statistics coupling, the
    trajectories must agree TIGHTLY at every step, and everything outside
    fc must come back bit-identical."""
    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(13)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = _TorchJointCatPoseV1(oracle, N0, C)

    cfg = get_config(
        "cat_given_pose",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.frozen_bn and cfg.train_only == ("fc",)
    assert cfg.epoch_lr_decay == "inv"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = trainer.shard_batch(batches[i % len(batches)]["jax"])
            state, metrics = step(state, b)
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference's freeze + eval + filtered Adam
    model.feature_model.eval()
    for p in model.feature_model.parameters():
        p.requires_grad = False
    model.bin_models.eval()
    for p in model.bin_models.parameters():
        p.requires_grad = False
    model.res_models.eval()
    for p in model.res_models.parameters():
        p.requires_grad = False
    opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, model.parameters()), lr=cfg.init_lr
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    traj_ref = []
    for ep in range(n_epochs):
        sched.step()  # before training() (learnCatGivenPoseModel.py:204)
        for i in range(steps_per_epoch):
            b = batches[i % len(batches)]
            out = model.fc(model.feature_model(b["x_t"]))
            loss = ce(out, b["label_t"][:, 0])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=loss.item(), lr=0.0, s=0.0)
            )

    # smooth loss, frozen features: every step holds the strict schedule
    assert_trajectories_match(traj_ref, traj_jax, n_strict=len(traj_ref))

    # frozen state is bit-identical; only fc moved
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    for name in ("feature_model", "bin_models", "res_models"):
        assert _max_abs_err(
            final.params[name], variables["params"][name]
        ) == 0.0, f"{name} params moved despite train_only"
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(final.batch_stats[name])[0]),
            np.asarray(jax.tree.leaves(variables["batch_stats"][name])[0]),
            err_msg=f"{name} running stats moved despite frozen_bn",
        )
        assert _max_abs_err(
            final.params[name], final_ref["params"][name]
        ) == 0.0
    assert _max_abs_err(final.params["fc"], variables["params"]["fc"]) > 0.0
    assert _max_abs_err(final.params["fc"], final_ref["params"]["fc"]) < 20 * cfg.init_lr


def test_simple_rene_dynamics_match_reference(ref_modules, centers, batches):
    """learnSimpleBDModel_rene.py:110-245 executed head-to-head: FRESH delta
    heads fine-tuned on a frozen classifier-grafted oracle. The reference's
    protocol is three-way asymmetric and this test certifies each leg by
    measurement: (1) optimizer over res_models only (:136), (2) MIXED BN
    modes — model.eval() at :133 with model.res_models.train() at :148, so
    the backbone and bin heads run on running stats while the delta heads
    use batch stats AND keep updating their running stats (bn_train_only),
    and (3) the homoscedastic sigma balance on the raw-residual MSE with the
    host-lagged sigma: loss = 1/(2 sigma^2)*Lr + 3*log(sigma),
    sigma' = sqrt(Lr/3) (:160-170) — carried on-device as s = log(sigma).
    The constructed StepLR is never stepped (:223, commented out). With no
    argmax selector in the loss and the backbone frozen in eval mode, every
    step holds the strict tolerance schedule."""
    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(14)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()

    cfg = get_config(
        "simple_bd_rene",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.train_only == ("res_models",)
    assert cfg.bn_train_only == ("res_models",)
    assert cfg.epoch_lr_decay is None and cfg.self_balance
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    n_steps = 8

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for i in range(n_steps):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference's eval + res_models.train() + sigma loop
    model.eval()
    opt = torch.optim.Adam(model.res_models.parameters(), lr=cfg.init_lr)
    mse = nn.MSELoss()
    sigma = 1.0
    traj_ref = []
    model.res_models.train()  # training() entry (learnSimpleBDModel_rene.py:148)
    for i in range(n_steps):
        b = batches[i % len(batches)]
        out = model(b["x_t"], b["label_t"])
        Lr = mse(out[1], b["res_t"])
        loss = 1 / (2 * sigma ** 2) * Lr + 3 * math.log(sigma)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sigma = math.sqrt(Lr.item() / 3)
        traj_ref.append(
            dict(
                loss=loss.item(), lc=0.0, lr=Lr.item(), s=math.log(sigma)
            )
        )

    assert_trajectories_match(traj_ref, traj_jax, n_strict=n_steps)

    # frozen modules bit-identical in BOTH collections (mixed BN at work:
    # backbone/bin running stats must NOT have moved), res_models moved
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    for name in ("feature_model", "bin_models"):
        assert _max_abs_err(
            final.params[name], variables["params"][name]
        ) == 0.0, f"{name} params moved despite train_only"
        assert _max_abs_err(
            final.batch_stats[name], variables["batch_stats"][name]
        ) == 0.0, f"{name} running stats moved despite bn_train_only"
    assert _max_abs_err(final.params["res_models"],
                        variables["params"]["res_models"]) > 0.0
    assert _max_abs_err(
        final.params["res_models"], final_ref["params"]["res_models"]
    ) < 20 * cfg.init_lr
    # the delta heads' running stats tracked torch's through all 8 updates
    assert _max_abs_err(
        final.batch_stats["res_models"], final_ref["batch_stats"]["res_models"]
    ) < 1e-4


def _make_torch_per_class_regression():
    """The reference's per-class regression model assembled from its own
    poseModels.model_3layer heads — one per class, selected by the TRUE
    label via one-hot bmm, pi*tanh after selection
    (learnGeodesicRegressionModel.py:84-107)."""
    import poseModels

    class _TorchPerClassRegression(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, NDIM) for _ in range(C)]
            )

        def forward(self, x, label):
            x = self.feature_model(x)
            x = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            onehot = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            y = torch.squeeze(torch.bmm(x, onehot.unsqueeze(2)), 2)
            return float(np.pi) * torch.tanh(y)

    return _TorchPerClassRegression()


def test_geodesic_regression_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnGeodesicRegressionModel.py:84-245 executed head-to-head with the
    compiled geodesic_regression Trainer step, AT f64 with uniform 1e-6
    per-step bounds (at f32 the tanh-saturated per-class heads amplify
    reduction-order noise past 5% by the last steps — measured 6.0% at the
    final step — so the f64 run is the discriminating one). This loop is
    the reference's most idiosyncratic combination, each leg certified:
    (1) STREAM-SUM losses — `loss = loss_real + loss_render` with each
    stream's mean computed separately (:132-138), exactly 2x the concat
    mean on equal halves (cfg.loss_stream_sum through the dual-stream
    step); (2) per-stream forwards (dual_stream_bn); (3) the live
    StepLR(1, 0.1) stepped before each main epoch (:114,234 — torch's own
    scheduler here vs apply_epoch_lr); (4) per-class model_3layer
    regression heads selected by the TRUE label with pi*tanh applied after
    selection (:96-105), pure-regression phases MSE -> geodesic with no
    self-balance."""
    _, axisAngle, _, _ = ref_modules
    _torch_seed_all(16)
    model = _make_torch_per_class_regression().double()

    cfg = get_config(
        "geodesic_regression",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.loss_stream_sum and cfg.bn_per_stream
    assert cfg.epoch_lr_decay == "step" and cfg.nonlinearity == "pi_tanh"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches = _f64_batches(batches, centers)

    # --- jax side: warmup at factor(0)=1, then StepLR -> main at 0.1x
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:234)
    assert float(
        state.opt_state.hyperparams["learning_rate"]
    ) == pytest.approx(cfg.init_lr * 0.1)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches[i % len(batches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: training_init (MSE) -> scheduler.step -> training (gve)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    mse = nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    n = B // 2
    traj_ref = []
    model.train()
    for phase, crit, n_steps in (("init", mse, N_WARMUP), ("main", gve, N_MAIN)):
        if phase == "main":
            sched.step()  # before training() (learnGeodesicRegressionModel.py:234)
            assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr * 0.1)
        for i in range(n_steps):
            b = batches[i % len(batches)]
            out_r = model(b["x_t"][:n], b["label_t"][:n])
            out_s = model(b["x_t"][n:], b["label_t"][n:])
            loss = crit(out_r, b["y_t"][:n]) + crit(out_s, b["y_t"][n:])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"regression x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_geodesic_regression_quaternion_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnGeodesicRegression_quaternion.py:75-238 executed head-to-head at
    f64 with uniform 1e-6 per-step bounds — the stream-sum regression
    template in QUATERNION space. What distinguishes it from the axis-angle
    regression certification (and is certified here): (1) the per-class
    heads are the reference's own quaternion.model_3layer whose
    normalize(tanh(fc3)) unit-quaternion projection sits INSIDE each head
    before one-hot selection (quaternion.py:101-115 — vs pi*tanh AFTER
    selection in the axis-angle script), matching nonlinearity='quat'
    through the einsum bank; (2) the main phase runs the reference's own
    quaternion.geodesic_loss — 2*acos(clamp(|<q, qhat>|, -1+eps, 1-eps))
    with ypred re-normalized inside the loss (quaternion.py:149-163) — vs
    the in-graph geodesic_quat; (3) warmup MSE on raw unit-quaternion
    targets from euler_to_pose('quaternion'); (4) stream-sum losses
    (`loss_real + loss_render`, :123,163) over per-stream forwards and the
    live StepLR(1,0.1) stepped before each main epoch (:99,224)."""
    import quaternion as ref_quaternion  # /root/reference, via ref_modules

    from multi_modal_regression_tpu.data.loader import normalize_images

    _torch_seed_all(29)
    _ = ref_modules

    class _TorchPerClassQuatRegression(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [ref_quaternion.model_3layer(N0, N1, N2) for _ in range(C)]
            )

        def forward(self, x, label):  # learnGeodesicRegression_quaternion.py:85-92
            x = self.feature_model(x)
            x = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            onehot = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            return torch.squeeze(torch.bmm(x, onehot.unsqueeze(2)), 2)

    model = _TorchPerClassQuatRegression().double()

    cfg = get_config(
        "geodesic_regression_quaternion",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.ndim == 4 and cfg.nonlinearity == "quat"
    assert cfg.loss_stream_sum and cfg.bn_per_stream
    assert cfg.epoch_lr_decay == "step"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    # f64 batches with QUATERNION targets from the same in-graph functions
    # the compiled step runs (the _f64_batches recipe; the reference's own
    # euler->R->q target chain is certified by the f32 quaternion BD test)
    qbatches = []
    for b in batches:
        jb = b["jax"]
        euler64 = jb["euler"].astype(np.float64)
        xn64 = np.asarray(
            normalize_images(jnp.asarray(jb["xdata"]), dtype=jnp.float64)
        )
        yq64 = np.asarray(
            euler_to_pose(jnp.asarray(euler64), "quaternion")
        )
        qbatches.append(
            dict(
                jax={**jb, "euler": euler64},
                x_t=torch.from_numpy(
                    np.transpose(xn64, (0, 3, 1, 2))
                ).contiguous(),
                label_t=torch.from_numpy(jb["label"].astype(np.int64)[:, None]),
                y_t=torch.from_numpy(yq64),
            )
        )

    # --- jax side: warmup -> StepLR -> main through the Trainer steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(qbatches[i % len(qbatches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:224)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(qbatches[i % len(qbatches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: training_init (MSE) -> scheduler.step -> training (gve)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    mse = nn.MSELoss()
    gve = ref_quaternion.geodesic_loss()
    n = B // 2
    traj_ref = []
    model.train()
    for phase, crit, n_steps in (("init", mse, N_WARMUP), ("main", gve, N_MAIN)):
        if phase == "main":
            sched.step()  # learnGeodesicRegression_quaternion.py:224
        for i in range(n_steps):
            b = qbatches[i % len(qbatches)]
            out_r = model(b["x_t"][:n], b["label_t"][:n])
            out_s = model(b["x_t"][n:], b["label_t"][n:])
            loss = crit(out_r, b["y_t"][:n]) + crit(out_s, b["y_t"][n:])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"quat regression x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_log_euclidean_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnLogEuclideanModel.py:103-205 executed head-to-head at f64 with
    uniform 1e-6 per-step bounds. The reference's most host-entangled hot
    loop: every step it argmaxes the CONCAT bin scores on device, ships
    them to host, and rebuilds the regression target per sample in a numpy
    double loop — `get_y(rotations_dict[pred_bin].T @ get_R(y))`, the
    tangent residual at the PREDICTED bin (:103-134). The compiled step
    computes all K per-bin residuals in-graph (per_bin_tangent_residuals)
    and gathers at the argmax — zero host syncs. Also certified: the
    single-phase protocol (no warmup loop, s never reset, :98-111), the
    simple balance form Lc + 0.5*e^(-2s)*Lr + s with s' = 0.5*log(Lr)
    (:135,140) on an output-dependent Lr, and per-stream BN forwards with
    the loss on the concat (:114-133). At f64 the argmax is safe: the
    frameworks' scores agree to ~1e-13 so a bin flip would need a tie at
    that margin."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(17)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = get_config(
        "log_euclidean_bd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.num_warmup_epochs == 0 and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n_steps = N_WARMUP + N_MAIN

    # --- jax side: ONE phase end to end (the script has a single loop)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    step = trainer.train_step_fn("main", dual_stream=True)
    traj_jax = []
    for i in range(n_steps):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim, incl. its host numpy
    # rotations_dict precompute and per-step get_residuals double loop
    rotations_dict = np.stack(
        [axisAngle.get_R(centers[k].astype(np.float64)) for k in range(K)]
    )

    def get_residuals(ydata, ydata_bin):  # learnLogEuclideanModel.py:102-107
        ydata_res = np.zeros((ydata.shape[0], 3))
        for i in range(ydata.shape[0]):
            ydata_res[i, :] = axisAngle.get_y(
                np.dot(rotations_dict[ydata_bin[i]].T, axisAngle.get_R(ydata[i]))
            )
        return ydata_res

    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    ce, mse_l = nn.CrossEntropyLoss(), nn.MSELoss()
    n = B // 2
    s = 0.0
    traj_ref = []
    model.train()
    for i in range(n_steps):
        b = batches64[i % len(batches64)]
        out_r = model(b["x_t"][:n], b["label_t"][:n])
        out_s = model(b["x_t"][n:], b["label_t"][n:])
        out_bin = torch.cat([out_r[0], out_s[0]])
        out_res = torch.cat([out_r[1], out_s[1]])
        Lc = ce(out_bin, b["bins_t"])
        bins_pred = torch.argmax(out_bin, dim=1).numpy()
        res_true = torch.from_numpy(
            get_residuals(b["y_t"].numpy(), bins_pred)
        )
        Lr = mse_l(out_res, res_true)
        loss = Lc + 0.5 * math.exp(-2 * s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = 0.5 * math.log(Lr.item())
        traj_ref.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s))

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"log_euclidean x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_elhoseiny_bd_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnElhoseinyBDModel.py:87-283 executed head-to-head at f64 with
    uniform 1e-6 per-step bounds. The multi-task single-stage baseline's
    idiosyncrasies, each certified by measurement: (1) the category CE is
    computed on the REAL stream ONLY (`ce_loss(output_real[0],
    label_real)`, :146,203) while bin/residual losses see the concat — the
    is_real row mask through masked_cross_entropy; (2) the class-agnostic
    model takes NO label: shared bin_3layer, one res_2layer per CLUSTER
    with the delta argmax-selected inside the forward (:94-109), category
    nn.Linear; (3) fixed weights Lc_cat + Lc + Lr in warmup then
    0.1*Lc_cat + Lc + 10*Lr in main (:150,206); (4) the live StepLR(1,0.1)
    stepped before each main epoch (:116,277); (5) warmup regresses the
    argmax-SELECTED delta against the TRUE-bin residual target (:147-149).
    Also certifies the elhoseiny_bd checkpoint conversion
    (load_reference_bd_checkpoint) both ways."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(18)

    class _TorchElhoseinyBD(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_clusters = K
            self.ndim = NDIM
            self.feature_model = TorchResNet18Features()
            self.bin_model = binDeltaModels.bin_3layer(N0, N1, N2, K)
            self.res_models = nn.ModuleList(
                [binDeltaModels.res_2layer(N0, N3, NDIM) for _ in range(K)]
            )
            self.category_model = nn.Linear(N0, C)

        def forward(self, x):  # learnElhoseinyBDModel.py:98-109
            x = self.feature_model(x)
            y0 = self.category_model(x)
            y1 = self.bin_model(x)
            y2 = torch.stack(
                [self.res_models[i](x) for i in range(self.num_clusters)]
            )
            y2 = y2.view(self.num_clusters, -1, self.ndim).permute(1, 2, 0)
            pose_label = torch.argmax(y1, dim=1, keepdim=True)
            pose_label = torch.zeros(
                pose_label.size(0), self.num_clusters
            ).scatter_(1, pose_label.data.cpu(), 1.0)
            y2 = torch.squeeze(torch.bmm(y2, pose_label.unsqueeze(2)), 2)
            return [y0, y1, y2]

    model = _TorchElhoseinyBD().double()

    cfg = get_config(
        "elhoseiny_bd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.alpha == 10.0 and cfg.warmup_alpha == 1.0
    assert cfg.epoch_lr_decay == "step" and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    is_real = np.arange(B) < B // 2  # _interleave layout: real half first

    # --- jax side: warmup -> StepLR -> main through the Trainer steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
        state, metrics = step(state, trainer.shard_batch(b))
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:277)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
        state, metrics = step(state, trainer.shard_batch(b))
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    ce, mse_l = nn.CrossEntropyLoss(), nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    n = B // 2
    traj_ref = []
    model.train()
    for phase, n_steps in (("init", N_WARMUP), ("main", N_MAIN)):
        if phase == "main":
            sched.step()  # learnElhoseinyBDModel.py:277
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            out_bin = torch.cat([out_r[1], out_s[1]])
            out_res = torch.cat([out_r[2], out_s[2]])
            Lc_cat = ce(out_r[0], b["label_t"][:n].squeeze())
            Lc = ce(out_bin, b["bins_t"])
            if phase == "init":
                Lr = mse_l(out_res, b["res_t"])
                loss = Lc_cat + Lc + Lr
                lc_log = Lc_cat + Lc
            else:
                ind = torch.argmax(out_bin, dim=1)
                ypred = torch.index_select(centers_t, 0, ind) + out_res
                Lr = gve(ypred, b["y_t"])
                loss = 0.1 * Lc_cat + Lc + 10 * Lr
                lc_log = 0.1 * Lc_cat + Lc
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=lc_log.item(), lr=Lr.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"elhoseiny x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_elhoseiny_regression_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnElhoseinyRegressionModel.py:74-259 executed head-to-head at f64
    with uniform 1e-6 per-step bounds — the multi-task regression baseline.
    Its semantics, each certified: (1) ONE shared model_3layer pose head
    with pi*tanh applied in the forward (:82-91 — class-agnostic, the label
    only feeds the category loss) + category nn.Linear; (2) the category CE
    is computed on the REAL stream ONLY (`ce_loss(output_real[0],
    label_real)`, :123,168) while the pose loss sees the torch.cat of both
    streams (cat-then-reduce, NOT stream-sum) over two separate forwards
    (per-stream train-BN); (3) fixed weights Lc + Lr in warmup (MSE on the
    pose) then 0.1*Lc + Lr on the geodesic in main (:124,169) with NO
    self-balance; (4) the live StepLR(1,0.1) stepped at the top of each
    main epoch (:235). Also certifies the elhoseiny_reg checkpoint
    conversion (load_reference_bd_checkpoint) both ways."""
    _, axisAngle, _, _ = ref_modules
    import poseModels

    _torch_seed_all(27)

    class _TorchElhoseinyReg(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_model = poseModels.model_3layer(N0, N1, N2, NDIM)
            self.category_model = nn.Linear(N0, C)

        def forward(self, x):  # learnElhoseinyRegressionModel.py:85-91
            x = self.feature_model(x)
            y0 = self.category_model(x)
            y1 = float(np.pi) * torch.tanh(self.pose_model(x))
            return [y0, y1]

    model = _TorchElhoseinyReg().double()

    cfg = get_config(
        "elhoseiny_regression",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.alpha == 1.0 and cfg.warmup_alpha == 1.0
    assert not cfg.self_balance and not cfg.loss_stream_sum
    assert cfg.epoch_lr_decay == "step" and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    is_real = np.arange(B) < B // 2  # _interleave layout: real half first

    # --- jax side: warmup -> StepLR -> main through the Trainer steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
        state, metrics = step(state, trainer.shard_batch(b))
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:235)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
        state, metrics = step(state, trainer.shard_batch(b))
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    ce, mse_l = nn.CrossEntropyLoss(), nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    n = B // 2
    traj_ref = []
    model.train()
    for phase, n_steps in (("init", N_WARMUP), ("main", N_MAIN)):
        if phase == "main":
            sched.step()  # learnElhoseinyRegressionModel.py:235
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            out_pose = torch.cat([out_r[1], out_s[1]])
            Lc = ce(out_r[0], b["label_t"][:n].squeeze())
            if phase == "init":  # training_init, :113-124
                Lr = mse_l(out_pose, b["y_t"])
                loss = Lc + Lr
                lc_log = Lc
            else:  # training, :158-169
                Lr = gve(out_pose, b["y_t"])
                loss = 0.1 * Lc + Lr
                lc_log = 0.1 * Lc
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=lc_log.item(), lr=Lr.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"elhoseiny reg x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_independent_bd_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnIndependentBDModel.py:88-274 executed head-to-head at f64 with
    uniform 1e-6 per-step bounds — covering the independent/rendered BD
    family (learnRenderedBDModel.py:84-104 is the same inline model and
    loop at dict_size 16). The family's semantics, each certified by
    measurement: (1) the model is fully class-agnostic — shared bin_3layer
    + one res_2layer per CLUSTER with the delta selected by a DETACHED
    argmax one-hot inside the forward (:98-108); no category head, labels
    never enter; (2) both phases cat the two streams' outputs THEN reduce
    (`ce_loss(torch.cat(...))`, :139-145,187-195 — cat-then-reduce, NOT
    the stream-sum protocol of the regression family, so the preset
    leaves loss_stream_sum off) over two separate forwards (per-stream
    train-BN statistics); (3) fixed weights with NO self-balance:
    Lc + Lr in warmup (MSE on the argmax-selected delta vs the TRUE-bin
    residual) then Lc + 10*Lr on the decoded geodesic in main (:145,195);
    (4) the live StepLR(1,0.1) stepped at the TOP of each main epoch
    (:115,255). Also certifies the independent_bd checkpoint conversion
    (load_reference_bd_checkpoint) both ways."""
    binDeltaModels, axisAngle, _, _ = ref_modules
    _torch_seed_all(23)

    class _TorchIndependentBD(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_clusters = K
            self.ndim = NDIM
            self.feature_model = TorchResNet18Features()
            self.bin_model = binDeltaModels.bin_3layer(N0, N1, N2, K)
            self.res_models = nn.ModuleList(
                [binDeltaModels.res_2layer(N0, N3, NDIM) for _ in range(K)]
            )

        def forward(self, x):  # learnIndependentBDModel.py:98-108
            x = self.feature_model(x)
            y1 = self.bin_model(x)
            y2 = torch.stack(
                [self.res_models[i](x) for i in range(self.num_clusters)]
            )
            y2 = y2.view(self.num_clusters, -1, self.ndim).permute(1, 2, 0)
            pose_label = torch.argmax(y1, dim=1, keepdim=True)
            pose_label = torch.zeros(
                pose_label.size(0), self.num_clusters
            ).scatter_(1, pose_label.data.cpu(), 1.0)
            y2 = torch.squeeze(torch.bmm(y2, pose_label.unsqueeze(2)), 2)
            return [y1, y2]

    model = _TorchIndependentBD().double()

    cfg = get_config(
        "independent_bd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.alpha == 10.0 and cfg.warmup_alpha == 1.0
    assert not cfg.self_balance and not cfg.loss_stream_sum
    assert cfg.epoch_lr_decay == "step" and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)

    # --- jax side: warmup -> StepLR -> main through the Trainer steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:255)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    ce, mse_l = nn.CrossEntropyLoss(), nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    n = B // 2
    traj_ref = []
    model.train()
    for phase, n_steps in (("init", N_WARMUP), ("main", N_MAIN)):
        if phase == "main":
            sched.step()  # learnIndependentBDModel.py:255
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n])
            out_s = model(b["x_t"][n:])
            out_bin = torch.cat([out_r[0], out_s[0]])
            out_res = torch.cat([out_r[1], out_s[1]])
            Lc = ce(out_bin, b["bins_t"])
            if phase == "init":  # training_init, :139-145
                Lr = mse_l(out_res, b["res_t"])
                loss = Lc + Lr
            else:  # training, :187-195
                ind = torch.argmax(out_bin, dim=1)
                ypred = torch.index_select(centers_t, 0, ind) + out_res
                Lr = gve(ypred, b["y_t"])
                loss = Lc + 10 * Lr
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"independent x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_independent_regression_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnIndependentRegressionModel.py:74-218 executed head-to-head at
    f64 with uniform 1e-6 per-step bounds — the class-agnostic regression
    baseline. Certified: (1) ONE shared model_3layer pose head with pi*tanh
    in the forward (:74-85); labels never enter the model OR the loss;
    (2) both phases cat the two streams' outputs THEN reduce (`mse_loss(
    torch.cat(...))`, :112-114,150-152 — cat-then-reduce, unlike the
    per-class regression family's stream-sum) over two separate forwards
    (per-stream train-BN); (3) pure-regression phases MSE -> geodesic with
    no bins and no self-balance; (4) the live StepLR(1,0.1) stepped at the
    top of each main epoch (:92,208). Also certifies the
    independent_regression checkpoint conversion both ways."""
    _, axisAngle, _, _ = ref_modules
    import poseModels

    _torch_seed_all(31)

    class _TorchIndependentReg(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_model = TorchResNet18Features()
            self.pose_model = poseModels.model_3layer(N0, N1, N2, NDIM)

        def forward(self, x):  # learnIndependentRegressionModel.py:80-85
            x = self.feature_model(x)
            return float(np.pi) * torch.tanh(self.pose_model(x))

    model = _TorchIndependentReg().double()

    cfg = get_config(
        "independent_regression",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.nonlinearity == "pi_tanh" and not cfg.loss_stream_sum
    assert cfg.epoch_lr_decay == "step" and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)

    # --- jax side: warmup -> StepLR -> main through the Trainer steps
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:208)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    mse_l = nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    n = B // 2
    traj_ref = []
    model.train()
    for phase, crit, n_steps in (
        ("init", mse_l, N_WARMUP), ("main", gve, N_MAIN)
    ):
        if phase == "main":
            sched.step()  # learnIndependentRegressionModel.py:208
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            out_pose = torch.cat(
                [model(b["x_t"][:n]), model(b["x_t"][n:])]
            )
            loss = crit(out_pose, b["y_t"])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"independent reg x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_eval_protocol_regression_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """evaluateGeodesicRegressionModel.py:84-260 head-to-head at f64: the
    evaluation protocol for the STREAM-SUM dual-loader family through the
    real SnapshotEnsembleEvaluator. The reference fine-tunes with its own
    embedded mySGD copy (:84-171 — the helperFunctions.py:62-120 optimizer
    verbatim) and sums the two streams' geodesic losses separately
    (`loss = loss_real + loss_render`, :199), snapshotting at every LR
    minimum (`count % c == c/2`, :211). Certifies the evaluator's
    dual_loss_sum wiring (cfg.loss_stream_sum through the compiled
    fine-tune step), per-stream BN in the fine-tune, the cyclical schedule,
    and the regression decode + MedErr chain — every step and every
    snapshot at 1e-6 (smooth losses, no argmax anywhere)."""
    _, axisAngle, helperFunctions, _ = ref_modules
    _torch_seed_all(19)
    model = _make_torch_per_class_regression().double()

    import dataclasses

    cfg = dataclasses.replace(
        get_config(
            "geodesic_regression",
            num_classes=C, feature_network="resnet18",
            N0=N0, N1=N1, N2=N2, image_size=SIZE,
            compute_dtype="float64", optimizer_dtype="float32",
        ),
        eval_alpha1=EVAL_A1, eval_alpha2=EVAL_A2, max_iterations=0,
    )
    assert cfg.loss_stream_sum and cfg.bn_per_stream and not cfg.frozen_bn
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    half = B // 2

    # --- jax side: the real evaluator over dual loaders of half-batches
    # (_interleave re-concats them into the torch loop's real|render layout)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    from multi_modal_regression_tpu.train.evaluator import (
        SnapshotEnsembleEvaluator,
    )

    ev = SnapshotEnsembleEvaluator(trainer, cycle_len=EVAL_C, record_history=True)
    real = [
        {k: v[:half] for k, v in batches64[i % len(batches64)]["jax"].items()}
        for i in range(N_EVAL_STEPS)
    ]
    render = [
        {k: v[half:] for k, v in batches64[i % len(batches64)]["jax"].items()}
        for i in range(N_EVAL_STEPS)
    ]
    test = [{**b["jax"], "valid": np.ones(B, bool)} for b in batches64]
    ev.run(
        state, _ListLoader(real), _ListLoader(render), _ListLoader(test),
        num_epochs=1,
    )

    # --- torch side: mySGD + stream-sum geodesic + snapshot testing()
    opt = helperFunctions.mySGD(
        model.parameters(), c=EVAL_C, alpha1=EVAL_A1, alpha2=EVAL_A2
    )
    gve = axisAngle.geodesic_loss()
    traj_ref, snaps_ref = [], []
    model.train()
    for i in range(N_EVAL_STEPS):
        b = batches64[i % len(batches64)]
        out_r = model(b["x_t"][:half], b["label_t"][:half])
        out_s = model(b["x_t"][half:], b["label_t"][half:])
        loss = gve(out_r, b["y_t"][:half]) + gve(out_s, b["y_t"][half:])
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(
            dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0)
        )
        if (i + 1) % EVAL_C == EVAL_C // 2:
            model.eval()
            trues, preds, labels = [], [], []
            with torch.no_grad():
                for tb in batches64:
                    out = model(tb["x_t"], tb["label_t"])
                    preds.append(out.numpy().copy())
                    trues.append(tb["y_t"].numpy())
                    labels.append(tb["label_t"].numpy().ravel())
            model.train()
            ypred_np = np.concatenate(preds)
            snaps_ref.append(
                dict(
                    med=float(
                        axisAngle.get_error2(
                            np.concatenate(trues), ypred_np,
                            np.concatenate(labels), C,
                        )
                    ),
                    ypred=ypred_np,
                )
            )

    assert len(ev.history) == N_EVAL_STEPS
    for t, (r, j) in enumerate(zip(traj_ref, ev.history)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"regression eval x64 step {t} metric '{k}' diverged",
            )
    assert len(ev.snapshots) == len(snaps_ref) == 3
    for ours, ref in zip(ev.snapshots, snaps_ref):
        np.testing.assert_allclose(ours.ypred, ref["ypred"], atol=1e-8)
        np.testing.assert_allclose(
            ours.med_err, ref["med"], rtol=1e-5, atol=1e-6
        )
    med, _ = ev.ensemble()
    assert np.isfinite(med)


def test_classification_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnClassificationModel.py:71-180 executed head-to-head at f64,
    uniform 1e-6 every step. Certifies the lc-side of the stream-sum
    protocol (the geodesic_regression test scales lr; here the CE is the
    whole loss: `loss = CE(real) + CE(render)` at :118 == 2x the concat
    mean through cfg.loss_stream_sum), the per-class bin_3layer heads
    selected by the TRUE label, the single-phase protocol (no warmup
    loop), and the live StepLR(1, 0.1) stepped before EVERY epoch — so
    even the first training epoch runs at 0.1x lr (:94,167)."""
    bdm, axisAngle, _, _ = ref_modules
    _torch_seed_all(21)

    class _TorchPerClassClassification(nn.Module):
        def __init__(self):  # learnClassificationModel.py:71-85
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [bdm.bin_3layer(N0, N1, N2, K) for _ in range(C)]
            )

        def forward(self, x, label):
            x = self.feature_model(x)
            x = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            onehot = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            return torch.squeeze(torch.bmm(x, onehot.unsqueeze(2)), 2)

    model = _TorchPerClassClassification().double()

    cfg = get_config(
        "classification",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.loss_stream_sum and cfg.num_warmup_epochs == 0
    assert cfg.epoch_lr_decay == "step" and cfg.bn_per_stream
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n = B // 2
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side: single-phase main, lr decayed before each epoch
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main", dual_stream=True)
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        assert float(
            state.opt_state.hyperparams["learning_rate"]
        ) == pytest.approx(cfg.init_lr * 0.1 ** (ep + 1))
        for i in range(steps_per_epoch):
            b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
            state, metrics = step(state, b)
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    ce = nn.CrossEntropyLoss()
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # before training() (learnClassificationModel.py:167)
        assert opt.param_groups[0]["lr"] == pytest.approx(
            cfg.init_lr * 0.1 ** (ep + 1)
        )
        for i in range(steps_per_epoch):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n], b["label_t"][:n])
            out_s = model(b["x_t"][n:], b["label_t"][n:])
            loss = ce(out_r, b["bins_t"][:n]) + ce(out_s, b["bins_t"][n:])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=loss.item(), lr=0.0, s=0.0)
            )

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"classification x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    for a, b in zip(
        jax.tree.leaves(final.batch_stats),
        jax.tree.leaves(final_ref["batch_stats"]),
    ):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8, (
            "per-stream BN running stats diverged at f64"
        )


def test_ablation_xbd_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode, tmp_path
):
    """ablationXBDModel.py:58-238 executed head-to-head at f64, uniform
    1e-6 every step, with the loss computed by the reference's OWN
    binDeltaLosses.SimpleRelaXedLoss / RelaXedLoss classes. Certifies the
    relaxed (RBF soft-bin) family's full loop: (1) the data-driven gamma —
    cfg gamma=None derives 1/(2*min nearest-atom d^2) exactly like their
    get_gamma(kmeans_dict) (:61, helperFunctions.py:51-58), asserted equal
    here; (2) XPBD targets soft=norm(exp(-gamma d^2)), res = y - soft@C
    (ablationFunctions.py:146-151) computed in-graph vs their host cdist;
    (3) torch nn.KLDivLoss's all-elements 'mean' reduction + the y*log(y)
    term (kl_div_mean); (4) STREAM-SUM losses (`loss_real + loss_render`,
    :117-120) through cfg.loss_stream_sum; (5) warmup
    SimpleRelaXedLoss(KL+MSE) -> main RelaXedLoss (KL + geodesic on
    centers[argmax]+delta) with the live StepLR(1,0.1) (:96,218)."""
    import pickle

    from sklearn.cluster import KMeans

    from multi_modal_regression_tpu.dictionary.common import get_gamma

    binDeltaModels, axisAngle, helperFunctions, binDeltaLosses = ref_modules
    _torch_seed_all(23)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    # gamma parity: ours (dictionary.common) vs the reference's own
    gamma = float(get_gamma(centers))
    assert gamma == pytest.approx(
        float(helperFunctions.get_gamma(centers.astype(np.float64))), rel=1e-12
    )

    cfg = get_config(
        "ablation_xbd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.gamma is None and cfg.loss_stream_sum and cfg.bn_per_stream
    assert cfg.epoch_lr_decay == "step" and not cfg.self_balance
    assert cfg.alpha == 1.0 and cfg.warmup_alpha == 1.0
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n = B // 2

    # --- jax side: warmup -> StepLR -> main through the dual-stream step
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:218)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: their loss classes over their XPBD target protocol
    kmeans_file = tmp_path / "kmeans.pkl"
    km = KMeans(n_clusters=K, n_init=1)
    km.cluster_centers_ = centers.copy()
    with open(kmeans_file, "wb") as f:
        pickle.dump(km, f)
    crit1 = binDeltaLosses.SimpleRelaXedLoss(1.0)
    crit2 = binDeltaLosses.RelaXedLoss(
        1.0, str(kmeans_file), axisAngle.geodesic_loss()
    )
    from scipy.spatial.distance import cdist

    def xpbd_targets(y):  # ablationFunctions.py:146-151, f64 host math
        soft = np.exp(-gamma * cdist(y, centers.astype(np.float64), "sqeuclidean"))
        soft = soft / soft.sum(axis=1, keepdims=True)
        return (
            torch.from_numpy(soft),
            torch.from_numpy(y - soft @ centers.astype(np.float64)),
        )

    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    traj_ref = []
    model.train()
    for phase, crit, n_steps in (
        ("init", crit1, N_WARMUP), ("main", crit2, N_MAIN)
    ):
        if phase == "main":
            sched.step()  # ablationXBDModel.py:218
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            y_np = b["y_t"].numpy()
            soft_r, res_r = xpbd_targets(y_np[:n])
            soft_s, res_s = xpbd_targets(y_np[n:])
            out_r = model(b["x_t"][:n], b["label_t"][:n])
            out_s = model(b["x_t"][n:], b["label_t"][n:])
            if phase == "init":
                loss_real = crit(out_r, [soft_r, res_r])
                loss_render = crit(out_s, [soft_s, res_s])
            else:
                loss_real = crit(out_r, (soft_r, b["y_t"][:n]))
                loss_render = crit(out_s, (soft_s, b["y_t"][n:]))
            loss = loss_real + loss_render
            opt.zero_grad()
            loss.backward()
            opt.step()
            # decompose for the metric comparison (same ops the classes
            # run; the summed class loss is asserted against lc+lr below)
            kl = nn.KLDivLoss()
            lc = (
                kl(torch.log_softmax(out_r[0], dim=1), soft_r)
                + kl(torch.log_softmax(out_s[0], dim=1), soft_s)
            ).item()
            lr_v = loss.item() - lc
            traj_ref.append(dict(loss=loss.item(), lc=lc, lr=lr_v, s=0.0))

    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"ablation_xbd x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8


def test_joint_reg_v3_conversion_and_forward_parity(ref_modules, batches):
    """The v3 wrapper (regression oracle, learnJointCatPoseModel3_top1.py:
    77-116) assembled from the reference's own poseModels.model_3layer
    heads, converted via the joint_reg_v3 path, forward-compared in eval
    mode: category logits exact, pose = pi*tanh AFTER the top1 mixing (the
    script applies the nonlinearity to the bmm-mixed head outputs, :114)."""
    import poseModels

    _torch_seed_all(12)

    class _TorchJointRegV3(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.ndim = NDIM
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, NDIM) for _ in range(C)]
            )
            self.fc = nn.Linear(N0, C)

        def forward(self, x):
            x = self.feature_model(x)
            y0 = self.fc(x)
            label = torch.argmax(y0, dim=1, keepdim=True)
            label = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            label = label.unsqueeze(2)
            y1 = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            y1 = torch.squeeze(torch.bmm(y1, label), 2)
            return [y0, float(np.pi) * torch.tanh(y1)]

    model = _TorchJointRegV3()
    model.eval()

    cfg = get_config(
        "joint_cat_pose3_top1",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float32",
    )
    assert cfg.model_kind == "joint_reg_v3" and cfg.mixing == "top1"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    from multi_modal_regression_tpu.train.presets import build_model

    jmodel = build_model(cfg)
    b = batches[0]
    with torch.no_grad():
        cat_t, pose_t = model(b["x_t"])
    xn = np.transpose(b["x_t"].numpy(), (0, 2, 3, 1))
    cat_j, pose_j = jmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(xn), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(cat_j), cat_t.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pose_j), pose_t.numpy(), rtol=2e-4, atol=2e-4
    )


def test_simple_bd_dynamics_x64_strict(ref_modules, centers, batches, x64_mode):
    """learnSimpleBDModel.py:104-151 executed head-to-head at f64, uniform
    1e-6 per-step bounds. The base simple-BD loop is the one dual-loader
    script with NO phase structure at all: a single training() form
    (CE + 0.5*exp(-2s)*MSE(residual) + s, s' = 0.5*log Lr — :126,131) runs
    for every epoch, `s` initialized once at module level (:100) and never
    reset, no decode and no scheduler (:95,184 commented out). Certifies
    the single-phase preset wiring (num_warmup_epochs=0, warmup-form main
    balance) through the genuine two-forward dual-stream protocol with
    per-stream BN statistics — including that the Trainer carries s across
    what would be epoch boundaries (steps here) without a reset."""
    import dataclasses

    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(16)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = dataclasses.replace(_make_cfg("simple_bd"), compute_dtype="float64")
    assert cfg.num_warmup_epochs == 0 and cfg.self_balance
    assert cfg.problem == "simple" and cfg.bn_per_stream
    assert cfg.epoch_lr_decay is None and not cfg.loss_stream_sum
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n_steps = 10

    # --- jax side: the single-phase main step, dual-stream
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(n_steps):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference loop verbatim (two forwards, cat, s lag)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    traj_ref = []
    model.train()
    s = 0.0
    for i in range(n_steps):
        b = batches64[i % len(batches64)]
        n = b["x_t"].shape[0] // 2
        out_r = model(b["x_t"][:n], b["label_t"][:n])
        out_s = model(b["x_t"][n:], b["label_t"][n:])
        out_bin = torch.cat([out_r[0], out_s[0]])
        out_res = torch.cat([out_r[1], out_s[1]])
        Lc = ce(out_bin, b["bins_t"])
        Lr = mse(out_res, b["res_t"])
        loss = Lc + 0.5 * math.exp(-2 * s) * Lr + s
        opt.zero_grad()
        loss.backward()
        opt.step()
        s = 0.5 * math.log(Lr.item())  # learnSimpleBDModel.py:131
        traj_ref.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=s))

    assert len(traj_ref) == len(traj_jax) == n_steps
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"simple_bd x64 step {t} metric '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    assert _max_abs_err(final.batch_stats, final_ref["batch_stats"]) < 1e-8


def test_euclidean_bd_rene_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnEuclideanBDModel_rene.py:148-196 executed head-to-head at f64,
    uniform 1e-6 per-step bounds. Same frozen-oracle protocol as the
    certified simple _rene loop (optimizer over res_models only :136,
    model.eval() + res_models.train() mixed BN :133,148, homoscedastic
    sigma balance :164-170, scheduler never stepped :223) — but the sigma
    MSE is on the DECODED pose centers[argmax(bins)] + delta (:162-166),
    not the raw residual. The bin heads are frozen in eval mode, so the
    argmax is a fixed selector and even f64-tight bounds hold with the
    discontinuity in the graph; certifies the euclidean_rene problem's
    decode path under the sigma form."""
    import dataclasses

    binDeltaModels, _, _, _ = ref_modules
    _torch_seed_all(17)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = dataclasses.replace(
        _make_cfg("euclidean_bd_rene"), compute_dtype="float64"
    )
    assert cfg.train_only == ("res_models",)
    assert cfg.bn_train_only == ("res_models",)
    assert cfg.epoch_lr_decay is None and cfg.self_balance
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)
    n_steps = 8

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for i in range(n_steps):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: eval + res_models.train() + sigma loop on decoded pose
    model.eval()
    opt = torch.optim.Adam(model.res_models.parameters(), lr=cfg.init_lr)
    mse = nn.MSELoss()
    centers_t = torch.from_numpy(centers).double()
    sigma = 1.0
    traj_ref = []
    model.res_models.train()  # training() entry (learnEuclideanBDModel_rene.py:148)
    for i in range(n_steps):
        b = batches64[i % len(batches64)]
        out = model(b["x_t"], b["label_t"])
        ind = torch.argmax(out[0], dim=1)
        decoded = torch.index_select(centers_t, 0, ind) + out[1]
        Lr = mse(decoded, b["y_t"])
        loss = 1 / (2 * sigma ** 2) * Lr + 3 * math.log(sigma)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sigma = math.sqrt(Lr.item() / 3)
        traj_ref.append(
            dict(loss=loss.item(), lc=0.0, lr=Lr.item(), s=math.log(sigma))
        )

    assert len(traj_ref) == len(traj_jax) == n_steps
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"euclidean_rene x64 step {t} metric '{k}' diverged",
            )

    # frozen modules bit-identical in BOTH collections; res_models tracked
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    for name in ("feature_model", "bin_models"):
        assert _max_abs_err(
            final.params[name], variables["params"][name]
        ) == 0.0, f"{name} params moved despite train_only"
        assert _max_abs_err(
            final.batch_stats[name], variables["batch_stats"][name]
        ) == 0.0, f"{name} running stats moved despite bn_train_only"
    assert _max_abs_err(
        final.params["res_models"], final_ref["params"]["res_models"]
    ) < 1e-8
    assert _max_abs_err(
        final.batch_stats["res_models"], final_ref["batch_stats"]["res_models"]
    ) < 1e-8


def test_categorization_dynamics_match_reference(ref_modules, centers, batches):
    """learnCategorizationModel.py:49-131 executed head-to-head: the 12-way
    object-category classifier over a FROZEN backbone. The reference
    freezes feature_model with requires_grad=False (:64-65) AND holds the
    whole net in eval mode through training (model.eval() at :66,
    model.train() commented out at :75) — BatchNorm runs on running stats
    and never updates — trains the bare fc with a filtered Adam (:68), and
    steps LambdaLR 1/(1+ep) BEFORE each epoch (:69,118). Certifies the
    categorization preset wiring (model_kind + train_only=('category_model',)
    + frozen_bn + inv decay) and the new categorization checkpoint
    conversion. Smooth CE, frozen features: strict bounds at every step."""
    _, _, _, _ = ref_modules
    _torch_seed_all(18)

    class _TorchCategorization(nn.Module):
        # learnCategorizationModel.py:51-60 (my_model: backbone + fc)
        def __init__(self):
            super().__init__()
            self.feature_model = TorchResNet18Features()
            self.fc = nn.Linear(N0, C)

        def forward(self, x):
            return self.fc(self.feature_model(x))

    model = _TorchCategorization()

    cfg = get_config(
        "categorization",
        num_classes=C, feature_network="resnet18",
        N0=N0, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.frozen_bn and cfg.train_only == ("category_model",)
    assert cfg.epoch_lr_decay == "inv" and not cfg.self_balance
    assert cfg.num_epochs == 50  # learnCategorizationModel.py:36
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = trainer.shard_batch(batches[i % len(batches)]["jax"])
            state, metrics = step(state, b)
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: freeze + eval + filtered Adam + inv LambdaLR
    model.eval()  # learnCategorizationModel.py:66 (never back to train)
    for p in model.feature_model.parameters():
        p.requires_grad = False
    opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, model.parameters()), lr=cfg.init_lr
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    traj_ref = []
    for ep in range(n_epochs):
        sched.step()  # before training() (learnCategorizationModel.py:118)
        for i in range(steps_per_epoch):
            b = batches[i % len(batches)]
            loss = ce(model(b["x_t"]), b["label_t"][:, 0])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=loss.item(), lr=0.0, s=0.0)
            )

    assert_trajectories_match(traj_ref, traj_jax, n_strict=len(traj_ref))

    # backbone bit-identical (params AND running stats); only the fc moved
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(
        final.params["feature_model"], variables["params"]["feature_model"]
    ) == 0.0
    assert _max_abs_err(
        final.batch_stats["feature_model"],
        variables["batch_stats"]["feature_model"],
    ) == 0.0
    assert _max_abs_err(
        final.params["category_model"], variables["params"]["category_model"]
    ) > 0.0
    assert _max_abs_err(
        final.params["category_model"], final_ref["params"]["category_model"]
    ) < 20 * cfg.init_lr


def test_cat_given_pose3_dynamics_match_reference(ref_modules, centers, batches):
    """learnCatGivenPoseModel3.py:69-204 executed head-to-head: the category
    fc trained over a FROZEN per-class REGRESSION oracle (the v3 analog of
    the certified cat_given_pose test). Freeze protocol identical —
    requires_grad=False + eval mode held through training (:113-118, train
    mode never set at :135) — but the frozen tree is pose_models
    (poseModels.model_3layer bank), exercising the joint_reg_v3 layout
    under train_only/frozen_bn. Strict bounds every step; everything
    outside fc must come back bit-identical."""
    _, _, _, _ = ref_modules
    import poseModels

    _torch_seed_all(19)

    class _TorchCatGivenPose3(nn.Module):
        # learnCatGivenPoseModel3.py:71-90 (RegressionModel) + :92-106
        # (CatGivenPose wrapper reusing its modules + fresh fc)
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = TorchResNet18Features()
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, NDIM) for _ in range(C)]
            )
            self.fc = nn.Linear(N0, C)

        def forward(self, x):
            return self.fc(self.feature_model(x))

    model = _TorchCatGivenPose3()

    cfg = get_config(
        "cat_given_pose3",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float32", optimizer_dtype="float32",
    )
    assert cfg.frozen_bn and cfg.train_only == ("fc",)
    assert cfg.epoch_lr_decay == "inv" and cfg.model_kind == "joint_reg_v3"
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    n_epochs, steps_per_epoch = 2, 3

    # --- jax side
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = trainer.shard_batch(batches[i % len(batches)]["jax"])
            state, metrics = step(state, b)
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference's freeze + eval + filtered Adam
    model.feature_model.eval()
    for p in model.feature_model.parameters():
        p.requires_grad = False
    model.pose_models.eval()
    for p in model.pose_models.parameters():
        p.requires_grad = False
    opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, model.parameters()), lr=cfg.init_lr
    )
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    traj_ref = []
    for ep in range(n_epochs):
        sched.step()  # before training() (learnCatGivenPoseModel3.py:197)
        for i in range(steps_per_epoch):
            b = batches[i % len(batches)]
            loss = ce(model(b["x_t"]), b["label_t"][:, 0])
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(loss=loss.item(), lc=loss.item(), lr=0.0, s=0.0)
            )

    assert_trajectories_match(traj_ref, traj_jax, n_strict=len(traj_ref))

    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    for name in ("feature_model", "pose_models"):
        assert _max_abs_err(
            final.params[name], variables["params"][name]
        ) == 0.0, f"{name} params moved despite train_only"
        assert _max_abs_err(
            final.batch_stats[name], variables["batch_stats"][name]
        ) == 0.0, f"{name} running stats moved despite frozen_bn"
    assert _max_abs_err(final.params["fc"], variables["params"]["fc"]) > 0.0
    assert _max_abs_err(
        final.params["fc"], final_ref["params"]["fc"]
    ) < 20 * cfg.init_lr


@pytest.mark.parametrize("mixing", ["top1", "weighted"])
def test_joint_v2_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode, mixing
):
    """learnJointCatPoseModel2_{top1,weighted}.py executed head-to-head at
    f64, uniform 1e-6 per-step bounds — the variant-2 joint model with a
    SEPARATE layer4 branch for the category prediction over a shared trunk.

    The published v2 class cannot run as written (N0=1024 at :60 vs the
    layer4-truncated oracle the ctor builds — see models/joint.py:168-179);
    this test runs the consistent layer3-split construction BOTH frameworks
    share: trunk = stem+stages1-3, pose branch = the oracle's layer4 +
    per-class heads, category branch = its own layer4 copy + fc, assembled
    on the torch side from the reference's own binDeltaModels blocks with
    the v2 forward verbatim (trunk -> category stage -> fc -> label mixing
    -> pose heads, learnJointCatPoseModel2_top1.py:107-138). Certifies by
    measurement: the two-branch graft (surgery.graft_oracle_into_joint
    'joint_bd_v2' split), the v2 forward under both mixings (detached
    one-hot vs differentiable softmax), the SINGLE-loader protocol (the v2
    scripts train on real data only, :73-81 — category CE over ALL rows),
    the fixed-weight loss 0.1*Lc_cat + Lc_pose + Lr (:171-178), and the
    inv LambdaLR stepped before each epoch (:142-148,245). The preset's
    published-default lr 1e-5 is pinned by
    test_preset_defaults_match_reference_argparse_defaults; here lr is
    raised to 1e-4 so ten steps carry measurable signal."""
    import copy
    import dataclasses

    binDeltaModels, axisAngle, _, _ = ref_modules
    from multi_modal_regression_tpu.models.pretrained import (
        _unwrap_reference_features,
        load_torchvision_backbone,
    )
    from multi_modal_regression_tpu.models.surgery import (
        _split_backbone,
        graft_oracle_into_joint,
    )

    _torch_seed_all(35 if mixing == "top1" else 36)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()

    class _TorchJointCatPoseV2(nn.Module):
        # learnJointCatPoseModel2_*.py:92-138 under the layer3 split: the
        # ctor reuses the oracle's modules (trunk/pose layer4/heads) and
        # adds a category layer4 + fc; here the category stage is seeded
        # as a COPY of the oracle's layer4 on both sides (the reference
        # seeds it from torchvision-pretrained layer4, :89-105 — seed
        # provenance, not forward semantics)
        def __init__(self, oracle):
            super().__init__()
            self.num_classes = C
            feats = oracle.feature_model.features
            self.trunk = feats[:7]
            self.pose_stage = feats[7]
            self.category_stage = copy.deepcopy(feats[7])
            self.bin_models = oracle.bin_models
            self.res_models = oracle.res_models
            self.fc = nn.Linear(N0, C)

        def forward(self, x):
            t = self.trunk(x)
            # category branch (:109-114)
            x0 = self.category_stage(t).mean(dim=(2, 3))
            y0 = self.fc(x0)
            if mixing == "top1":
                label = torch.argmax(y0, dim=1, keepdim=True)
                label = torch.zeros(
                    label.size(0), self.num_classes
                ).scatter_(1, label.data.cpu(), 1.0).unsqueeze(2)
            else:  # learnJointCatPoseModel2_weighted.py:115
                label = torch.unsqueeze(torch.softmax(y0, dim=1), dim=2)
            # pose branch (:116-127)
            f = self.pose_stage(t).mean(dim=(2, 3))
            y1 = torch.stack(
                [self.bin_models[i](f) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            y2 = torch.stack(
                [self.res_models[i](f) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            y1 = torch.squeeze(torch.bmm(y1, label), 2)
            y2 = torch.squeeze(torch.bmm(y2, label), 2)
            return [y0, y1, y2]

    model = _TorchJointCatPoseV2(oracle).double()

    cfg = get_config(
        f"joint_cat_pose2_{mixing}",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
        init_lr=1e-4,
    )
    assert cfg.mixing == mixing and not cfg.self_balance
    assert cfg.epoch_lr_decay == "inv" and cfg.num_warmup_epochs == 0
    assert cfg.model_kind == "joint_bd_v2" and cfg.alpha == 1.0
    batches64 = _f64_batches(batches, centers)
    is_real = np.ones(B, bool)  # single real-only loader (:73-81)
    n_epochs, steps_per_epoch = 2, 3

    # --- jax variables: convert the oracle, graft the v2 split, then drop
    # in the torch-side category stage + fc verbatim
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    ocfg = dataclasses.replace(cfg, model_kind="one_bin_delta")
    ovars = load_reference_bd_checkpoint(oracle.state_dict(), ocfg)
    state = trainer.init_state()
    jv = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    grafted = graft_oracle_into_joint(jv, ovars, "joint_bd_v2")

    def _category_stage_trees(m):
        sd = {
            f"feature_model.{k}": v
            for k, v in oracle.feature_model.state_dict().items()
        }
        for k, v in m.category_stage.state_dict().items():
            sd[f"feature_model.features.7.{k}"] = v
        bbp, bbs = load_torchvision_backbone(
            _unwrap_reference_features(sd), cfg.feature_network, "layer4"
        )
        return _split_backbone(bbp)[1], _split_backbone(bbs)[1]

    cat_p, cat_s = _category_stage_trees(model)
    grafted["params"]["category_stage"] = cat_p
    grafted["batch_stats"]["category_stage"] = cat_s
    grafted["params"]["fc"] = {
        "fc1": {
            "kernel": model.fc.weight.detach().numpy().T.copy(),
            "bias": model.fc.bias.detach().numpy().copy(),
        }
    }
    state = state.replace(
        params=grafted["params"], batch_stats=grafted["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))

    traj_jax = []
    step = trainer.train_step_fn("main")
    for ep in range(n_epochs):
        state = trainer.apply_epoch_lr(state, ep)
        for i in range(steps_per_epoch):
            b = {**batches64[i % len(batches64)]["jax"], "is_real": is_real}
            state, metrics = step(state, trainer.shard_batch(b))
            traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the v2 loop verbatim (single loader, all rows real)
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda ep: 1.0 / (1.0 + ep))
    ce = nn.CrossEntropyLoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    traj_ref = []
    model.train()
    for ep in range(n_epochs):
        sched.step()  # before training() (learnJointCatPoseModel2_top1.py:245)
        for i in range(steps_per_epoch):
            b = batches64[i % len(batches64)]
            out = model(b["x_t"])
            Lc_cat = ce(out[0], b["label_t"][:, 0])
            Lc_pose = ce(out[1], b["bins_t"])
            ind = torch.argmax(out[1], dim=1)
            y = torch.index_select(centers_t, 0, ind) + out[2]
            Lr = gve(y, b["y_t"])
            loss = 0.1 * Lc_cat + Lc_pose + Lr  # :178
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_ref.append(
                dict(
                    loss=loss.item(),
                    lc=0.1 * Lc_cat.item() + Lc_pose.item(),
                    lr=Lr.item(),
                    s=0.0,
                )
            )

    assert len(traj_ref) == len(traj_jax) == n_epochs * steps_per_epoch
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"joint v2 {mixing} x64 step {t} '{k}' diverged",
            )

    # final params: convert the trained torch state back piecewise — the
    # oracle modules are SHARED with the mirror, so the oracle conversion
    # carries the trained trunk + pose stage + heads
    ovars_final = load_reference_bd_checkpoint(oracle.state_dict(), ocfg)
    trunk_p, pose_p = _split_backbone(ovars_final["params"]["feature_model"])
    trunk_s, pose_s = _split_backbone(
        ovars_final["batch_stats"]["feature_model"]
    )
    cat_p, cat_s = _category_stage_trees(model)
    final_ref_params = {
        "feature_trunk": trunk_p, "pose_stage": pose_p,
        "category_stage": cat_p,
        "bin_models": ovars_final["params"]["bin_models"],
        "res_models": ovars_final["params"]["res_models"],
        "fc": {
            "fc1": {
                "kernel": model.fc.weight.detach().numpy().T.copy(),
                "bias": model.fc.bias.detach().numpy().copy(),
            }
        },
    }
    final_ref_stats = {
        "feature_trunk": trunk_s, "pose_stage": pose_s,
        "category_stage": cat_s,
        "bin_models": ovars_final["batch_stats"]["bin_models"],
        "res_models": ovars_final["batch_stats"]["res_models"],
    }
    assert _max_abs_err(final.params, final_ref_params) < 1e-7
    assert _max_abs_err(final.batch_stats, final_ref_stats) < 1e-8


# ---------------------------------------------------------------------------
# The remaining ObjectNet scripts at x64: the analytic-quaternion-dictionary
# loop (learnObjectnetModel.py), the label-concat pi*tanh regression
# (learnObjectnetRegressionModel.py), and the single-phase label-concat
# classifier (learnObjectnetClassificationModel.py) — completing the
# executing-loop certification matrix over every runnable learn* family
# ---------------------------------------------------------------------------


def _objectnet_helpers():
    """Import the reference's objectnetHelperFunctions under the shared
    torchvision stub (it needs transforms.* at import time and
    models.resnet50 at model construction; the feature model is replaced
    right after construction, like every test in this file)."""
    tv = sys.modules["torchvision"]
    for name in ("Normalize", "Compose", "Resize", "ToTensor"):
        setattr(tv.transforms, name, lambda *a, **k: None)
    tv.models.resnet50 = lambda pretrained=True: nn.Sequential(
        *[nn.Sequential() for _ in range(9)]
    )
    import objectnetHelperFunctions as onf

    return onf


def test_objectnet_quat_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnObjectnetModel.py:60-240 executed head-to-head at f64, uniform
    1e-6 EVERY step: the fixed analytic 16-atom quaternion dictionary
    (:60-66), bin = argmax|<atom, q>| with residuals in R^4 (:108-112),
    the label-concat OneBinDeltaModel, warmup Lc + MSE (:158-160), main
    Lc + 10*quaternion-geodesic on the decoded pose (:183-186), and
    torch's OWN objectnet LambdaLR stepped before each main epoch (:134,
    :238). NOTE the published script is internally inconsistent as-is:
    `OneBinDeltaModel(num_classes)` takes the ctor defaults dict_size=200,
    dim=3 (objectnetHelperFunctions.py:156) while its own targets are
    16-bin / 4-dim quaternions, so the warmup MSE crashes on a (B,3) vs
    (B,4) shape mismatch. The runnable construction — dict_size=16, dim=4,
    exactly what the `objectnet_quat` preset pins — is certified here."""
    _ = ref_modules
    import quaternion as ref_quaternion  # /root/reference, via ref_modules

    from multi_modal_regression_tpu.data.loader import normalize_images
    from multi_modal_regression_tpu.train.problems import (
        objectnet_quaternion_dictionary,
    )

    onf = _objectnet_helpers()
    _torch_seed_all(30)
    model = onf.OneBinDeltaModel(C, dict_size=16, n0=N0, n1=N1, n2=N2, dim=4)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = get_config(
        "objectnet_quat",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.dict_size == 16 and cfg.ndim == 4 and cfg.alpha == 10.0
    assert cfg.epoch_lr_decay == "objectnet" and not cfg.self_balance
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert jax.tree.leaves(variables["params"])[0].dtype == np.float64

    # f64 batches with the quaternion target chain computed by the SAME
    # jax functions the compiled step runs in-graph (the f32-stored atoms
    # widen bit-identically on both sides)
    Cq32 = np.asarray(objectnet_quaternion_dictionary())
    Cq = Cq32.astype(np.float64)
    qbatches = []
    for b in batches:
        jb = b["jax"]
        euler64 = jb["euler"].astype(np.float64)
        xn64 = np.asarray(
            normalize_images(jnp.asarray(jb["xdata"]), dtype=jnp.float64)
        )
        y64 = np.asarray(euler_to_pose(jnp.asarray(euler64), "quaternion"))
        bins = np.asarray(
            jnp.argmax(jnp.abs(jnp.asarray(y64) @ jnp.asarray(Cq32).T), -1)
        )
        qbatches.append(
            dict(
                jax={**jb, "euler": euler64},
                x_t=torch.from_numpy(
                    np.transpose(xn64, (0, 3, 1, 2))
                ).contiguous(),
                label_t=torch.from_numpy(jb["label"].astype(np.int64)[:, None]),
                bins_t=torch.from_numpy(bins.astype(np.int64)),
                res_t=torch.from_numpy(y64 - Cq[bins]),
                y_t=torch.from_numpy(y64),
            )
        )

    # --- jax side: warmup, the epoch-0 LambdaLR set, then main
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=Cq32),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup")
    for i in range(N_WARMUP):
        b = trainer.shard_batch(qbatches[i % len(qbatches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() at :238
    step = trainer.train_step_fn("main")
    for i in range(N_MAIN):
        b = trainer.shard_batch(qbatches[i % len(qbatches)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final_state = jax.device_get(state)

    # --- torch side: the reference loop with torch's own LambdaLR
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda ep: (10 ** -(ep // 10)) / (1 + ep % 10)
    )
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    gve = ref_quaternion.geodesic_loss()
    centers_t = torch.from_numpy(Cq)
    traj_ref = []
    model.train()
    for i in range(N_WARMUP):
        b = qbatches[i % len(qbatches)]
        out = model(b["x_t"], b["label_t"])
        Lc = ce(out[0], b["bins_t"])
        Lr = mse(out[1], b["res_t"])
        loss = Lc + Lr  # learnObjectnetModel.py:160
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=0.0))
    sched.step()  # before training() (learnObjectnetModel.py:238)
    assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr / 2.0)
    for i in range(N_MAIN):
        b = qbatches[i % len(qbatches)]
        out = model(b["x_t"], b["label_t"])
        ind = torch.argmax(out[0], dim=1)
        y = torch.index_select(centers_t, 0, ind) + out[1]
        Lc = ce(out[0], b["bins_t"])
        Lr = gve(y, b["y_t"])
        loss = Lc + 10 * Lr  # learnObjectnetModel.py:186
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(dict(loss=loss.item(), lc=Lc.item(), lr=Lr.item(), s=0.0))

    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"objectnet_quat x64 step {t} '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final_state.params, final_ref["params"]) < 1e-8
    assert _max_abs_err(final_state.batch_stats, final_ref["batch_stats"]) < 1e-8


def test_objectnet_regression_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnObjectnetRegressionModel.py:68-127 executed head-to-head at
    f64, uniform 1e-6 EVERY step: the label-concat RegressionModel
    (objectnetHelperFunctions.py:201-215 — shared res_3layer on
    features ⊕ one-hot, pi*tanh output at :214), warmup MSE on the
    axis-angle target (:92), main geodesic loss DIRECTLY on the output
    (:117, no bin/delta decode), and — the discriminating scheduler
    detail — NO per-epoch LR decay: the script's scheduler.step() is
    commented out (:164), so every step runs at init_lr."""
    _, axisAngle, _, _ = ref_modules
    onf = _objectnet_helpers()
    _torch_seed_all(31)
    model = onf.RegressionModel(C, n0=N0, n1=N1, n2=N2, dim=NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = get_config(
        "objectnet_regression",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.epoch_lr_decay is None  # scheduler.step() commented out
    assert cfg.alpha == 1.0 and not cfg.self_balance
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    batches64 = _f64_batches(batches, centers)
    traj_jax, final_state = run_jax_loop(cfg, centers, batches64, variables)

    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    mse = nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    traj_ref = []
    model.train()
    for i in range(N_WARMUP):
        b = batches64[i % len(batches64)]
        out = model(b["x_t"], b["label_t"])
        loss = mse(out, b["y_t"])  # learnObjectnetRegressionModel.py:92
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0))
    for i in range(N_MAIN):
        b = batches64[i % len(batches64)]
        out = model(b["x_t"], b["label_t"])
        loss = gve(out, b["y_t"])  # learnObjectnetRegressionModel.py:117
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(dict(loss=loss.item(), lc=0.0, lr=loss.item(), s=0.0))

    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"objectnet_regression x64 step {t} '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final_state.params, final_ref["params"]) < 1e-8
    assert _max_abs_err(final_state.batch_stats, final_ref["batch_stats"]) < 1e-8


def test_objectnet_classification_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode
):
    """learnObjectnetClassificationModel.py:77-146 executed head-to-head at
    f64, uniform 1e-6 EVERY step: the label-concat ClassificationModel
    (objectnetHelperFunctions.py:218-231 — shared bin_3layer on
    features ⊕ one-hot), a SINGLE-phase loop (no training_init — the
    preset pins num_warmup_epochs=0) of pure cross-entropy on the kmeans
    bin (:101), and no per-epoch LR decay (scheduler.step() commented out
    at :144). All 10 steps here run the main-phase step function."""
    _ = ref_modules
    onf = _objectnet_helpers()
    _torch_seed_all(32)
    model = onf.ClassificationModel(C, dict_size=K, n0=N0, n1=N1, n2=N2)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = get_config(
        "objectnet_classification",
        num_classes=C, dict_size=K, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.num_warmup_epochs == 0 and cfg.epoch_lr_decay is None
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)

    batches64 = _f64_batches(batches, centers)
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("main")  # single-phase script
    for i in range(N_WARMUP + N_MAIN):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final_state = jax.device_get(state)

    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    ce = nn.CrossEntropyLoss()
    traj_ref = []
    model.train()
    for i in range(N_WARMUP + N_MAIN):
        b = batches64[i % len(batches64)]
        out = model(b["x_t"], b["label_t"])
        loss = ce(out, b["bins_t"])  # learnObjectnetClassificationModel.py:101
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj_ref.append(dict(loss=loss.item(), lc=loss.item(), lr=0.0, s=0.0))

    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"objectnet_classification x64 step {t} '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final_state.params, final_ref["params"]) < 1e-8
    assert _max_abs_err(final_state.batch_stats, final_ref["batch_stats"]) < 1e-8


# ---------------------------------------------------------------------------
# ablationGeodesicBDModel.py at x64 — the reference's OWN SimpleLoss /
# GeodesicLoss criterion classes (binDeltaLosses.py:16-50) driving the
# backward, composed with the ablation family's loop shape: fixed alpha,
# per-stream loss SUM, live StepLR
# ---------------------------------------------------------------------------


def test_ablation_geodesic_bd_dynamics_x64_strict(
    ref_modules, centers, batches, x64_mode, tmp_path
):
    """ablationGeodesicBDModel.py:67-221 executed head-to-head at f64 with
    uniform 1e-6 per-step bounds. Unlike the learn* geodesic tests (which
    assemble the losses inline the way learnGeodesicBDModel.py does), the
    torch backward here runs through the reference's OWN criterion
    classes — SimpleLoss (Lc + alpha*MSE via the deprecated three-arg
    torch.add, binDeltaLosses.py:16-28) in training_init and GeodesicLoss
    (argmax decode against its pickled f32 dictionary + geodesic,
    binDeltaLosses.py:31-50) in training — combined with the ablation
    loop shape: NO self-balance (fixed alpha=1.0, ablationGeodesicBDModel
    .py:45,67-68), per-stream loss SUM (`loss_real + loss_render`, :121,
    :159), and StepLR(1, 0.1) stepped before each main epoch (:95,217)."""
    import pickle

    binDeltaModels, axisAngle, _, binDeltaLosses = ref_modules
    _torch_seed_all(33)
    model = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    model.feature_model = TorchResNet18Features()
    model = model.double()

    cfg = get_config(
        "ablation_geodesic_bd",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, dict_size=K, image_size=SIZE,
        compute_dtype="float64", optimizer_dtype="float32",
    )
    assert cfg.loss_stream_sum and cfg.bn_per_stream and not cfg.self_balance
    assert cfg.epoch_lr_decay == "step" and cfg.alpha == 1.0
    variables = load_reference_bd_checkpoint(model.state_dict(), cfg)
    batches64 = _f64_batches(batches, centers)

    # --- jax side: warmup at factor(0)=1, then StepLR -> main at 0.1x
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    state = state.replace(opt_state=trainer.tx.init(state.params))
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    traj_jax = []
    step = trainer.train_step_fn("warmup", dual_stream=True)
    for i in range(N_WARMUP):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    state = trainer.apply_epoch_lr(state, 0)  # scheduler.step() (:217)
    step = trainer.train_step_fn("main", dual_stream=True)
    for i in range(N_MAIN):
        b = trainer.shard_batch(batches64[i % len(batches64)]["jax"])
        state, metrics = step(state, b)
        traj_jax.append({k: float(v) for k, v in metrics.items()})
    final = jax.device_get(state)

    # --- torch side: the reference's own criterion classes. GeodesicLoss
    # pickles-in the kmeans dictionary and hard-casts it .float()
    # (binDeltaLosses.py:37) — the same f32-stored centers the jax problem
    # widens under x64, so the decode arithmetic matches bit-for-bit.
    kmeans_file = tmp_path / "kmeans.pkl"
    kmeans_file.write_bytes(
        pickle.dumps(types.SimpleNamespace(cluster_centers_=centers))
    )
    crit1 = binDeltaLosses.SimpleLoss(cfg.alpha)
    crit2 = binDeltaLosses.GeodesicLoss(
        cfg.alpha, str(kmeans_file), axisAngle.geodesic_loss()
    )
    opt = torch.optim.Adam(model.parameters(), lr=cfg.init_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    ce = nn.CrossEntropyLoss()
    mse = nn.MSELoss()
    gve = axisAngle.geodesic_loss()
    centers_t = torch.from_numpy(centers.astype(np.float64))
    n = B // 2
    traj_ref = []
    model.train()
    for phase, n_steps in (("init", N_WARMUP), ("main", N_MAIN)):
        if phase == "main":
            sched.step()  # before training() (ablationGeodesicBDModel.py:217)
            assert opt.param_groups[0]["lr"] == pytest.approx(cfg.init_lr * 0.1)
        for i in range(n_steps):
            b = batches64[i % len(batches64)]
            out_r = model(b["x_t"][:n], b["label_t"][:n])
            out_s = model(b["x_t"][n:], b["label_t"][n:])
            if phase == "init":
                loss_real = crit1(out_r, [b["bins_t"][:n], b["res_t"][:n]])
                loss_render = crit1(out_s, [b["bins_t"][n:], b["res_t"][n:]])
            else:
                loss_real = crit2(out_r, [b["bins_t"][:n], b["y_t"][:n]])
                loss_render = crit2(out_s, [b["bins_t"][n:], b["y_t"][n:]])
            loss = loss_real + loss_render  # :121 / :159
            opt.zero_grad()
            loss.backward()
            opt.step()
            # metrics recomputed per component (the criterion classes only
            # expose the combined scalar)
            with torch.no_grad():
                lc = (ce(out_r[0], b["bins_t"][:n])
                      + ce(out_s[0], b["bins_t"][n:])).item()
                if phase == "init":
                    lr_m = (mse(out_r[1], b["res_t"][:n])
                            + mse(out_s[1], b["res_t"][n:])).item()
                else:
                    y_r = centers_t[torch.argmax(out_r[0], 1)] + out_r[1]
                    y_s = centers_t[torch.argmax(out_s[0], 1)] + out_s[1]
                    lr_m = (gve(y_r, b["y_t"][:n])
                            + gve(y_s, b["y_t"][n:])).item()
            traj_ref.append(dict(loss=loss.item(), lc=lc, lr=lr_m, s=0.0))

    assert len(traj_ref) == len(traj_jax) == N_WARMUP + N_MAIN
    for t, (r, j) in enumerate(zip(traj_ref, traj_jax)):
        for k in ("loss", "lc", "lr", "s"):
            np.testing.assert_allclose(
                j[k], r[k], rtol=1e-6, atol=1e-9,
                err_msg=f"ablation_geodesic_bd x64 step {t} '{k}' diverged",
            )
    final_ref = load_reference_bd_checkpoint(model.state_dict(), cfg)
    assert _max_abs_err(final.params, final_ref["params"]) < 1e-8
    assert _max_abs_err(final.batch_stats, final_ref["batch_stats"]) < 1e-8
