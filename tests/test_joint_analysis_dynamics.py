"""Executing-protocol parity for the joint ANALYSIS path: the reference's
evaluateJointModel.py wrapper + testing() loop run verbatim vs
`train.analysis.run_joint_analysis`.

evaluateJointModel.py / evaluateJointModel2.py are pure inference dumps
with a forward NO training script uses: one decoded pose PER (sample,
class) — `cluster_centers[argmax(bin_i)] + res_i` for every class head i
(:82-104; the multires branch selects each class's delta at that class's
OWN bin argmax, :89-98) — plus the category argmax, collected into
{ytrue_cat, ytrue_pose, ypred_cat, ypred_pose} (:112-134) and saved as
`<name>_results` structs for up to four checkpoints (:137-161). Here that
wrapper is re-assembled verbatim around the reference's own
binDeltaModels oracles (the script argparses at import, so its inline
class cannot be imported) and run head-to-head at f64 (the x64 dynamics
convention) against the in-graph per-class decode of
`JointCatPoseBDModel.analysis` over the padded test stream.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
from torch import nn

from multi_modal_regression_tpu.data.loader import normalize_images
from multi_modal_regression_tpu.data.targets import euler_to_pose
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models.pretrained import (
    load_reference_bd_checkpoint,
)
from multi_modal_regression_tpu.parallel.mesh import make_mesh
from multi_modal_regression_tpu.train import get_config
from multi_modal_regression_tpu.train.analysis import (
    parse_analysis_runs,
    run_joint_analysis,
    save_analysis_mat,
)
from multi_modal_regression_tpu.train.trainer import Trainer

from test_torch_dynamics import TorchResNet18Features, ref_modules  # noqa: F401

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

C, K, NDIM = 12, 8, 3
N0, N1, N2, N3 = 512, 32, 16, 12
SIZE, B, N_BATCHES = 32, 10, 3


@pytest.fixture
def x64_mode():
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)
        jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(9)
    return (0.8 * rng.standard_normal((K, NDIM))).astype(np.float32)


@pytest.fixture
def batches(x64_mode):
    """Shared f64 inputs, the x64-harness convention: both frameworks read
    the SAME f64 pixels/poses (the pixel and target paths have their own
    executing-parity tests). Depends on x64_mode: built earlier, the f64
    requests would silently truncate to f32."""
    rng = np.random.default_rng(17)
    out = []
    for _ in range(N_BATCHES):
        xdata = rng.integers(0, 256, (B, SIZE, SIZE, 3), np.uint8)
        euler = rng.uniform(-60, 60, (B, 3)).astype(np.float64)
        label = (np.arange(B) % C).astype(np.int32)
        xn64 = np.asarray(
            normalize_images(jnp.asarray(xdata), dtype=jnp.float64)
        )
        y64 = np.asarray(euler_to_pose(jnp.asarray(euler), "axis_angle"))
        out.append(
            dict(
                jax={
                    "xdata": xdata, "euler": euler, "label": label,
                    "valid": np.ones(B, bool),
                },
                x_t=torch.from_numpy(
                    np.transpose(xn64, (0, 3, 1, 2))
                ).contiguous(),
                label_np=label,
                y_np=y64,
            )
        )
    return out


# ---------------------------------------------------------------------------
# the script's wrapper + testing(), assembled verbatim
# ---------------------------------------------------------------------------


def make_torch_analysis_model(oracle, centers, multires):
    """evaluateJointModel.py:69-104 verbatim around the reference's own
    oracle (fc on shared features, per-class argmax decode against the
    module-level cluster_centers_ tensor at :46)."""
    cluster_centers_ = torch.from_numpy(centers).float()

    class JointCatPoseModel(nn.Module):
        def __init__(self, oracle_model):
            super().__init__()
            self.num_classes = oracle_model.num_classes
            self.num_clusters = oracle_model.num_clusters
            self.ndim = oracle_model.ndim
            self.feature_model = oracle_model.feature_model
            self.bin_models = oracle_model.bin_models
            self.res_models = oracle_model.res_models
            self.fc = nn.Linear(N0, C)

        def forward(self, x):
            x = self.feature_model(x)
            y0 = self.fc(x)
            ypred = []
            for i in range(self.num_classes):
                ybin = self.bin_models[i](x)
                ind = torch.argmax(ybin, dim=1)
                if not multires:
                    yres = self.res_models[i](x)
                else:
                    pose_label = torch.zeros(
                        ind.size(0), self.num_clusters
                    ).scatter_(1, ind.unsqueeze(1).data.cpu(), 1.0)
                    pose_label = pose_label.unsqueeze(2)
                    yres = []
                    for j in range(self.num_clusters):
                        yres.append(
                            self.res_models[i * self.num_clusters + j](x)
                        )
                    yres = torch.stack(yres).permute(1, 2, 0)
                    yres = torch.squeeze(torch.bmm(yres, pose_label), 2)
                y = cluster_centers_.index_select(0, ind) + yres
                ypred.append(y)
            y1 = torch.stack(ypred).permute(1, 2, 0)
            return [y0, y1]  # cat, pose

    return JointCatPoseModel(oracle)


def reference_analysis_testing(model, batches):
    """testing() verbatim (evaluateJointModel.py:112-134) over the shared
    batches, plus the min top-2 category-logit margin (argmax-agreement
    guard)."""
    model.eval()
    ytrue_cat, ytrue_pose = [], []
    ypred_cat, ypred_pose = [], []
    min_margin = np.inf
    for b in batches:
        with torch.no_grad():
            output = model(b["x_t"])
        output_cat = output[0].data.cpu().numpy()
        output_pose = output[1].data.cpu().numpy()
        tmp_labels = np.argmax(output_cat, axis=1)
        ypred_cat.append(tmp_labels)
        ytrue_cat.append(b["label_np"])
        ypred_pose.append(output_pose)
        ytrue_pose.append(b["y_np"])
        top2 = np.sort(output_cat, axis=1)[:, -2:]
        min_margin = min(min_margin, float((top2[:, 1] - top2[:, 0]).min()))
    return {
        "ytrue_cat": np.concatenate(ytrue_cat),
        "ytrue_pose": np.concatenate(ytrue_pose),
        "ypred_cat": np.concatenate(ypred_cat),
        "ypred_pose": np.concatenate(ypred_pose),
    }, min_margin


class _ListLoader:
    def __init__(self, items):
        self.items = items

    def __iter__(self):
        return iter([dict(b) for b in self.items])


def run_framework_analysis(centers, batches, torch_model, multires):
    cfg = get_config(
        "joint_cat_pose_top1",
        num_classes=C, feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float64", multires=multires,
    )
    variables = load_reference_bd_checkpoint(torch_model.state_dict(), cfg)
    assert jax.tree.leaves(variables["params"])[0].dtype == np.float64
    trainer = Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=centers),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )
    state = trainer.init_state()
    state = state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
    loader = _ListLoader([b["jax"] for b in batches])
    return run_joint_analysis(trainer, state, loader, centers)


def assert_analysis_match(ref, ours, margin):
    assert margin > 1e-5, f"degenerate fixture: cat-logit margin {margin}"
    np.testing.assert_array_equal(ours["ytrue_cat"], ref["ytrue_cat"])
    np.testing.assert_allclose(
        ours["ytrue_pose"], ref["ytrue_pose"], rtol=1e-12, atol=0
    )
    np.testing.assert_array_equal(ours["ypred_cat"], ref["ypred_cat"])
    assert ours["ypred_pose"].shape == ref["ypred_pose"].shape == (
        B * N_BATCHES, NDIM, C
    )
    np.testing.assert_allclose(
        ours["ypred_pose"], ref["ypred_pose"], rtol=1e-6, atol=1e-9,
        err_msg="per-class analysis decodes diverged (torch vs in-graph)",
    )


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def test_joint_analysis_dynamics_x64(ref_modules, centers, batches, x64_mode):
    binDeltaModels, _, _, _ = ref_modules
    torch.manual_seed(31)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = make_torch_analysis_model(oracle, centers, multires=False).double()

    ours = run_framework_analysis(centers, batches, model, multires=False)
    ref, margin = reference_analysis_testing(model, batches)
    assert_analysis_match(ref, ours, margin)


def test_joint_analysis_multires_dynamics_x64(ref_modules, centers, batches,
                                              x64_mode):
    """The multires branch: each class's delta comes from that class's OWN
    bin argmax (evaluateJointModel.py:92-98) — a per-(sample, class) gather
    the mixed training forward never performs."""
    binDeltaModels, _, _, _ = ref_modules
    torch.manual_seed(32)
    oracle = binDeltaModels.OneDeltaPerBinModel(
        "none", C, K, N0, N1, N2, N3, NDIM
    )
    oracle.feature_model = TorchResNet18Features()
    model = make_torch_analysis_model(oracle, centers, multires=True).double()

    ours = run_framework_analysis(centers, batches, model, multires=True)
    ref, margin = reference_analysis_testing(model, batches)
    assert_analysis_match(ref, ours, margin)


def test_analysis_mat_layout_matches_reference(ref_modules, centers, batches,
                                               tmp_path, x64_mode):
    """The combined four-struct results file: the script's own savemat call
    (evaluateJointModel.py:160-161) vs save_analysis_mat — identical
    round-tripped structures."""
    import scipy.io as spio

    binDeltaModels, _, _, _ = ref_modules
    torch.manual_seed(31)
    oracle = binDeltaModels.OneBinDeltaModel("none", C, K, N0, N1, N2, NDIM)
    oracle.feature_model = TorchResNet18Features()
    model = make_torch_analysis_model(oracle, centers, multires=False).double()

    ours = run_framework_analysis(centers, batches, model, multires=False)
    ref, _ = reference_analysis_testing(model, batches)

    ref_file, our_file = tmp_path / "ref.mat", tmp_path / "ours.mat"
    # the script's exact save call, all four runs sharing one dict here
    spio.savemat(
        str(ref_file),
        {"pose_results": ref, "cat_results": ref, "top1_results": ref,
         "wgt_results": ref},
    )
    save_analysis_mat(
        our_file,
        {"pose": ours, "cat": ours, "top1": ours, "wgt": ours},
    )
    a = spio.loadmat(str(ref_file), squeeze_me=True)
    b = spio.loadmat(str(our_file), squeeze_me=True)
    for key in ("pose_results", "cat_results", "top1_results", "wgt_results"):
        ra, rb = a[key], b[key]
        assert set(ra.dtype.names) == set(rb.dtype.names) == {
            "ytrue_cat", "ytrue_pose", "ypred_cat", "ypred_pose"
        }
        for field in ra.dtype.names:
            va = np.asarray(ra[field].item(), np.float64)
            vb = np.asarray(rb[field].item(), np.float64)
            np.testing.assert_allclose(
                vb.reshape(va.shape), va, rtol=1e-6, atol=1e-9
            )


def test_parse_analysis_runs():
    assert parse_analysis_runs(["a", "b"], None) == [
        ("pose", "a"), ("cat", "b")
    ]
    assert parse_analysis_runs(["a"], ["wgt"]) == [("wgt", "a")]
    with pytest.raises(SystemExit):
        parse_analysis_runs(["a", "b"], ["one"])
    with pytest.raises(SystemExit):
        parse_analysis_runs(["a"] * 5, None)
