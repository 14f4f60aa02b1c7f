"""Executing-protocol parity for the detection-conditioned inference path:
the reference's OWN code run verbatim vs `detection.run_detection_inference`.

evaluateModelDetectedBBoxes.py is the one reference Python entry point that
had no executing head-to-head: its `DetImages` dataset (:43-64, built on
`dataGenerators.Dataset`/`preprocess_real`), its per-image `testing()` loop
(:135-171 — variable box counts split into --batch_size chunks, per-chunk
host argmax decode, empty-image passthrough), its three model branches
(`--model_type bd` over binDeltaModels.OneBinDeltaModel /
OneDeltaPerBinModel, `c` and `reg` over inline wrappers of
poseModels.model_3layer, :73-128), and its results .mat layout (:174-189).
Our counterpart flattens every crop into ONE padded static-shape jitted
stream (detection.py) — a completely different execution strategy whose
equivalence is exactly what these tests measure.

Layered like the other executing-parity harnesses in this repo:
  * the PIXEL path runs the reference's own `preprocess_real`
    (ToTensor+Normalize — detector crops are stored pre-sized, so no PIL
    resize is involved) against `DetectionSetIndex.load_image` +
    `normalize_images` at f32;
  * the PROTOCOL paths run at f64 (the x64 dynamics convention:
    torch default dtype double, compute_dtype='float64', the script's
    era-faithful `.float()` cast substituted by `.double()`), with both
    frameworks consuming identically-valued pixels from the same f64
    normalize (the pixel path being certified separately), so chunked
    per-image forwards + host numpy decode must match the padded stream
    to uniform 1e-6 — any BN-mode, selection, padding-leak, or
    scatter-ownership error breaks it at O(1);
  * the RESULTS layout writes the script's own `spio.savemat` call
    side-by-side with `save_results_mat` and round-trips both through
    `load_results_mat`.

The detection .mat fixtures mirror the MATLAB writers' layout exactly
(setupDataDetection_vk.m:42-59: labels (n,1) double, bboxes (n,4|5)
double with the detector score in column 5, xdata (n,S,S,3) uint8,
dbinfo image_names cellstr), including a zero-box image and an image
with more boxes than the chunk size.
"""

import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
from torch import nn
import torch.nn.functional as F

from multi_modal_regression_tpu.data.loader import normalize_images
from multi_modal_regression_tpu.detection import (
    DetectionSetIndex,
    load_results_mat,
    run_detection_inference,
    save_results_mat,
)
from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.models.pretrained import (
    load_reference_bd_checkpoint,
)
from multi_modal_regression_tpu.parallel.mesh import make_mesh
from multi_modal_regression_tpu.train import get_config
from multi_modal_regression_tpu.train.trainer import Trainer

from test_data_pipeline_dynamics import (
    _Compose,
    _Normalize,
    _Resize,
    _ToTensor,
)
from test_torch_dynamics import TorchResNet18Features

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(REFERENCE)

pytestmark = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference repo not mounted"
)

C, K, NDIM = 12, 8, 3
N0, N1, N2, N3 = 512, 32, 16, 12
SIZE = 32
CHUNK = 2  # the script's --batch_size; image 0 has 5 boxes -> 3 chunks


# ---------------------------------------------------------------------------
# reference modules (torchvision transforms stubbed faithfully, .cuda()
# no-op'd — the same import scaffolding as the other dynamics harnesses)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_det():
    stub = types.ModuleType("torchvision")
    stub.transforms = types.ModuleType("torchvision.transforms")
    stub.transforms.Compose = _Compose
    stub.transforms.Resize = _Resize
    stub.transforms.ToTensor = _ToTensor
    stub.transforms.Normalize = _Normalize
    stub.models = types.ModuleType("torchvision.models")
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
        import binDeltaModels
        import dataGenerators
        import poseModels

        yield types.SimpleNamespace(
            dataGenerators=dataGenerators,
            binDeltaModels=binDeltaModels,
            poseModels=poseModels,
        )
    finally:
        nn.Module.cuda = module_cuda
        torch.Tensor.cuda = tensor_cuda
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in ("dataGenerators", "binDeltaModels", "poseModels",
                  "featureModels", "helperFunctions", "axisAngle",
                  "quaternion"):
            sys.modules.pop(k, None)


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


# ---------------------------------------------------------------------------
# the detection set, in the MATLAB writers' exact on-disk layout
# ---------------------------------------------------------------------------

# per-image box counts: >CHUNK (split into 3 chunks incl. a ragged tail),
# zero (the empty passthrough), and assorted small counts
N_BOXES = (5, 0, 3, 1, 2)
SCORED = (0, 2)  # these images carry the detector-score 5th column


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    import scipy.io as spio

    root = tmp_path_factory.mktemp("det_set")
    (root / "all").mkdir()
    rng = np.random.default_rng(11)
    names = [f"2008_{i:06d}" for i in range(len(N_BOXES))]
    for i, (name, n) in enumerate(zip(names, N_BOXES)):
        if n == 0:
            # MATLAB `save` of an empty concatenation ([]) round-trips as
            # a (0, 0) double — size 0, which is all DetImages checks (:58)
            spio.savemat(
                str(root / "all" / f"{name}.mat"),
                {"xdata": np.zeros((0, 0)), "bboxes": np.zeros((0, 0)),
                 "labels": np.zeros((0, 0))},
            )
            continue
        x1 = rng.uniform(0, 200, n)
        y1 = rng.uniform(0, 200, n)
        cols = [x1, y1, x1 + rng.uniform(20, 100, n),
                y1 + rng.uniform(20, 100, n)]
        if i in SCORED:
            cols.append(rng.uniform(0.05, 1.0, n))  # detector confidence
        spio.savemat(
            str(root / "all" / f"{name}.mat"),
            {
                "xdata": rng.integers(0, 256, (n, SIZE, SIZE, 3), np.uint8),
                "bboxes": np.stack(cols, axis=1),
                # labels are a (n, 1) DOUBLE column in the MATLAB layout
                # (setupDataDetection_vk.m:46,49)
                "labels": rng.integers(1, C + 1, (n, 1)).astype(np.float64),
            },
        )
    spio.savemat(
        str(root / "dbinfo.mat"),
        {"image_names": np.array(names, dtype=object)},
    )
    return root


# ---------------------------------------------------------------------------
# the script's DetImages + testing(), assembled verbatim
# ---------------------------------------------------------------------------


def make_det_images(dataGenerators, preprocess=None, cast="float"):
    """evaluateModelDetectedBBoxes.py:43-64 verbatim, over the reference's
    own Dataset/preprocess_real. `preprocess`/`cast` exist only for the x64
    runs (f64 pixels + `.double()` in place of the era-faithful `.float()`
    — the same dtype substitution every x64 dynamics test makes)."""
    import scipy.io as spio

    pre = preprocess if preprocess is not None else dataGenerators.preprocess_real

    class DetImages(dataGenerators.Dataset):
        def __init__(self, db_path):
            super().__init__()
            self.db_path = db_path
            self.image_names = []
            tmp = spio.loadmat(
                os.path.join(self.db_path, "dbinfo"), squeeze_me=True
            )
            self.image_names = tmp["image_names"]

        def __len__(self):
            return len(self.image_names)

        def __getitem__(self, idx):
            image_name = self.image_names[idx]
            tmp = spio.loadmat(
                os.path.join(self.db_path, "all", image_name),
                verify_compressed_data_integrity=False,
            )
            xdata = tmp["xdata"]
            if xdata.size == 0:
                return {"xdata": torch.FloatTensor()}
            xdata = torch.stack(
                [pre(xdata[i]) for i in range(xdata.shape[0])]
            )
            xdata = xdata.float() if cast == "float" else xdata.double()
            label = torch.from_numpy(tmp["labels"] - 1).long()
            bbox = torch.from_numpy(tmp["bboxes"]).float()
            sample = {"xdata": xdata, "label": label, "bbox": bbox}
            return sample

    return DetImages


def reference_testing(model, det_path, model_type, kmeans_dict, batch_size,
                      DetImages):
    """The script's testing() loop verbatim (evaluateModelDetectedBBoxes.py:
    135-171): per-image variable-size batches split into batch_size chunks,
    host numpy argmax decode per chunk, empty images passed through as
    empty arrays. Returns (bbox, ypred, labels) plus the min top-2 score
    margin seen (bd/c decodes argmax — the guard proves the fixture is far
    from a bin tie, so cross-framework argmax agreement is structural)."""
    test_data = DetImages(det_path)
    model.eval()
    ypred = []
    bbox = []
    labels = []
    min_margin = np.inf
    for i in range(len(test_data)):
        sample = test_data[i]
        if len(sample["xdata"]) == 0:
            ypred.append(np.array([]))
            bbox.append(np.array([]))
            labels.append(np.array([]))
            continue
        xdata = sample["xdata"]
        label = sample["label"]
        tmp_ypred = []
        tmp_xdata = torch.split(xdata, batch_size)
        tmp_label = torch.split(label, batch_size)
        for j in range(len(tmp_xdata)):
            with torch.no_grad():  # inference-only; forward values unchanged
                output = model(tmp_xdata[j], tmp_label[j])
            if model_type == "bd":
                scores = output[0].data.cpu().numpy()
                ypred_bin = np.argmax(scores, axis=1)
                ypred_res = output[1].data.cpu().numpy()
                tmp_ypred.append(kmeans_dict[ypred_bin, :] + ypred_res)
            elif model_type == "c":
                scores = output.data.cpu().numpy()
                ypred_bin = np.argmax(scores, axis=1)
                tmp_ypred.append(kmeans_dict[ypred_bin, :])
            else:
                scores = None
                tmp_ypred.append(output.data.cpu().numpy())
            if scores is not None and scores.shape[1] > 1:
                top2 = np.sort(scores, axis=1)[:, -2:]
                min_margin = min(min_margin, float((top2[:, 1] - top2[:, 0]).min()))
        ypred.append(np.concatenate(tmp_ypred))
        bbox.append(sample["bbox"].numpy())
        labels.append(sample["label"].numpy())
    return bbox, ypred, labels, min_margin


# ---------------------------------------------------------------------------
# the script's inline reg / c wrappers (evaluateModelDetectedBBoxes.py:73-109)
# with the injected resnet18 feature model (the standard harness deviation —
# torchvision resnet50 weights are not present in this environment)
# ---------------------------------------------------------------------------


def make_regression_model(poseModels, feature_model):
    class RegressionModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = feature_model
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, NDIM) for _ in range(C)]
            )

        def forward(self, x, label):
            x = self.feature_model(x)
            x = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            label = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            label = label.unsqueeze(2)
            y = torch.squeeze(torch.bmm(x, label), 2)
            y = np.pi * F.tanh(y)
            return y

    return RegressionModel()


def make_classification_model(poseModels, feature_model, dict_size):
    class ClassificationModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_classes = C
            self.feature_model = feature_model
            self.pose_models = nn.ModuleList(
                [poseModels.model_3layer(N0, N1, N2, dict_size)
                 for _ in range(C)]
            )

        def forward(self, x, label):
            x = self.feature_model(x)
            x = torch.stack(
                [self.pose_models[i](x) for i in range(self.num_classes)]
            ).permute(1, 2, 0)
            label = torch.zeros(label.size(0), self.num_classes).scatter_(
                1, label.data.cpu(), 1.0
            )
            label = label.unsqueeze(2)
            y = torch.squeeze(torch.bmm(x, label), 2)
            return y

    return ClassificationModel()


# ---------------------------------------------------------------------------
# framework side
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def centers():
    rng = np.random.default_rng(5)
    return (0.8 * rng.standard_normal((K, NDIM))).astype(np.float32)


def _f64_preprocess(arr):
    """One crop through the framework's OWN f64 normalize — the pixel
    source both frameworks share in the x64 protocol runs (test_det_images_
    pixels_match certifies this equals preprocess_real at f32)."""
    t = np.asarray(normalize_images(jnp.asarray(arr[None]), dtype=jnp.float64))[0]
    return torch.from_numpy(np.ascontiguousarray(t.transpose(2, 0, 1)))


def run_framework(preset, centers, det_root, torch_model, **over):
    cfg = get_config(
        preset,
        feature_network="resnet18",
        N0=N0, N1=N1, N2=N2, N3=N3, dict_size=K, image_size=SIZE,
        compute_dtype="float64",
        **over,
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
    index = DetectionSetIndex(str(det_root))
    return run_detection_inference(
        trainer.apply_fn, trainer.problem, state, index,
        batch_size=CHUNK, compute_dtype=jnp.float64,
    )


def assert_det_outputs_match(ref, ours, det_root, rtol=1e-6, atol=1e-9):
    bbox_r, ypred_r, labels_r, margin = ref
    bboxes_o, ypred_o, labels_o, scores_o = ours
    assert margin > 1e-5, f"degenerate fixture: top-2 score margin {margin}"
    assert len(ypred_r) == len(ypred_o) == len(N_BOXES)
    for i, n in enumerate(N_BOXES):
        if n == 0:
            assert ypred_r[i].size == 0 and ypred_o[i].size == 0
            assert labels_r[i].size == 0 and labels_o[i].size == 0
            continue
        assert ypred_r[i].shape == (n, ypred_o[i].shape[1])
        np.testing.assert_allclose(
            ypred_o[i], ypred_r[i], rtol=rtol, atol=atol,
            err_msg=f"image {i} predictions diverged (torch vs stream)",
        )
        # the script keeps 0-based (n,1) labels; ours are raveled (n,)
        np.testing.assert_array_equal(labels_o[i], labels_r[i].ravel())
        # bbox passthrough keeps every stored column, incl. the score
        np.testing.assert_allclose(
            bboxes_o[i], np.asarray(bbox_r[i], np.float64), rtol=0, atol=1e-5
        )
        expect_scores = (
            bboxes_o[i][:, 4] if i in SCORED else np.ones(n)
        )
        np.testing.assert_array_equal(scores_o[i], expect_scores)


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------


def test_det_images_pixels_match_loader(ref_det, det_root):
    """The PIXEL path: DetImages executed verbatim with the reference's own
    preprocess_real (ToTensor + Normalize, dataGenerators.py:23) vs
    DetectionSetIndex.load_image + normalize_images at f32. Both compute
    (u8/255 - mean)/std in f32; agreement must be within f32 rounding of
    the shared formula — orders of magnitude below one normalized uint8
    LSB (1/255/std ~ 1.7e-2)."""
    DetImages = make_det_images(ref_det.dataGenerators)
    ds = DetImages(str(det_root))
    index = DetectionSetIndex(str(det_root))
    assert [str(n) for n in ds.image_names] == index.image_names
    for i, n in enumerate(N_BOXES):
        sample = ds[i]
        ours = index.load_image(i)
        if n == 0:
            assert len(sample["xdata"]) == 0 and ours is None
            continue
        ref_px = sample["xdata"].numpy()  # (n, 3, S, S)
        our_px = np.asarray(
            normalize_images(jnp.asarray(ours["xdata"]))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ref_px, our_px, rtol=0, atol=2e-6)
        np.testing.assert_array_equal(
            sample["label"].numpy().ravel(), ours["labels"]
        )
        np.testing.assert_allclose(
            sample["bbox"].numpy(),
            np.asarray(ours["bboxes"], np.float32),
            rtol=1e-6, atol=0,
        )


def test_detection_bd_protocol_x64(ref_det, det_root, centers, x64_mode):
    """--model_type bd (the default): OneBinDeltaModel chunked per image +
    host `kmeans_dict[argmax] + res` decode (the script's :156-159) vs the
    geodesic problem's in-graph _decode_hard over the padded stream."""
    torch.manual_seed(20)
    model = ref_det.binDeltaModels.OneBinDeltaModel(
        "none", C, K, N0, N1, N2, NDIM
    )
    model.feature_model = TorchResNet18Features()
    model = model.double()

    ours = run_framework("geodesic_bd", centers, det_root, model)
    DetImages = make_det_images(
        ref_det.dataGenerators, preprocess=_f64_preprocess, cast="double"
    )
    ref = reference_testing(model, str(det_root), "bd", centers, CHUNK,
                            DetImages)
    assert_det_outputs_match(ref, ours, det_root)


def test_detection_bd_multires_protocol_x64(ref_det, det_root, centers,
                                            x64_mode):
    """--model_type bd --multires: OneDeltaPerBinModel — the delta the
    stream adds must be the one selected by the model's own bin argmax
    (binDeltaModels.py:146-149), exercised through the same chunk split."""
    torch.manual_seed(21)
    model = ref_det.binDeltaModels.OneDeltaPerBinModel(
        "none", C, K, N0, N1, N2, N3, NDIM
    )
    model.feature_model = TorchResNet18Features()
    model = model.double()

    ours = run_framework("geodesic_bd_multires", centers, det_root, model)
    DetImages = make_det_images(
        ref_det.dataGenerators, preprocess=_f64_preprocess, cast="double"
    )
    ref = reference_testing(model, str(det_root), "bd", centers, CHUNK,
                            DetImages)
    assert_det_outputs_match(ref, ours, det_root)


def test_detection_classification_protocol_x64(ref_det, det_root, centers,
                                               x64_mode):
    """--model_type c: the script's inline ClassificationModel (:95-109)
    vs the classification problem's C[argmax] decode. The prediction IS a
    dictionary row, so beyond allclose the rows must be bitwise-identical
    f32 atoms on both sides."""
    torch.manual_seed(22)
    feature = TorchResNet18Features()
    model = make_classification_model(
        ref_det.poseModels, feature, K
    ).double()

    ours = run_framework("classification", centers, det_root, model)
    DetImages = make_det_images(
        ref_det.dataGenerators, preprocess=_f64_preprocess, cast="double"
    )
    ref = reference_testing(model, str(det_root), "c", centers, CHUNK,
                            DetImages)
    assert_det_outputs_match(ref, ours, det_root, rtol=0, atol=0)


def test_detection_regression_protocol_x64(ref_det, det_root, centers,
                                           x64_mode):
    """--model_type reg: the script's inline RegressionModel with the
    pi*tanh output (:90) vs the per_class_regression model + identity
    decode."""
    torch.manual_seed(23)
    feature = TorchResNet18Features()
    model = make_regression_model(ref_det.poseModels, feature).double()

    ours = run_framework("geodesic_regression", centers, det_root, model)
    DetImages = make_det_images(
        ref_det.dataGenerators, preprocess=_f64_preprocess, cast="double"
    )
    ref = reference_testing(model, str(det_root), "reg", centers, CHUNK,
                            DetImages)
    assert_det_outputs_match(ref, ours, det_root)


def test_results_mat_layout_round_trip(ref_det, det_root, centers, tmp_path,
                                       x64_mode):
    """The results files: the script's own `spio.savemat({'bbox', 'ypred',
    'labels'})` over its python lists (:176-177) vs save_results_mat over
    the stream's outputs. Both must load back (scipy object-cell layout)
    with per-image equal values, and load_results_mat must read the
    REFERENCE-written file identically to ours — so `cli
    evaluate-detections` accepts results files produced by either
    implementation."""
    import scipy.io as spio

    torch.manual_seed(20)
    model = ref_det.binDeltaModels.OneBinDeltaModel(
        "none", C, K, N0, N1, N2, NDIM
    )
    model.feature_model = TorchResNet18Features()
    model = model.double()

    bboxes, ypred, labels, scores = run_framework(
        "geodesic_bd", centers, det_root, model
    )
    DetImages = make_det_images(
        ref_det.dataGenerators, preprocess=_f64_preprocess, cast="double"
    )
    bbox_r, ypred_r, labels_r, _ = reference_testing(
        model, str(det_root), "bd", centers, CHUNK, DetImages
    )

    ref_file = tmp_path / "ref_results.mat"
    our_file = tmp_path / "our_results.mat"
    # the script's exact save call (evaluateModelDetectedBBoxes.py:177)
    spio.savemat(str(ref_file), {"bbox": bbox_r, "ypred": ypred_r,
                                 "labels": labels_r})
    save_results_mat(our_file, bboxes, ypred, labels)

    got_ref = load_results_mat(ref_file)
    got_ours = load_results_mat(our_file)
    for g_r, g_o in zip(got_ref, got_ours):
        assert len(g_r) == len(g_o) == len(N_BOXES)
        for i in range(len(N_BOXES)):
            a, b = np.asarray(g_r[i], np.float64), np.asarray(g_o[i], np.float64)
            if a.size == 0 and b.size == 0:
                continue
            # the script stores (n,1) label columns, ours (n,) rows — the
            # loader ravels both; everything else must agree to file
            # round-trip precision
            np.testing.assert_allclose(
                a.reshape(b.shape), b, rtol=1e-6, atol=1e-9,
                err_msg=f"results .mat round-trip diverged at image {i}",
            )
