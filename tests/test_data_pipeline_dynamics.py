"""Executing data-pipeline parity: the reference's OWN Dataset classes run
head-to-head against this framework's index/loader/on-device-target stack.

The training-dynamics certifications (test_torch_dynamics.py) feed both
frameworks identical device batches, so the image path itself — PNG decode,
bilinear resize, ToTensor/Normalize, the ImagesAll wrap-around sampler
(dataGenerators.py:46-74), my_collate's concatenation order (:127-132), the
render tilt-sign through parse_name on real filenames (:57-62), the
MultibinImages host-side target protocol (:135-178) and the Pascal3dAll
split quirk ('val' -> pascal_train, :92-97) — was until now certified only
by construction. Here the reference's ImagesAll / MultibinImages /
TestImages / Pascal3dAll execute verbatim on a synthetic prepared tree and
every array they emit is compared against BalancedLoader / TestLoader /
MatCropLoader + the on-device data.targets equivalents.

torchvision is not installed; dataGenerators.py needs exactly four of its
transforms at import time (Compose/Resize/ToTensor/Normalize,
dataGenerators.py:21-23,39-40), so the stub provides faithful PIL/tensor
implementations of those semantics: Resize([h,w]) == PIL img.resize((w,h),
BILINEAR); ToTensor == uint8 HWC -> float32 CHW / 255 (PIL or ndarray);
Normalize == (t - mean) / std channelwise. The decode/resize pixel path on
our side is separately byte-identity-tested against PIL (test_native.py),
so a <= 1e-5 match of the normalized tensors here certifies pixel equality
(one uint8 LSB is ~0.017 after normalization).
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp
import torch
from PIL import Image

from multi_modal_regression_tpu.data import (
    BalancedLoader,
    ClassBalancedIndex,
    FlatTestIndex,
    MatCropIndex,
    MatCropLoader,
)
from multi_modal_regression_tpu.data import TestLoader as FlatTestLoader
from multi_modal_regression_tpu.data.loader import normalize_images
from multi_modal_regression_tpu.data.naming import PASCAL3D_CLASSES
from multi_modal_regression_tpu.data.targets import (
    euler_to_pose,
    gmm_soft_targets,
    hard_bin_targets,
    per_bin_tangent_residuals,
    rbf_soft_targets,
    tangent_residual_targets,
)
from multi_modal_regression_tpu.geometry.quaternion import quat_from_axis_angle
from multi_modal_regression_tpu.geometry.so3 import exp_so3
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


# ---------------------------------------------------------------------------
# faithful torchvision.transforms stub (see module docstring)
# ---------------------------------------------------------------------------


class _Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class _Resize:
    """transforms.Resize([h, w]) on a PIL image == img.resize((w, h),
    BILINEAR) (torchvision's functional.resize PIL branch)."""

    def __init__(self, size, interpolation=None):
        self.size = list(size) if not isinstance(size, int) else [size, size]

    def __call__(self, img):
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class _ToTensor:
    """uint8 HWC (PIL image or ndarray) -> float32 CHW / 255."""

    def __call__(self, pic):
        if isinstance(pic, np.ndarray):
            arr = pic
        else:
            arr = np.asarray(pic, np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose((2, 0, 1))))
        return t.float().div(255.0)


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


@pytest.fixture(scope="module")
def ref_data():
    """Import the reference's dataGenerators with the transforms stub."""
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
    try:
        import dataGenerators

        yield dataGenerators
    finally:
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in ("dataGenerators", "helperFunctions", "axisAngle",
                  "quaternion"):
            sys.modules.pop(k, None)


@pytest.fixture(scope="module")
def ref_gen(ref_data):
    """The reference's derived generator modules, imported under the same
    stub (REFERENCE is on sys.path for the lifetime of ref_data):
    binDeltaGenerators (what 20+ learn/evaluate scripts construct),
    ablationFunctions (the `_train_info` real split + tunable gamma), and
    objectnetHelperFunctions (flat per-class indexes, module-level
    preprocess)."""
    import ablationFunctions
    import binDeltaGenerators
    import objectnetHelperFunctions

    yield types.SimpleNamespace(
        bdg=binDeltaGenerators,
        abl=ablationFunctions,
        onf=objectnetHelperFunctions,
    )
    for k in ("binDeltaGenerators", "ablationFunctions",
              "objectnetHelperFunctions", "featureModels", "poseModels"):
        sys.modules.pop(k, None)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Synthetic prepared tree in the reference on-disk layout: all 12
    classes (helperFunctions.classes is hard-coded in the reference readers),
    48px images so the 48 -> 224 bilinear resize path actually executes,
    cellstr `<cls>_info.mat` index files."""
    root = tmp_path_factory.mktemp("pose_tree")
    generate_pose_dataset(
        root, images_per_class=3, image_size=48, seed=11, write_info_mat=True
    )
    return root


def _ref_np(batch_xdata: torch.Tensor) -> np.ndarray:
    """torch (B, 3, H, W) f32 -> numpy (B, H, W, 3)."""
    return batch_xdata.numpy().transpose(0, 2, 3, 1)


def _our_norm(x_uint8: np.ndarray) -> np.ndarray:
    return np.asarray(normalize_images(jnp.asarray(x_uint8)))


def _assert_angles_bounded(y, lim=3.12):
    """Self-certify the seed stays away from the acos(-1) conditioning
    cliff so the f32-vs-f64 axis-angle tolerance below is sound: the
    axis error is ~2e-7/sin(theta), so at theta <= 3.12 (sin >= 0.0216)
    the propagated target error is <= ~3e-5 — 6x inside the 2e-4 bound."""
    ang = np.linalg.norm(np.asarray(y, np.float64), axis=-1)
    assert float(ang.max()) < lim


def _our_batches(tree, db_type, n_batches=2, items_per_batch=2):
    idx = ClassBalancedIndex(str(tree), db_type)
    loader = BalancedLoader(
        idx, items_per_batch=items_per_batch, image_size=224, shuffle=False,
        num_workers=2, prefetch_depth=1,
    )
    out = []
    for b in loader:
        out.append(b)
        if len(out) == n_batches:
            break
    return out


# ---------------------------------------------------------------------------
# ImagesAll vs ClassBalancedIndex + BalancedLoader
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("db_type", ["real", "render"])
def test_imagesall_vs_balanced_loader(ref_data, tree, db_type):
    ds = ref_data.ImagesAll(str(tree), db_type)
    ref_batches = [
        ref_data.my_collate([ds[2 * b], ds[2 * b + 1]]) for b in range(2)
    ]
    ours = _our_batches(tree, db_type)
    for rb, ob in zip(ref_batches, ours):
        np.testing.assert_array_equal(
            rb["label"].numpy().ravel(), ob["label"]
        )
        # pixels: normalized tensors within a fraction of one uint8 LSB
        np.testing.assert_allclose(
            _our_norm(ob["xdata"]), _ref_np(rb["xdata"]), atol=1e-5, rtol=0
        )
        # pose targets: reference host-side parse_name -> R -> get_y chain
        # vs our euler passthrough + on-device euler_to_pose
        ref_y = rb["ydata"].numpy()
        _assert_angles_bounded(ref_y)
        our_y = np.asarray(euler_to_pose(jnp.asarray(ob["euler"])))
        np.testing.assert_allclose(our_y, ref_y, atol=2e-4, rtol=0)


def test_imagesall_render_tilt_sign_differs(ref_data, tree):
    """The render db negates ct (dataGenerators.py:59-60) — certify the two
    db types yield genuinely different targets on this tree (so the
    parametrized test above cannot pass with a dropped sign)."""
    real = ref_data.ImagesAll(str(tree), "real")[0]["ydata"].numpy()
    rend = ref_data.ImagesAll(str(tree), "render")[0]["ydata"].numpy()
    assert float(np.abs(real - rend).max()) > 0.05


def test_imagesall_wraparound_item(ref_data, tree):
    """Epoch length is the max class size; smaller classes wrap via
    idx % num_images[c] (dataGenerators.py:43-50). Compare the last item of
    the epoch, which wraps every class smaller than the max."""
    ds = ref_data.ImagesAll(str(tree), "real")
    last = len(ds) - 1
    assert last >= 3  # wraps the 3-image classes (in-test premise check)
    ref_b = ref_data.my_collate([ds[last]])
    idx = ClassBalancedIndex(str(tree), "real")
    loader = BalancedLoader(
        idx, items_per_batch=1, image_size=224, shuffle=False, num_workers=2,
        prefetch_depth=1,
    )
    ob = None
    for ob in loader:  # last yielded batch is item `last`
        pass
    np.testing.assert_allclose(
        _our_norm(ob["xdata"]), _ref_np(ref_b["xdata"]), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(euler_to_pose(jnp.asarray(ob["euler"]))),
        ref_b["ydata"].numpy(), atol=2e-4, rtol=0,
    )


def test_imagesall_quaternion_targets(ref_data, tree):
    ds = ref_data.ImagesAll(str(tree), "real", ydata_type="quaternion")
    ref_b = ref_data.my_collate([ds[0], ds[1]])
    ob = _our_batches(tree, "real", n_batches=1)[0]
    our_q = np.asarray(
        euler_to_pose(jnp.asarray(ob["euler"]), ydata_type="quaternion")
    )
    ref_q = ref_b["ydata"].numpy()
    assert (ref_q[:, 0] >= 0).all()  # (cos t/2, sin t/2 v), t in [0, pi]
    np.testing.assert_allclose(our_q, ref_q, atol=1e-4, rtol=0)


# ---------------------------------------------------------------------------
# MultibinImages vs on-device data.targets
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kmeans_file(ref_data, tree, tmp_path_factory):
    """A real pickled sklearn KMeans (what MultibinImages unpickles,
    dataGenerators.py:141), fit on this tree's axis-angle targets."""
    from sklearn.cluster import KMeans

    ds = ref_data.ImagesAll(str(tree), "real")
    Y = np.concatenate([ds[i]["ydata"].numpy() for i in range(len(ds))])
    # fit in f32: the reference's real pickled dictionaries are f32 (fit on
    # the datasets' f32 ydata), and sklearn's predict requires matching dtype
    km = KMeans(n_clusters=8, random_state=0, n_init=10).fit(
        Y.astype(np.float32)
    )
    path = tmp_path_factory.mktemp("kmeans") / "kmeans.pkl"
    with open(path, "wb") as f:
        pickle.dump(km, f)
    return str(path)


def _multibin_batch(ref_data, tree, problem_type, kmeans_file):
    mb = ref_data.MultibinImages(str(tree), "real", problem_type, kmeans_file)
    return ref_data.my_collate([mb[0], mb[1]]), mb


def _bin_margins(y, centers):
    d = ((np.asarray(y, np.float64)[:, None, :] - centers[None]) ** 2).sum(-1)
    part = np.partition(d, 1, axis=1)
    return part[:, 1] - part[:, 0]


def test_multibin_m1_targets(ref_data, tree, kmeans_file):
    ref_b, mb = _multibin_batch(ref_data, tree, "m1", kmeans_file)
    centers = mb.kmeans.cluster_centers_
    ob = _our_batches(tree, "real", n_batches=1)[0]
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    # self-certify no f32-vs-f64 argmin flip is possible on this seed
    assert float(_bin_margins(y, centers).min()) > 1e-3
    bins, res = hard_bin_targets(y, jnp.asarray(centers, jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(bins), ref_b["ydata_bin"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=2e-4, rtol=0
    )


def test_multibin_m2_targets(ref_data, tree, kmeans_file):
    """'m2': hard bin + per-bin SO(3) tangent residuals computed by the
    reference's get_residuals double loop (dataGenerators.py:163-164,
    173-178) vs our batched per_bin_tangent_residuals."""
    ref_b, mb = _multibin_batch(ref_data, tree, "m2", kmeans_file)
    centers = mb.kmeans.cluster_centers_
    ob = _our_batches(tree, "real", n_batches=1)[0]
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    key_R = exp_so3(jnp.asarray(centers, jnp.float32))
    bins, _, _ = tangent_residual_targets(
        y, jnp.asarray(centers, jnp.float32), key_R
    )
    np.testing.assert_array_equal(
        np.asarray(bins), ref_b["ydata_bin"].numpy()
    )
    ref_res = ref_b["ydata_res"].numpy()  # (B, K, 3)
    # lim 3.13 (sin >= 0.0116): propagated error <= ~1e-4, 5x inside 5e-4
    _assert_angles_bounded(ref_res, lim=3.13)
    our_res = np.asarray(per_bin_tangent_residuals(y, key_R))
    np.testing.assert_allclose(our_res, ref_res, atol=5e-4, rtol=0)


def test_multibin_m3_targets(ref_data, tree, kmeans_file):
    """'m3': RBF soft bins exp(-10 d^2) normalized + soft-center residual
    (dataGenerators.py:155-158,165-166) vs rbf_soft_targets."""
    ref_b, mb = _multibin_batch(ref_data, tree, "m3", kmeans_file)
    centers = mb.kmeans.cluster_centers_
    ob = _our_batches(tree, "real", n_batches=1)[0]
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    soft, res = rbf_soft_targets(
        y, jnp.asarray(centers, jnp.float32), gamma=10.0
    )
    np.testing.assert_allclose(
        np.asarray(soft), ref_b["ydata_bin"].numpy(), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=1e-5, rtol=0
    )


# ---------------------------------------------------------------------------
# TestImages vs FlatTestIndex + TestLoader
# ---------------------------------------------------------------------------


def test_testimages_vs_test_loader(ref_data, tree):
    ds = ref_data.TestImages(str(tree))
    n = len(ds)
    ref_x = np.stack([_ref_np(ds[i]["xdata"][None])[0] for i in range(n)])
    ref_y = np.stack([ds[i]["ydata"].numpy() for i in range(n)])
    ref_l = np.array([int(ds[i]["label"]) for i in range(n)])

    idx = FlatTestIndex(str(tree))
    loader = FlatTestLoader(idx, batch_size=16, image_size=224, num_workers=2)
    xs, ys, ls = [], [], []
    for b in loader:
        v = b["valid"]
        xs.append(b["xdata"][v])
        ys.append(b["euler"][v])
        ls.append(b["label"][v])
    our_x = np.concatenate(xs)
    our_l = np.concatenate(ls)
    assert len(our_x) == n
    np.testing.assert_array_equal(our_l, ref_l)
    np.testing.assert_allclose(_our_norm(our_x), ref_x, atol=1e-5, rtol=0)
    _assert_angles_bounded(ref_y)
    our_y = np.asarray(euler_to_pose(jnp.asarray(np.concatenate(ys))))
    np.testing.assert_allclose(our_y, ref_y, atol=2e-4, rtol=0)


# ---------------------------------------------------------------------------
# Pascal3dAll vs MatCropIndex + MatCropLoader
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mat_tree(tmp_path_factory):
    """Per-image .mat crop tree in the Pascal3dAll layout: multi-crop files,
    DISTINCT pascal_train / pascal_val lists so the split quirk ('val' ->
    pascal_train, dataGenerators.py:92-97) is discriminable, cellstr index
    files (what MATLAB's save writes)."""
    import scipy.io as spio

    root = tmp_path_factory.mktemp("mat_tree")
    rng = np.random.default_rng(5)
    for ci, cls in enumerate(PASCAL3D_CLASSES):
        cdir = root / cls
        cdir.mkdir()
        names = []
        # two files per split: squeeze_me collapses singleton cell lists to
        # 0-d, which the reference reader cannot concatenate (real per-class
        # lists are never singletons)
        for j, ncrops in enumerate((2, 1, 4, 1)):
            y = rng.standard_normal((ncrops, 3))
            y *= (rng.uniform(0.3, 2.5, (ncrops, 1))
                  / np.linalg.norm(y, axis=1, keepdims=True))
            name = f"{cls}_img{j}.mat"
            spio.savemat(
                str(cdir / name),
                {
                    "xdata": rng.integers(0, 256, (ncrops, 64, 64, 3)).astype(
                        np.uint8
                    ),
                    "ydata": y,
                },
            )
            names.append(name)
        spio.savemat(
            str(root / f"{cls}_info.mat"),
            {
                "pascal_train": np.array(names[:2], dtype=object),
                "pascal_val": np.array(names[2:], dtype=object),
                "image_names": np.array(names, dtype=object),
            },
        )
    return root


def _mat_loader_stream(mat_tree, split):
    idx = MatCropIndex(str(mat_tree), split)
    loader = MatCropLoader(idx, batch_size=7, image_size=None, num_workers=2)
    xs, ys, ls = [], [], []
    for b in loader:
        v = b["valid"]
        xs.append(b["xdata"][v])
        ys.append(b["ydata"][v])
        ls.append(b["label"][v])
    return np.concatenate(xs), np.concatenate(ys), np.concatenate(ls)


@pytest.mark.parametrize("split", ["val", "test"])
def test_pascal3dall_vs_mat_loader(ref_data, mat_tree, split):
    ds = ref_data.Pascal3dAll(str(mat_tree), split)
    ref_all = ref_data.my_collate([ds[i] for i in range(len(ds))])
    our_x, our_y, our_l = _mat_loader_stream(mat_tree, split)
    # the split mapping is count-discriminable: 'val' -> the two
    # pascal_train files (2+1 crops), 'test' -> pascal_val (4+1)
    expected = {"val": 3, "test": 5}[split] * len(PASCAL3D_CLASSES)
    assert len(our_x) == expected == ref_all["ydata"].shape[0]
    np.testing.assert_array_equal(
        our_l, ref_all["label"].numpy().ravel()
    )
    # ydata passes through un-recomputed on both sides -> bitwise f32 equal
    np.testing.assert_array_equal(
        our_y.astype(np.float32), ref_all["ydata"].numpy()
    )
    np.testing.assert_allclose(
        _our_norm(our_x), _ref_np(ref_all["xdata"]), atol=1e-6, rtol=0
    )


def test_pascal3dall_split_quirk_discriminates(ref_data, mat_tree):
    """In-test premise check: the two splits stream different files, so the
    parametrized test cannot pass with a swapped split mapping."""
    _, y_val, _ = _mat_loader_stream(mat_tree, "val")
    _, y_test, _ = _mat_loader_stream(mat_tree, "test")
    assert y_val.shape != y_test.shape or not np.allclose(y_val, y_test)


def test_pascal3dall_quaternion_conversion(ref_data, mat_tree):
    """Pascal3dAll's host-side axis-angle -> quaternion conversion with the
    eps-guarded axis (dataGenerators.py:112-115) vs our on-device
    quat_from_axis_angle (the eval step's conversion)."""
    ds = ref_data.Pascal3dAll(str(mat_tree), "test", ydata_type="quaternion")
    ref_all = ref_data.my_collate([ds[i] for i in range(len(ds))])
    _, our_y, _ = _mat_loader_stream(mat_tree, "test")
    our_q = np.asarray(quat_from_axis_angle(jnp.asarray(our_y, jnp.float32)))
    np.testing.assert_allclose(
        our_q, ref_all["ydata"].numpy(), atol=1e-5, rtol=0
    )


# ---------------------------------------------------------------------------
# binDeltaGenerators vs ClassBalancedIndex + BalancedLoader + data.targets
# (the generator classes the learn*/evaluate* scripts actually construct)
# ---------------------------------------------------------------------------


def _first_batch_pair(ref_ds, ref_data, tree, db_type):
    ref_b = ref_data.my_collate([ref_ds[0], ref_ds[1]])
    ob = _our_batches(tree, db_type, n_batches=1)[0]
    return ref_b, ob


@pytest.mark.parametrize("db_type", ["real", "render"])
def test_bdg_gbd_generator(ref_gen, ref_data, tree, kmeans_file, db_type):
    """GBDGenerator (binDeltaGenerators.py:10-32) — kmeans.predict hard bin
    + Euclidean center residual on top of the ImagesAll pixel/target path,
    for both tilt-sign conventions."""
    ds = ref_gen.bdg.GBDGenerator(str(tree), db_type, kmeans_file)
    ref_b, ob = _first_batch_pair(ds, ref_data, tree, db_type)
    np.testing.assert_allclose(
        _our_norm(ob["xdata"]), _ref_np(ref_b["xdata"]), atol=1e-5, rtol=0
    )
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    centers = ds.kmeans.cluster_centers_
    assert float(_bin_margins(y, centers).min()) > 1e-3  # no argmin flips
    bins, res = hard_bin_targets(y, jnp.asarray(centers, jnp.float32))
    np.testing.assert_array_equal(np.asarray(bins), ref_b["ydata_bin"].numpy())
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=2e-4, rtol=0
    )


class _EraLabels(np.ndarray):
    """predict-labels array restoring ONE era-torch coercion: TestImages
    computes `np.squeeze(labels) * torch.ones(1).long()`
    (objectnetHelperFunctions.py:100-102) — a 0-d ndarray times a Tensor,
    which the reference's torch coerced and modern torch refuses."""

    def __mul__(self, other):
        if isinstance(other, torch.Tensor):
            return int(self) * other
        return super().__mul__(other)


class EraPredictKMeans:
    """A fitted-KMeans pickle whose `predict` carries the sklearn-era
    semantics the reference ran on: Euclidean argmin against the CURRENT
    `cluster_centers_`, any dtype or dimension (era `_check_test_data`
    validated X against `cluster_centers_.shape[1]` and
    `euclidean_distances` upcast mixed dtypes). Modern sklearn pins
    `n_features_in_` at fit and its Lloyd kernel requires
    `X.dtype == cluster_centers_.dtype`, so two published code paths now
    raise despite having run fine in the era: GBDGeneratorQ predicts f32
    4-dim quaternions against the mutated f64 converted centers
    (binDeltaGenerators.py:67,79 + learnGeodesicBDModel_quaternion.py:57),
    and objectnet TestImages predicts f64 get_y outputs against the
    f32-fit dictionary (objectnetHelperFunctions.py:100). This shim class
    (cluster_centers_ + n_clusters + era predict, nothing else) is what
    gets pickled where those paths execute; the Dataset classes' own code
    runs untouched, and bin-margin guards in every consuming test rule out
    argmin ties."""

    def __init__(self, fitted_kmeans):
        self.cluster_centers_ = np.asarray(fitted_kmeans.cluster_centers_)
        self.n_clusters = int(fitted_kmeans.n_clusters)

    def predict(self, X):
        X = np.asarray(X, np.float64)
        C = np.asarray(self.cluster_centers_, np.float64)
        labels = np.argmin(((X[:, None] - C[None]) ** 2).sum(-1), axis=1)
        return labels.view(_EraLabels)


def _era_pickle(kmeans_file, path):
    with open(kmeans_file, "rb") as f:
        km = pickle.load(f)
    with open(path, "wb") as f:
        pickle.dump(EraPredictKMeans(km), f)
    return str(path)


@pytest.fixture(scope="module")
def kmeans_q_file(kmeans_file, tmp_path_factory):
    """The axis-angle dictionary re-pickled with era predict semantics for
    GBDGeneratorQ (see EraPredictKMeans)."""
    return _era_pickle(
        kmeans_file, tmp_path_factory.mktemp("kmeans_q") / "kmeans.pkl"
    )


def test_bdg_gbd_generator_q(ref_gen, ref_data, tree, kmeans_file,
                             kmeans_q_file):
    """GBDGeneratorQ — quaternion ydata, dictionary converted through the
    reference's own convert_dictionary (quaternion.py:79-92), hard binning
    by Euclidean distance IN QUATERNION SPACE (see kmeans_q_file on the
    sklearn-era validation) — vs our quaternion euler_to_pose +
    convert_dictionary + hard_bin_targets."""
    from multi_modal_regression_tpu.geometry.quaternion import (
        convert_dictionary as our_convert,
    )

    ds = ref_gen.bdg.GBDGeneratorQ(str(tree), "real", kmeans_q_file)
    ref_b, ob = _first_batch_pair(ds, ref_data, tree, "real")
    y_q = euler_to_pose(jnp.asarray(ob["euler"]), ydata_type="quaternion")
    # the class mutated its estimator's centers to the converted quats;
    # certify our conversion of the ORIGINAL pickle matches the centers the
    # binning actually used
    with open(kmeans_file, "rb") as f:
        raw = pickle.load(f)
    centers_q = our_convert(jnp.asarray(raw.cluster_centers_))
    np.testing.assert_allclose(
        np.asarray(centers_q), ds.kmeans.cluster_centers_, atol=1e-6, rtol=0
    )
    assert float(
        _bin_margins(y_q, np.asarray(ds.kmeans.cluster_centers_)).min()
    ) > 1e-3
    bins, res = hard_bin_targets(y_q, centers_q.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(bins), ref_b["ydata_bin"].numpy())
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=1e-4, rtol=0
    )


@pytest.fixture(scope="module")
def gmm_file(ref_data, tree, tmp_path_factory):
    """A real pickled sklearn full-covariance GaussianMixture (what
    XPBDGenerator unpickles, binDeltaGenerators.py:40; fit protocol of
    learnGMMDictionary: covariance_type='full')."""
    from sklearn.mixture import GaussianMixture

    ds = ref_data.ImagesAll(str(tree), "real")
    Y = np.concatenate([ds[i]["ydata"].numpy() for i in range(len(ds))])
    gmm = GaussianMixture(
        n_components=5, covariance_type="full", random_state=0, n_init=3,
        reg_covar=1e-4,
    ).fit(Y.astype(np.float64))
    path = tmp_path_factory.mktemp("gmm") / "gmm.pkl"
    with open(path, "wb") as f:
        pickle.dump(gmm, f)
    return str(path)


def test_bdg_xpbd_generator_gmm(ref_gen, ref_data, tree, gmm_file):
    """XPBDGenerator (binDeltaGenerators.py:35-57) — sklearn predict_proba
    posterior soft bins + posterior-mean residual vs our gmm_soft_targets
    (recomputed Cholesky path, f32)."""
    ds = ref_gen.bdg.XPBDGenerator(str(tree), "real", gmm_file)
    ref_b, ob = _first_batch_pair(ds, ref_data, tree, "real")
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    soft, res = gmm_soft_targets(
        y,
        jnp.asarray(ds.gmm.means_, jnp.float32),
        jnp.asarray(ds.gmm.covariances_, jnp.float32),
        jnp.asarray(ds.gmm.weights_, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(soft), ref_b["ydata_bin"].numpy(), atol=5e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=5e-5, rtol=0
    )


def test_bdg_xpbd_generator_q(ref_gen, ref_data, tree, kmeans_file):
    """XPBDGeneratorQ (binDeltaGenerators.py:86-110) — RBF soft bins
    exp(-10 d^2)/sum over the CONVERTED quaternion dictionary (host numpy
    cdist; no sklearn predict, so the plain pickle runs) + soft-center
    residual, vs rbf_soft_targets on our quaternion chain."""
    from multi_modal_regression_tpu.geometry.quaternion import (
        convert_dictionary as our_convert,
    )

    ds = ref_gen.bdg.XPBDGeneratorQ(str(tree), "real", kmeans_file)
    ref_b, ob = _first_batch_pair(ds, ref_data, tree, "real")
    y_q = euler_to_pose(jnp.asarray(ob["euler"]), ydata_type="quaternion")
    # ds.kmeans.cluster_centers_ is already converted by the ctor; recompute
    # from the original pickle to certify our conversion independently
    with open(kmeans_file, "rb") as f:
        raw = pickle.load(f)
    np.testing.assert_allclose(
        np.asarray(our_convert(jnp.asarray(raw.cluster_centers_))),
        ds.kmeans.cluster_centers_, atol=1e-6, rtol=0,
    )
    soft, res = rbf_soft_targets(
        y_q, jnp.asarray(ds.kmeans.cluster_centers_, jnp.float32), gamma=10.0
    )
    np.testing.assert_allclose(
        np.asarray(soft), ref_b["ydata_bin"].numpy(), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=1e-5, rtol=0
    )


def test_bdg_rbd_generator(ref_gen, ref_data, tree, kmeans_file):
    """RBDGenerator (binDeltaGenerators.py:113-139) — per-sample get_R
    rotations, hard bin, SO(3) tangent residual get_y(Rdict^T R) via the
    reference's own numpy loops, vs our batched tangent_residual_targets."""
    ds = ref_gen.bdg.RBDGenerator(str(tree), "real", kmeans_file)
    ref_b, ob = _first_batch_pair(ds, ref_data, tree, "real")
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    centers = jnp.asarray(ds.kmeans.cluster_centers_, jnp.float32)
    assert float(_bin_margins(y, ds.kmeans.cluster_centers_).min()) > 1e-3
    key_R = exp_so3(centers)
    np.testing.assert_allclose(
        np.asarray(key_R), ds.rotations_dict, atol=1e-6, rtol=0
    )
    bins, res, R = tangent_residual_targets(y, centers, key_R)
    np.testing.assert_array_equal(np.asarray(bins), ref_b["ydata_bin"].numpy())
    np.testing.assert_allclose(
        np.asarray(R), ref_b["ydata_rot"].numpy(), atol=2e-4, rtol=0
    )
    ref_res = ref_b["ydata_res"].numpy()
    _assert_angles_bounded(ref_res, lim=3.13)
    np.testing.assert_allclose(np.asarray(res), ref_res, atol=5e-4, rtol=0)


# ---------------------------------------------------------------------------
# ablationFunctions vs the info_suffix='_train_info' index + tunable gamma
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def abl_tree(tree):
    """The pose tree plus `<cls>_train_info.mat` split files holding a
    STRICT SUBSET (first 2 names) of each class's `<cls>_info.mat` — the
    layout ablationFunctions.ImagesAll reads for db_type='real'
    (ablationFunctions.py:27-28), made discriminable from the render index."""
    import scipy.io as spio

    for cls in PASCAL3D_CLASSES:
        full = spio.loadmat(
            str(tree / f"{cls}_info.mat"), squeeze_me=True
        )["image_names"]
        spio.savemat(
            str(tree / f"{cls}_train_info.mat"),
            {"image_names": np.array([str(n) for n in full[:2]],
                                     dtype=object)},
        )
    return tree


def test_ablation_imagesall_train_info(ref_gen, ref_data, abl_tree,
                                        kmeans_file):
    """ablationFunctions.GBDGenerator('real') reads the `_train_info` split
    files — certify against ClassBalancedIndex(info_suffix='_train_info'),
    and that the split is genuinely discriminating vs the full index."""
    ds = ref_gen.abl.GBDGenerator(str(abl_tree), "real", kmeans_file)
    assert len(ds) == 2  # the split files hold 2 names/class (premise)
    assert len(ref_data.ImagesAll(str(abl_tree), "render")) > 2
    ref_b = ref_data.my_collate([ds[0], ds[1]])

    idx = ClassBalancedIndex(str(abl_tree), "real",
                             info_suffix="_train_info")
    loader = BalancedLoader(
        idx, items_per_batch=2, image_size=224, shuffle=False, num_workers=2,
        prefetch_depth=1,
    )
    ob = next(iter(loader))
    np.testing.assert_allclose(
        _our_norm(ob["xdata"]), _ref_np(ref_b["xdata"]), atol=1e-5, rtol=0
    )
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    centers = ds.kmeans.cluster_centers_
    assert float(_bin_margins(y, centers).min()) > 1e-3
    bins, res = hard_bin_targets(y, jnp.asarray(centers, jnp.float32))
    np.testing.assert_array_equal(np.asarray(bins), ref_b["ydata_bin"].numpy())
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=2e-4, rtol=0
    )


def test_ablation_xpbd_tunable_gamma(ref_gen, ref_data, abl_tree,
                                      kmeans_file):
    """ablationFunctions.XPBDGenerator's tunable-gamma RBF targets
    (ablationFunctions.py:128-151; the learnt-gamma relaxed protocol) vs
    rbf_soft_targets at the same gamma."""
    gamma = 2.5
    ds = ref_gen.abl.XPBDGenerator(str(abl_tree), "real", kmeans_file, gamma)
    ref_b = ref_data.my_collate([ds[0], ds[1]])
    idx = ClassBalancedIndex(str(abl_tree), "real",
                             info_suffix="_train_info")
    loader = BalancedLoader(
        idx, items_per_batch=2, image_size=224, shuffle=False, num_workers=2,
        prefetch_depth=1,
    )
    ob = next(iter(loader))
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    soft, res = rbf_soft_targets(
        y, jnp.asarray(ds.kmeans.cluster_centers_, jnp.float32), gamma=gamma
    )
    np.testing.assert_allclose(
        np.asarray(soft), ref_b["ydata_bin"].numpy(), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=1e-5, rtol=0
    )


# ---------------------------------------------------------------------------
# objectnetHelperFunctions TrainImages/TestImages vs our ObjectNet indexes
# ---------------------------------------------------------------------------

OBJECTNET_SUBSET = list(PASCAL3D_CLASSES[:4])


@pytest.fixture()
def onf_cwd(tree, kmeans_file, tmp_path, monkeypatch):
    """objectnetHelperFunctions hard-codes the kmeans pickle at the RELATIVE
    path data/kmeans_dictionary_axis_angle_<dict_size>.pkl
    (objectnetHelperFunctions.py:35,58) — chdir to a scratch dir carrying
    it under dict_size=8. Re-pickled with era predict semantics: TestImages
    predicts f64 get_y outputs against the f32-fit dictionary, which only
    era sklearn upcast (see EraPredictKMeans)."""
    (tmp_path / "data").mkdir()
    _era_pickle(kmeans_file,
                tmp_path / "data" / "kmeans_dictionary_axis_angle_8.pkl")
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_objectnet_trainimages(ref_gen, ref_data, tree, onf_cwd):
    """objectnetHelperFunctions.TrainImages (:23-63) — class-balanced over
    caller-supplied classes, ALWAYS the real tilt sign (ObjectNet trees
    carry no render split), inline kmeans bin+residual — vs
    ClassBalancedIndex over the same class subset + hard_bin_targets."""
    ds = ref_gen.onf.TrainImages(str(tree), OBJECTNET_SUBSET, dict_size=8)
    ref_b = ref_data.my_collate([ds[0], ds[1]])

    idx = ClassBalancedIndex(str(tree), "real", classes=OBJECTNET_SUBSET)
    loader = BalancedLoader(
        idx, items_per_batch=2, image_size=224, shuffle=False, num_workers=2,
        prefetch_depth=1,
    )
    ob = next(iter(loader))
    np.testing.assert_array_equal(
        ref_b["label"].numpy().ravel(), ob["label"]
    )
    np.testing.assert_allclose(
        _our_norm(ob["xdata"]), _ref_np(ref_b["xdata"]), atol=1e-5, rtol=0
    )
    y = euler_to_pose(jnp.asarray(ob["euler"]))
    centers = ds.kmeans.cluster_centers_
    assert float(_bin_margins(y, centers).min()) > 1e-3
    bins, res = hard_bin_targets(y, jnp.asarray(centers, jnp.float32))
    np.testing.assert_array_equal(np.asarray(bins), ref_b["ydata_bin"].numpy())
    np.testing.assert_allclose(
        np.asarray(res), ref_b["ydata_res"].numpy(), atol=2e-4, rtol=0
    )


def test_objectnet_testimages(ref_gen, ref_data, tree, onf_cwd):
    """objectnetHelperFunctions.TestImages (:69-107) — flat class-concat
    stream with per-image kmeans bin+residual — vs FlatTestIndex +
    TestLoader over the same subset."""
    ds = ref_gen.onf.TestImages(str(tree), OBJECTNET_SUBSET, dict_size=8)
    n = len(ds)
    samples = [ds[i] for i in range(n)]
    ref_x = np.stack([_ref_np(s["xdata"][None])[0] for s in samples])
    ref_l = np.array([int(s["label"]) for s in samples])
    ref_bins = np.array([int(s["ydata_bin"]) for s in samples])
    ref_res = np.stack([s["ydata_res"].numpy() for s in samples])

    idx = FlatTestIndex(str(tree), classes=OBJECTNET_SUBSET)
    loader = FlatTestLoader(idx, batch_size=8, image_size=224, num_workers=2)
    xs, ys, ls = [], [], []
    for b in loader:
        v = b["valid"]
        xs.append(b["xdata"][v])
        ys.append(b["euler"][v])
        ls.append(b["label"][v])
    our_x = np.concatenate(xs)
    assert len(our_x) == n
    np.testing.assert_array_equal(np.concatenate(ls), ref_l)
    np.testing.assert_allclose(_our_norm(our_x), ref_x, atol=1e-5, rtol=0)
    y = euler_to_pose(jnp.asarray(np.concatenate(ys)))
    centers = ds.kmeans.cluster_centers_
    assert float(_bin_margins(y, centers).min()) > 1e-3
    bins, res = hard_bin_targets(y, jnp.asarray(centers, jnp.float32))
    np.testing.assert_array_equal(np.asarray(bins), ref_bins)
    np.testing.assert_allclose(np.asarray(res), ref_res, atol=2e-4, rtol=0)
