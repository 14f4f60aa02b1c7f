"""Data layer tests: naming, index semantics, loaders, on-device targets."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from multi_modal_regression_tpu.data import (
    BalancedLoader,
    ClassBalancedIndex,
    FlatTestIndex,
    TestLoader,
    euler_to_pose,
    gmm_soft_targets,
    hard_bin_targets,
    make_name,
    normalize_images,
    parse_name,
    per_bin_tangent_residuals,
    rbf_soft_targets,
    tangent_residual_targets,
)
from multi_modal_regression_tpu.geometry.so3 import exp_so3
from multi_modal_regression_tpu.tools.synthetic import generate_pose_dataset

CLASSES = ("aeroplane", "bicycle", "boat")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    return generate_pose_dataset(
        root, classes=CLASSES, images_per_class=5, image_size=48, seed=1
    )


def test_parse_name_roundtrip():
    name = make_name("car_2008_000251object2", 123.5, -10.25, 4.0, 3.75)
    p = parse_name(name)
    assert p.prefix == "car_2008_000251object2"  # underscores in id survive
    assert (p.az, p.el, p.ct, p.d) == (123.5, -10.25, 4.0, 3.75)


def test_parse_name_rejects_garbage():
    with pytest.raises(ValueError):
        parse_name("car_a1.0_b2.0_t3.0_d4.0")


def test_class_balanced_index(dataset):
    idx = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    # per-class counts vary: 5, 6, 7 -> epoch length = 7
    assert sorted(idx.num_images.tolist()) == [5, 6, 7]
    assert len(idx) == 7
    paths, labels = idx.item_paths_labels(6)
    assert len(paths) == len(CLASSES)
    np.testing.assert_array_equal(labels, np.arange(len(CLASSES)))
    # modulo cycling: item 6 of a 5-image class is its image 1
    small_c = int(np.argmin(idx.num_images))
    assert idx.image_names[small_c][6 % idx.num_images[small_c]] in paths[small_c]


def test_render_tilt_sign(dataset):
    real = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    render = ClassBalancedIndex(str(dataset), "render", classes=CLASSES)
    er, eg = real.item_euler(0), render.item_euler(0)
    np.testing.assert_allclose(er[:, :2], eg[:, :2])
    np.testing.assert_allclose(er[:, 2], -eg[:, 2])


def test_balanced_loader_batches(dataset):
    idx = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    loader = BalancedLoader(idx, items_per_batch=2, image_size=48, seed=0,
                            num_workers=2)
    assert loader.batch_images == 2 * len(CLASSES)
    batches = list(loader)
    assert len(batches) == len(loader) == 7 // 2
    b = batches[0]
    assert b["xdata"].shape == (6, 48, 48, 3) and b["xdata"].dtype == np.uint8
    assert b["euler"].shape == (6, 3)
    np.testing.assert_array_equal(b["label"], [0, 1, 2, 0, 1, 2])


def test_balanced_loader_euler_matches_filenames(dataset):
    idx = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    loader = BalancedLoader(idx, items_per_batch=1, image_size=48,
                            shuffle=False, num_workers=2)
    b = next(iter(loader))
    for c in range(len(CLASSES)):
        p = parse_name(idx.image_names[c][0])
        np.testing.assert_allclose(b["euler"][c], [p.az, p.el, p.ct], rtol=1e-6)


def test_test_loader_padding(dataset):
    idx = FlatTestIndex(str(dataset), classes=CLASSES)
    n = len(idx)  # 18
    loader = TestLoader(idx, batch_size=8, image_size=48, num_workers=2)
    batches = list(loader)
    assert len(batches) == -(-n // 8)
    assert all(b["xdata"].shape == (8, 48, 48, 3) for b in batches)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == n
    assert not batches[-1]["valid"][-1]


def test_normalize_images_matches_torchvision_formula(rng):
    x = rng.integers(0, 256, (4, 8, 8, 3), np.uint8)
    got = np.asarray(normalize_images(jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = (x.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_euler_to_pose_matches_host_reference(rng):
    """euler -> axis-angle equals the host numpy ZXZ-euler + scipy log map."""
    euler = rng.uniform(-90, 90, (16, 3)).astype(np.float32)
    y = np.asarray(euler_to_pose(jnp.asarray(euler)))
    for i in range(16):
        az, el, ct = np.radians(euler[i].astype(np.float64))
        Ra = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
        Rb = np.array([[1, 0, 0], [0, np.cos(el), -np.sin(el)], [0, np.sin(el), np.cos(el)]])
        Rc = np.array([[np.cos(ct), -np.sin(ct), 0], [np.sin(ct), np.cos(ct), 0], [0, 0, 1]])
        want = ScipyRotation.from_matrix(Rc @ Rb @ Ra).as_rotvec()
        np.testing.assert_allclose(y[i], want, atol=1e-4)


def test_hard_bin_targets_vs_numpy(rng):
    y = rng.standard_normal((32, 3)).astype(np.float32)
    centers = rng.standard_normal((7, 3)).astype(np.float32)
    bins, res = hard_bin_targets(jnp.asarray(y), jnp.asarray(centers))
    d = ((y[:, None] - centers[None]) ** 2).sum(-1)
    want_bins = d.argmin(-1)
    np.testing.assert_array_equal(np.asarray(bins), want_bins)
    np.testing.assert_allclose(np.asarray(res), y - centers[want_bins], rtol=1e-5)


def test_rbf_soft_targets_reference_formula(rng):
    """soft = exp(-10 d^2) normalized; residual vs soft-weighted center
    (dataGenerators.py:156-166)."""
    y = 0.5 * rng.standard_normal((16, 3)).astype(np.float32)
    centers = 0.5 * rng.standard_normal((5, 3)).astype(np.float32)
    soft, res = rbf_soft_targets(jnp.asarray(y), jnp.asarray(centers), gamma=10.0)
    d = ((y[:, None] - centers[None]) ** 2).sum(-1)
    w = np.exp(-10.0 * d)
    w = w / w.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(soft), w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res), y - w @ centers, rtol=1e-4, atol=1e-6)


def test_gmm_soft_targets_vs_sklearn(rng):
    from sklearn.mixture import GaussianMixture

    y = rng.standard_normal((64, 3)).astype(np.float64)
    gm = GaussianMixture(3, covariance_type="full", random_state=0).fit(y)
    soft, res = gmm_soft_targets(
        jnp.asarray(y, jnp.float32),
        jnp.asarray(gm.means_, jnp.float32),
        jnp.asarray(gm.covariances_, jnp.float32),
        jnp.asarray(gm.weights_, jnp.float32),
    )
    want = gm.predict_proba(y)
    np.testing.assert_allclose(np.asarray(soft), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res), y - want @ gm.means_, atol=1e-4)


def test_tangent_residual_roundtrip(rng):
    """R_bin @ exp(residual) must reconstruct the target rotation."""
    y = rng.standard_normal((16, 3)).astype(np.float32)
    y = y / np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1.0) * 2.0
    centers = rng.standard_normal((4, 3)).astype(np.float32)
    key_R = np.asarray(exp_so3(jnp.asarray(centers)))
    bins, res, R = tangent_residual_targets(
        jnp.asarray(y), jnp.asarray(centers), jnp.asarray(key_R)
    )
    recon = key_R[np.asarray(bins)] @ np.asarray(exp_so3(res))
    np.testing.assert_allclose(recon, np.asarray(R), atol=1e-5)


def test_per_bin_tangent_residuals_vs_scipy(rng):
    y = rng.standard_normal((6, 3)).astype(np.float32)
    centers = rng.standard_normal((4, 3)).astype(np.float32)
    key_R = ScipyRotation.from_rotvec(centers.astype(np.float64)).as_matrix()
    got = np.asarray(per_bin_tangent_residuals(jnp.asarray(y), jnp.asarray(key_R, jnp.float32)))
    for i in range(6):
        Ri = ScipyRotation.from_rotvec(y[i].astype(np.float64)).as_matrix()
        for k in range(4):
            want = ScipyRotation.from_matrix(key_R[k].T @ Ri).as_rotvec()
            np.testing.assert_allclose(got[i, k], want, atol=1e-4)


def test_balanced_loader_host_sharding(dataset):
    """Two hosts with the same seed read disjoint batch strides that
    together cover the single-host epoch."""
    def batches(host_count, host_index):
        idx = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
        loader = BalancedLoader(
            idx, items_per_batch=1, image_size=48, seed=5, num_workers=2,
            host_count=host_count, host_index=host_index,
        )
        return [b["euler"] for b in loader]

    single = batches(1, 0)
    h0 = batches(2, 0)
    h1 = batches(2, 1)
    assert len(h0) == len(h1) == len(single) // 2
    for i in range(len(h0)):
        np.testing.assert_array_equal(h0[i], single[2 * i])
        np.testing.assert_array_equal(h1[i], single[2 * i + 1])


def test_multihost_stride_composes_to_global_batch(dataset):
    """The COMPOSED multi-host input path: per-host strided batches,
    concatenated in host order, reproduce the single-host loader with the
    hosts' summed items_per_batch exactly (the global-batch oracle for
    jax.make_array_from_process_local_data assembly)."""
    def loader(ipb, host_count, host_index):
        idx = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
        return BalancedLoader(
            idx, items_per_batch=ipb, image_size=48, seed=5, num_workers=2,
            host_count=host_count, host_index=host_index,
        )

    h0 = list(loader(1, 2, 0))
    h1 = list(loader(1, 2, 1))
    oracle = list(loader(2, 1, 0))
    assert len(h0) == len(h1) == len(oracle)
    for b0, b1, bo in zip(h0, h1, oracle):
        for k in bo:
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), bo[k]
            )


def test_global_batch_from_local_single_process(dataset):
    """global_batch_from_local (the multi-host assembly) in the 1-process
    case: batch-sharded global arrays on the mesh, values intact."""
    import jax
    from multi_modal_regression_tpu.parallel.mesh import make_mesh
    from multi_modal_regression_tpu.parallel.multihost import (
        global_batch_from_local,
        host_info,
    )

    assert host_info() == (1, 0)
    mesh = make_mesh(jax.devices()[:4])
    batch = {
        "xdata": np.arange(8 * 4 * 4 * 3, dtype=np.uint8).reshape(8, 4, 4, 3),
        "label": np.arange(8, dtype=np.int32),
        "odd": np.arange(3, dtype=np.float32),  # doesn't divide: replicated
    }
    out = global_batch_from_local(batch, mesh)
    assert "data" in str(out["xdata"].sharding.spec)
    assert out["xdata"].sharding.shard_shape(out["xdata"].shape)[0] == 2
    assert out["odd"].sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out["xdata"]), batch["xdata"])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])


def test_loader_propagates_worker_errors(dataset, tmp_path):
    """A corrupt image must raise, not silently truncate the epoch."""
    import shutil

    root = tmp_path / "bad"
    shutil.copytree(dataset, root)
    # corrupt one PNG
    victim = next((root / CLASSES[0]).glob("*.png"))
    victim.write_bytes(b"not a png")
    idx = ClassBalancedIndex(str(root), "real", classes=CLASSES)
    loader = BalancedLoader(idx, items_per_batch=1, image_size=48,
                            shuffle=False, num_workers=2)
    with pytest.raises(Exception):
        list(loader)


# ---------------------------------------------------------------------------
# packed crop cache (data/packed.py)
# ---------------------------------------------------------------------------


def test_packed_balanced_loader_matches_png(dataset, tmp_path):
    """PackedBalancedLoader == BalancedLoader bit-for-bit over two epochs
    (same seed -> same shuffles; pixels from the memmap cache instead of
    PNG decodes)."""
    from multi_modal_regression_tpu.data import (
        PackedBalancedLoader,
        pack_index,
    )

    idx_a = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    idx_b = ClassBalancedIndex(str(dataset), "real", classes=CLASSES)
    pack = pack_index(idx_a, tmp_path / "cache", image_size=48, num_workers=2)
    png = BalancedLoader(idx_b, items_per_batch=2, image_size=48, seed=3,
                         num_workers=2)
    packed = PackedBalancedLoader(idx_a, pack, items_per_batch=2, seed=3)
    assert packed.image_size == 48
    for _ in range(2):  # two epochs: covers the per-class reshuffle path
        for bp, bq in zip(packed, png, strict=True):
            np.testing.assert_array_equal(bp["xdata"], bq["xdata"])
            np.testing.assert_allclose(bp["euler"], bq["euler"], rtol=1e-6)
            np.testing.assert_array_equal(bp["label"], bq["label"])


def test_packed_test_loader_matches_png(dataset, tmp_path):
    from multi_modal_regression_tpu.data import PackedTestLoader, pack_index

    idx = FlatTestIndex(str(dataset), classes=CLASSES)
    pack = pack_index(idx, tmp_path / "cache", image_size=48, num_workers=2)
    png = list(TestLoader(idx, batch_size=8, image_size=48, num_workers=2))
    packed = list(PackedTestLoader(idx, pack, batch_size=8))
    for bp, bq in zip(packed, png, strict=True):
        for k in ("xdata", "label", "valid"):
            np.testing.assert_array_equal(bp[k], bq[k])
        np.testing.assert_allclose(bp["euler"], bq["euler"], rtol=1e-6)


def test_pack_index_idempotent_and_stale_detection(tmp_path):
    from PIL import Image

    from multi_modal_regression_tpu.data import pack_index
    from multi_modal_regression_tpu.data.loader import decode_image

    # private tree: this test mutates source images
    tree = generate_pose_dataset(
        tmp_path / "src", classes=CLASSES, images_per_class=3,
        image_size=48, seed=7,
    )
    idx = ClassBalancedIndex(str(tree), "real", classes=CLASSES)
    cache = tmp_path / "cache"
    pack_index(idx, cache, image_size=48, num_workers=2)
    mtimes = {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npy")}
    pack_index(idx, cache, image_size=48, num_workers=2)  # reuses
    assert mtimes == {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npy")}
    # size change invalidates -> repack at the new size
    pack = pack_index(idx, cache, image_size=32, num_workers=2)
    assert pack.image_size == 32
    assert pack.array(CLASSES[0]).shape[1:] == (32, 32, 3)
    # a regenerated image with the SAME name invalidates too (the stat
    # fingerprint catches re-cropped/re-prepped trees; round-4 review)
    victim = sorted((tree / CLASSES[0]).glob("*.png"))[0]
    Image.fromarray(255 - np.array(Image.open(victim))).save(victim)
    pack = pack_index(idx, cache, image_size=32, num_workers=2)
    row = int(pack.rows(CLASSES[0], [victim.stem])[0])
    np.testing.assert_array_equal(
        pack.array(CLASSES[0])[row], decode_image(str(victim), 32)
    )
    # a torn meta.json (crashed pack) repacks instead of raising forever
    (cache / "meta.json").write_text('{"db_path": "trunc')
    pack = pack_index(idx, cache, image_size=32, num_workers=2)
    assert pack.image_size == 32
    assert pack.array(CLASSES[1]).shape[1:] == (32, 32, 3)


def test_pack_index_sweeps_dead_orphans_keeps_live_ones(tmp_path):
    """A crashed packer's old .tmp-/.stale- leftovers are swept on the
    next pack; a FRESH tmp dir (a live concurrent build) survives."""
    import os
    import time as _time

    from multi_modal_regression_tpu.data import pack_index

    tree = generate_pose_dataset(
        tmp_path / "src", classes=CLASSES, images_per_class=3,
        image_size=48, seed=13,
    )
    idx = ClassBalancedIndex(str(tree), "real", classes=CLASSES)
    cache = tmp_path / "cache"
    dead = tmp_path / ".cache.tmp-99999"
    dead.mkdir()
    (dead / "x.npy").write_bytes(b"\0" * 64)
    old = _time.time() - 3600
    os.utime(dead / "x.npy", (old, old))
    os.utime(dead, (old, old))
    stale = tmp_path / ".cache.stale-99998"
    stale.mkdir()
    os.utime(stale, (old, old))
    live = tmp_path / ".cache.tmp-88888"
    live.mkdir()
    (live / "y.npy").write_bytes(b"\0")  # fresh mtime: in-progress build
    pack_index(idx, cache, image_size=32, num_workers=2)
    assert not dead.exists() and not stale.exists()
    assert live.exists()


def test_pack_index_wait_for_builder(tmp_path):
    """wait_for_builder (multi-host etiquette): a non-primary host polls
    while another process's build is visibly active and ADOPTS the
    installed cache instead of duplicating the decode; with nobody
    building and the grace elapsed it builds itself."""
    import os
    import shutil
    import threading
    import time as _time

    from multi_modal_regression_tpu.data import pack_index

    tree = generate_pose_dataset(
        tmp_path / "src", classes=CLASSES, images_per_class=3,
        image_size=48, seed=17,
    )
    idx = ClassBalancedIndex(str(tree), "real", classes=CLASSES)
    donor = tmp_path / "donor"
    pack_index(idx, donor, image_size=32, num_workers=2)
    mtimes = {p.name: p.stat().st_mtime_ns for p in donor.glob("*.npy")}
    cache = tmp_path / "cache"
    fake_builder = tmp_path / ".cache.tmp-999-deadbeef"
    fake_builder.mkdir()
    (fake_builder / "building.npy").write_bytes(b"\0")  # fresh activity
    result = {}
    t = threading.Thread(
        target=lambda: result.update(
            pack=pack_index(
                idx, cache, image_size=32, num_workers=2,
                wait_for_builder=True, wait_grace_s=60,
            )
        )
    )
    t.start()
    _time.sleep(3)
    assert t.is_alive()  # polling, not building
    os.rename(donor, cache)  # the "primary" finishes its install
    shutil.rmtree(fake_builder)
    t.join(60)
    assert not t.is_alive()
    assert result["pack"].cache_dir == cache
    # adopted, not rebuilt: the donor's files are untouched
    assert mtimes == {p.name: p.stat().st_mtime_ns for p in cache.glob("*.npy")}
    # nobody building + zero grace -> build ourselves immediately
    pack2 = pack_index(
        idx, tmp_path / "cache2", image_size=32, num_workers=2,
        wait_for_builder=True, wait_grace_s=0,
    )
    assert pack2.image_size == 32


def test_pack_index_concurrent_processes(tmp_path):
    """Two processes packing the same cache dir concurrently (the
    multi-host --packed-cache auto scenario on a shared filesystem) both
    succeed; the atomic tmp-dir install means neither ever observes a
    partial cache."""
    import subprocess
    import sys
    from pathlib import Path

    ROOT = Path(__file__).resolve().parent.parent
    tree = generate_pose_dataset(
        tmp_path / "src", classes=CLASSES, images_per_class=4,
        image_size=48, seed=11,
    )
    cache = tmp_path / "cache"
    script = (
        "import sys; sys.path.insert(0, {root!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from multi_modal_regression_tpu.data import pack_index\n"
        "from multi_modal_regression_tpu.data.index import ClassBalancedIndex\n"
        "idx = ClassBalancedIndex({tree!r}, 'real', classes={classes!r})\n"
        "pack = pack_index(idx, {cache!r}, image_size=32, num_workers=2)\n"
        "assert pack.image_size == 32\n"
        "assert pack.array({cls!r}).shape[1:] == (32, 32, 3)\n"
        "print('ok')\n"
    ).format(
        root=str(ROOT), tree=str(tree), cache=str(cache),
        classes=tuple(CLASSES), cls=CLASSES[0],
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for _ in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out
    # exactly one installed cache, no leftover tmp/stale dirs
    assert (cache / "meta.json").exists()
    leftovers = [
        d for d in cache.parent.iterdir()
        if d.name.startswith(f".{cache.name}.")
    ]
    assert leftovers == []


def test_packed_flat_loader_matches_png(dataset, tmp_path):
    from multi_modal_regression_tpu.data import (
        FlatLoader,
        PackedFlatLoader,
        pack_index,
    )

    idx = FlatTestIndex(str(dataset), classes=CLASSES)
    pack = pack_index(idx, tmp_path / "cache", image_size=48, num_workers=2)
    png = FlatLoader(idx, batch_size=6, image_size=48, seed=5, num_workers=2)
    packed = PackedFlatLoader(idx, pack, batch_size=6, seed=5)
    for bp, bq in zip(packed, png, strict=True):
        np.testing.assert_array_equal(bp["xdata"], bq["xdata"])
        np.testing.assert_allclose(bp["euler"], bq["euler"], rtol=1e-6)
        np.testing.assert_array_equal(bp["label"], bq["label"])
