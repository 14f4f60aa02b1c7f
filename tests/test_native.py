"""Native C++ decode library (native/decode.cc via data/native.py).

The contract under test: for every file the native path accepts it must
return BYTE-IDENTICAL pixels to the reference-semantics PIL path
(convert('RGB') + BILINEAR resize — dataGenerators.py:21-23), and every
file it refuses (alpha, 16-bit, missing) must flow through the PIL
fallback so `decode_image`'s output never depends on which path ran.
"""

import numpy as np
import pytest
from PIL import Image

from multi_modal_regression_tpu.data import native
from multi_modal_regression_tpu.data.loader import (
    _decode_image_pil,
    decode_image,
)

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native decode library unavailable (no compiler?)",
)


@pytest.fixture(scope="module")
def png_zoo(tmp_path_factory):
    """PNGs across shapes and color types, plus files the native path
    must refuse."""
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(42)
    supported = []
    for i, (h, w) in enumerate(
        [(48, 48), (100, 77), (33, 129), (224, 224), (300, 500), (17, 17),
         (7, 300), (640, 480)]
    ):
        p = root / f"rgb{i}.png"
        Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).save(p)
        supported.append(p)
    gray = root / "gray.png"
    Image.fromarray(rng.integers(0, 256, (60, 80), np.uint8), "L").save(gray)
    supported.append(gray)
    pal = root / "palette.png"
    Image.fromarray(rng.integers(0, 256, (40, 50, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE
    ).save(pal)
    supported.append(pal)
    rgba = root / "rgba.png"
    Image.fromarray(
        rng.integers(0, 256, (30, 30, 4), np.uint8), "RGBA"
    ).save(rgba)
    deep = root / "gray16.png"
    Image.fromarray(
        rng.integers(0, 65536, (25, 35), np.uint16), "I;16"
    ).save(deep)
    return supported, [rgba, deep]


@pytest.mark.parametrize("size", [224, 32, 100])
def test_native_decode_byte_identical_to_pil(png_zoo, size):
    supported, _ = png_zoo
    for p in supported:
        nat = native.decode_image_native(str(p), size)
        assert nat is not None, p
        np.testing.assert_array_equal(nat, _decode_image_pil(str(p), size))


def test_native_resample_fuzz_byte_exact(tmp_path):
    """Fuzz the Pillow-resample reimplementation: 30 random
    (height, width) -> size combinations, all byte-exact. The fixed-point
    coefficient math (22-bit, Resample.c) must agree on every rounding
    edge, not just the curated shapes above."""
    rng = np.random.default_rng(123)
    for trial in range(30):
        h = int(rng.integers(4, 400))
        w = int(rng.integers(4, 400))
        size = int(rng.integers(8, 300))
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        p = tmp_path / f"f{trial}.png"
        Image.fromarray(arr).save(p)
        nat = native.decode_image_native(str(p), size)
        assert nat is not None
        np.testing.assert_array_equal(
            nat, _decode_image_pil(str(p), size),
            err_msg=f"{h}x{w} -> {size}",
        )


def test_native_refuses_alpha_and_16bit_but_decode_image_matches(png_zoo):
    _, refused = png_zoo
    for p in refused:
        assert native.decode_image_native(str(p), 48) is None
        # the public decode falls back to PIL: output identical either way
        np.testing.assert_array_equal(
            decode_image(str(p), 48), _decode_image_pil(str(p), 48)
        )


def test_native_batch_matches_and_flags_failures(png_zoo, tmp_path):
    supported, refused = png_zoo
    paths = [str(p) for p in supported + refused] + [
        str(tmp_path / "missing.png")
    ]
    res = native.decode_batch_native(paths, 64, threads=4)
    assert res is not None
    out, ok = res
    assert out.shape == (len(paths), 64, 64, 3)
    np.testing.assert_array_equal(
        ok, [True] * len(supported) + [False] * (len(refused) + 1)
    )
    for i, p in enumerate(supported):
        np.testing.assert_array_equal(out[i], _decode_image_pil(str(p), 64))


def test_native_png_encoder_lossless_and_pil_readable(tmp_path):
    """save_png writes PNGs whose pixels round-trip bit-identically (PNG
    is lossless — encoder choice can never change data) and which PIL
    reads back like any other PNG; non-RGB arrays fall back to PIL."""
    from PIL import Image as PILImage

    from multi_modal_regression_tpu.data.native import save_png

    rng = np.random.default_rng(7)
    for h, w in [(48, 48), (33, 129), (300, 200)]:
        arr = rng.integers(0, 256, (h, w, 3), np.uint8)
        p = tmp_path / f"n_{h}x{w}.png"
        save_png(arr, p)
        with PILImage.open(p) as img:
            np.testing.assert_array_equal(np.asarray(img.convert("RGB")), arr)
        # and the native decoder reads its own output
        nat = native.decode_image_native(str(p), w)
        assert nat is not None
    gray = rng.integers(0, 256, (20, 30), np.uint8)
    pg = tmp_path / "gray.png"
    save_png(gray, pg)  # non-RGB shape -> PIL fallback path
    with PILImage.open(pg) as img:
        np.testing.assert_array_equal(np.asarray(img), gray)


def test_mmr_native_0_disables_and_decodes_identically(png_zoo, tmp_path):
    """MMR_NATIVE=0 (the kill switch) must leave decode_image fully
    functional on the pure-PIL path with identical output."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    supported, _ = png_zoo
    p = str(supported[0])
    ref = _decode_image_pil(p, 40)
    out_npy = tmp_path / "out.npy"
    root = Path(__file__).resolve().parent.parent
    script = (
        "import sys; sys.path.insert(0, {root!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from multi_modal_regression_tpu.data import native\n"
        "from multi_modal_regression_tpu.data.loader import decode_image\n"
        "assert not native.available()\n"
        "assert native.decode_image_native({p!r}, 40) is None\n"
        "np.save({out!r}, decode_image({p!r}, 40))\n"
    ).format(root=str(root), p=p, out=str(out_npy))
    env = {**os.environ, "MMR_NATIVE": "0"}
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    np.testing.assert_array_equal(np.load(out_npy), ref)


def test_decode_image_uses_native_path(png_zoo):
    """The public API routes through the native decoder for supported
    files (and its output equals the PIL path bit-for-bit)."""
    supported, _ = png_zoo
    p = str(supported[0])
    np.testing.assert_array_equal(
        decode_image(p, 96), _decode_image_pil(p, 96)
    )
