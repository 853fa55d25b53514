"""Native C++ loader vs cv2/PIL golden parity.

Builds the shared lib if missing (cheap), writes PNGs with cv2, and checks
the native decode+resize matches cv2 semantics bit-for-bit (nearest ids)
and within rounding (bilinear RGB).
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "libvlg_loader.so")


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)
    from video_layout_generation_tpu.io.native_loader import NativeImageLoader
    return NativeImageLoader(n_threads=2)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (37, 53, 3), np.uint8)
    gray = rng.integers(0, 20, (64, 48), np.uint8)
    rgb_p = str(d / "rgb.png")
    gray_p = str(d / "gray.png")
    cv2.imwrite(rgb_p, rgb[..., ::-1])  # cv2 writes BGR; file stores RGB
    cv2.imwrite(gray_p, gray)
    return rgb_p, gray_p, rgb, gray


def test_rgb_decode_resize_matches_cv2(native, pngs):
    cv2 = pytest.importorskip("cv2")
    rgb_p, _, rgb, _ = pngs
    out = native.load_rgb(rgb_p, (16, 24))
    ref = cv2.resize(rgb, dsize=(24, 16),
                     interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255
    np.testing.assert_allclose(out, ref, atol=2.5 / 255)


def test_gray_ids_match_cv2_nearest(native, pngs):
    cv2 = pytest.importorskip("cv2")
    _, gray_p, _, gray = pngs
    out = native.load_gray(gray_p, (16, 16))
    ref = cv2.resize(gray, dsize=(16, 16),
                     interpolation=cv2.INTER_NEAREST).astype(np.int32)
    np.testing.assert_array_equal(out, ref)


def test_identity_decode_is_exact(native, pngs):
    rgb_p, gray_p, rgb, gray = pngs
    out = native.load_rgb(rgb_p, rgb.shape[:2])
    np.testing.assert_allclose(out, rgb.astype(np.float32) / 255, atol=1e-6)
    ids = native.load_gray(gray_p, gray.shape[:2])
    np.testing.assert_array_equal(ids, gray.astype(np.int32))


def test_batch_pool(native, pngs):
    rgb_p, gray_p, _, _ = pngs
    batch = native.load_rgb_batch([rgb_p] * 6, (16, 16))
    assert batch.shape == (6, 16, 16, 3)
    for i in range(1, 6):
        np.testing.assert_array_equal(batch[0], batch[i])
    ids = native.load_gray_batch([gray_p] * 4, (8, 8))
    assert ids.shape == (4, 8, 8)


def test_missing_file_raises(native):
    with pytest.raises(FileNotFoundError):
        native.load_rgb("/nonexistent/x.png", (8, 8))
    with pytest.raises(IOError):
        native.load_rgb_batch(["/nonexistent/x.png"], (8, 8))


def test_native_png_writer_roundtrip(tmp_path):
    """save_png output must decode back bit-exactly (via PIL as the
    independent reader) for RGB and gray."""
    from PIL import Image

    from video_layout_generation_tpu.io.native_loader import NativeImageLoader

    ld = NativeImageLoader(n_threads=1)
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    p = str(tmp_path / "rt_rgb.png")
    ld.save_png(p, rgb)
    np.testing.assert_array_equal(np.asarray(Image.open(p).convert("RGB")),
                                  rgb)
    gray = rng.integers(0, 255, (41, 29)).astype(np.uint8)
    p = str(tmp_path / "rt_gray.png")
    ld.save_png(p, gray)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), gray)


def test_colorized_export_uses_native_writer(tmp_path):
    """save_colorized_png writes a PNG that decodes to the palette colors."""
    from PIL import Image

    from video_layout_generation_tpu.evaluation.export import (
        save_colorized_png)
    from video_layout_generation_tpu.ops.colorize import CITYSCAPES_COLORS

    ids = np.arange(20, dtype=np.int32).reshape(4, 5)
    p = str(tmp_path / "color.png")
    save_colorized_png(p, ids)
    got = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(
        got, CITYSCAPES_COLORS[ids % len(CITYSCAPES_COLORS)])
