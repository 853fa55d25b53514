"""Cityscapes triplet indexer: contiguity + stride-3 windowing parity with
the reference make_dataset (src/folder.py:14-46)."""

import os

import numpy as np
import pytest

from video_layout_generation_tpu.data.index import (IMG_SUFFIX, SEG_SUFFIX,
                                                    build_triplet_index)


def _make_tree(root, city, snippet, frames):
    seg_dir = os.path.join(root, "deeplab256_label", city)
    img_dir = os.path.join(root, "leftImg256", city)
    os.makedirs(seg_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    for f in frames:
        stem = f"{city}_{snippet:06d}_{f:06d}"
        open(os.path.join(seg_dir, stem + SEG_SUFFIX), "w").close()
        open(os.path.join(img_dir, stem + IMG_SUFFIX), "w").close()


def test_contiguous_run_windowing(tmp_path):
    # run 0..11: reference emits starts range(0, 11-6) = 0..4 -> 5 triplets
    _make_tree(str(tmp_path), "aachen", 0, range(12))
    idx = build_triplet_index(str(tmp_path))
    assert len(idx) == 5
    segs, imgs = idx[0]
    assert segs[0].endswith("aachen_000000_000000" + SEG_SUFFIX)
    assert segs[1].endswith("aachen_000000_000003" + SEG_SUFFIX)
    assert segs[2].endswith("aachen_000000_000006" + SEG_SUFFIX)
    assert imgs[2].endswith("aachen_000000_000006" + IMG_SUFFIX)


def test_gap_splits_runs(tmp_path):
    # frames 0..7 and 20..27: each run of 8 -> starts range(0, 7-6)=1 each
    _make_tree(str(tmp_path), "bochum", 3, list(range(8)) +
               list(range(20, 28)))
    idx = build_triplet_index(str(tmp_path))
    assert len(idx) == 2
    starts = sorted(int(s[0].split("_")[-4]) for s, _ in idx)
    assert starts == [0, 20]


def test_triplet_never_crosses_gap(tmp_path):
    # 0..6 has exactly 7 frames -> range(0, 6-6) is empty -> no triplets
    _make_tree(str(tmp_path), "essen", 1, range(7))
    assert build_triplet_index(str(tmp_path)) == []


def test_multi_snippet_and_city(tmp_path):
    _make_tree(str(tmp_path), "c1", 0, range(12))
    _make_tree(str(tmp_path), "c1", 1, range(12))
    _make_tree(str(tmp_path), "c2", 0, range(12))
    assert len(build_triplet_index(str(tmp_path))) == 15


def test_cityscapes_sequences_windows(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import numpy as np
    root = str(tmp_path)
    seg_dir = os.path.join(root, "deeplab256_label", "x")
    img_dir = os.path.join(root, "leftImg256", "x")
    os.makedirs(seg_dir)
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    for f in range(16):
        stem = f"x_{0:06d}_{f:06d}"
        cv2.imwrite(os.path.join(seg_dir, stem + SEG_SUFFIX),
                    rng.integers(0, 20, (32, 32), np.uint8))
        cv2.imwrite(os.path.join(img_dir, stem + IMG_SUFFIX),
                    rng.integers(0, 256, (32, 32, 3), np.uint8))
    from video_layout_generation_tpu.data import CityscapesSequences
    ds = CityscapesSequences(root, n_frames=5, image_hw=(32, 32))
    imgs, segs = ds.sequence(0, 4)
    assert imgs.shape == (4, 32, 32, 3)
    assert segs.shape == (4, 32, 32) and segs.dtype == np.int32
