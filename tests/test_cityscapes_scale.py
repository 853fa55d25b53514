"""Scaled Cityscapes-tree fixture (VERDICT r1 #8): a multi-city,
multi-snippet PNG tree with >500 triplets driven through the indexer, the
native C++ loader, the HostLoader, and one Trainer epoch. Sample counts are
asserted against the reference windowing formula (src/folder.py:14-46):
every contiguous run of L frames yields L-7 stride-3 triplets."""

import os
import subprocess

import numpy as np
import pytest

from video_layout_generation_tpu.data.cityscapes import CityscapesTriplets
from video_layout_generation_tpu.data.index import build_triplet_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CITIES = ("aachen", "bochum", "zurich")
SNIPPETS = (0, 1, 2, 3)
# two contiguous runs per snippet, separated by a gap
RUNS = ((0, 40), (100, 20))  # (first_frame, length)


def _expected_triplets():
    # reference windowing: range(run[0], run[-1] - 6) -> L - 7 per run
    per_snippet = sum(max(0, length - 7) for _, length in RUNS)
    return len(CITIES) * len(SNIPPETS) * per_snippet


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("cityscapes_scale")
    rng = np.random.default_rng(0)
    for city in CITIES:
        seg_dir = root / "deeplab256_label" / city
        img_dir = root / "leftImg256" / city
        seg_dir.mkdir(parents=True)
        img_dir.mkdir(parents=True)
        for snippet in SNIPPETS:
            for start, length in RUNS:
                for t in range(start, start + length):
                    stem = f"{city}_{snippet:06d}_{t:06d}"
                    seg = rng.integers(0, 20, (24, 32), np.uint8)
                    img = rng.integers(0, 256, (24, 32, 3), np.uint8)
                    cv2.imwrite(str(seg_dir / f"{stem}_gtFine_myseg_id.png"),
                                seg)
                    cv2.imwrite(str(img_dir / f"{stem}_leftImg8bit.png"),
                                img[..., ::-1])
    return str(root)


def test_index_matches_reference_windowing(tree):
    entries = build_triplet_index(tree)
    assert len(entries) == _expected_triplets()
    assert len(entries) >= 500
    # every referenced file exists and triplets are stride-3
    segs, imgs = entries[0]
    for p in segs + imgs:
        assert os.path.exists(p), p
    frames = [int(os.path.basename(p).split("_")[2]) for p in segs]
    assert frames[1] - frames[0] == 3 and frames[2] - frames[1] == 3


def test_dataset_through_native_loader(tree):
    lib = os.path.join(REPO, "native", "libvlg_loader.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                       check=True, capture_output=True)
    ds = CityscapesTriplets(tree, (32, 32))
    assert ds._native is not None, "native loader must be active"
    assert len(ds) == _expected_triplets()
    s = ds[0]
    assert s["img1"].shape == (32, 32, 3) and s["img1"].dtype == np.float32
    assert s["seg3"].shape == (32, 32) and s["seg3"].dtype == np.int32
    assert 0 <= s["seg3"].min() and s["seg3"].max() < 20


def test_trainer_epoch_on_scaled_tree(tree, tmp_path_factory):
    """Full epoch: indexer -> native decode in loader threads -> sharded
    batches -> fused train step -> validation, at >500 real-file samples."""
    from video_layout_generation_tpu.config import Config
    from video_layout_generation_tpu.train.trainer import Trainer

    cfg = Config(
        dataset="cityscape", train_dir=tree, val_dir=tree,
        image_size=(32, 32), batch_size=32, epochs=1, edge=False,
        filters_level=(4, 6, 8), compute_dtype="float32", workers=4,
        print_freq=8, path=str(tmp_path_factory.mktemp("cs_exp")),
        mesh_shape=(1,), rollout_frames=2,
    )
    ds_train = CityscapesTriplets(tree, cfg.image_size)
    ds_val = CityscapesTriplets(tree, cfg.image_size)
    t = Trainer(cfg, dataset_train=ds_train, dataset_val=ds_val)
    assert len(t.train_loader) == _expected_triplets() // cfg.batch_size
    t.set_epoch(0)
    t.train()
    assert t.global_step == len(t.train_loader)
    m = t.validate()
    assert np.isfinite(m["loss"])
