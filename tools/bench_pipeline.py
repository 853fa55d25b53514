"""Host ingest throughput: PNG tree -> indexer -> native decode -> batches.

Measures the real training data path end to end on the host (no device):
a generated Cityscapes-format tree at production 256px, indexed by
data/index.py, decoded per sample by the native loader inside
CityscapesTriplets, batched by HostLoader workers, packed by
pack_triplet_batch. Reports samples/sec and the device-step-equivalent
batch rate (is the host able to feed the 127.7 ms/step b16 train step?).

  python tools/bench_pipeline.py [--triplets 128] [--hw 256] [--bs 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_tree(root: str, n_frames: int, hw: int, seed=0):
    """One city / one snippet / one contiguous run of n_frames."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    seg_dir = os.path.join(root, "deeplab256_label", "benchcity")
    img_dir = os.path.join(root, "leftImg256", "benchcity")
    os.makedirs(seg_dir)
    os.makedirs(img_dir)
    for t in range(n_frames):
        stem = f"benchcity_{0:06d}_{t:06d}"
        seg = np.zeros((hw, hw), np.uint8)
        img = np.zeros((hw, hw, 3), np.uint8)
        for _ in range(8):  # structured content for realistic deflate work
            y, x = rng.integers(0, hw - 16, 2)
            h, w = rng.integers(16, hw // 2, 2)
            seg[y:y + h, x:x + w] = rng.integers(0, 20)
            img[y:y + h, x:x + w] = rng.integers(0, 255, 3)
        Image.fromarray(seg, mode="L").save(
            os.path.join(seg_dir, f"{stem}_gtFine_myseg_id.png"))
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{stem}_leftImg8bit.png"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--triplets", type=int, default=128)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2,
                    help="first epoch warms caches; last is timed")
    args = ap.parse_args(argv)

    from video_layout_generation_tpu.data.cityscapes import CityscapesTriplets
    from video_layout_generation_tpu.data.pipeline import HostLoader

    n_frames = args.triplets + 7  # L frames -> L-7 stride-3 triplets
    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        _make_tree(root, n_frames, args.hw)
        gen_s = time.perf_counter() - t0

        ds = CityscapesTriplets(root, image_hw=(args.hw, args.hw))
        n = len(ds)
        loader = HostLoader(ds, args.bs, shuffle=True, seed=0,
                            workers=args.workers)
        rates = []
        for epoch in range(args.epochs):
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            batches = 0
            for batch in loader:
                batches += 1
            dt = time.perf_counter() - t0
            rates.append(batches * args.bs / dt)
        out = {"triplets": n, "hw": args.hw, "bs": args.bs,
               "workers": args.workers,
               "samples_per_s": round(rates[-1], 1),
               "epoch_rates": [round(r, 1) for r in rates],
               "tree_gen_s": round(gen_s, 1),
               # 127.7 ms/step at b16 = 125.3 samples/s device demand
               "device_demand_samples_per_s": 125.3,
               "feeds_device": rates[-1] >= 125.3}
        print(json.dumps(out))


if __name__ == "__main__":
    main(argv=None)
