"""Native C++ loader throughput vs PIL / cv2 (host-only benchmark).

The reference's data path decodes PNGs via OpenCV in 4 torch DataLoader
worker processes (src/folder.py:122-135, src/trainer.py:148-152). The
rebuild's native loader (native/vlg_loader.cpp: own zlib PNG decoder +
cv2-semantics resize + C++ thread pool, ctypes GIL-free) replaces that.
This measures single-image and batched decode+resize throughput for the
native loader against PIL (and cv2 when importable) on the same files.

  python tools/bench_native_loader.py [--n 64] [--hw 256] [--src 512]
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


def _write_pngs(root, n, src_hw, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    rgb_paths, gray_paths = [], []
    for i in range(n):
        # structured content (rectangles) so PNG filtering/deflate does
        # real work, as on Cityscapes frames — pure noise would be a
        # worst-case deflate and pure flat a best case
        img = np.zeros((src_hw, src_hw, 3), np.uint8)
        for _ in range(12):
            y, x = rng.integers(0, src_hw - 16, 2)
            h, w = rng.integers(16, src_hw // 2, 2)
            img[y:y + h, x:x + w] = rng.integers(0, 255, 3)
        p = os.path.join(root, f"rgb_{i:04d}.png")
        Image.fromarray(img).save(p)
        rgb_paths.append(p)
        seg = (img[..., 0] // 16).astype(np.uint8)
        p = os.path.join(root, f"seg_{i:04d}.png")
        Image.fromarray(seg, mode="L").save(p)
        gray_paths.append(p)
    return rgb_paths, gray_paths


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=256, help="target resize")
    ap.add_argument("--src", type=int, default=512, help="source PNG size")
    ap.add_argument("--threads", type=int, default=0,
                    help="native pool size (0 = hw default)")
    args = ap.parse_args(argv)

    from video_layout_generation_tpu.io.native_loader import NativeImageLoader

    with tempfile.TemporaryDirectory() as root:
        rgb_paths, gray_paths = _write_pngs(root, args.n, args.src)
        hw = (args.hw, args.hw)
        results = {}

        ld = NativeImageLoader(n_threads=args.threads)
        ld.load_rgb(rgb_paths[0], hw)  # warm
        t0 = time.perf_counter()
        for p in rgb_paths:
            ld.load_rgb(p, hw)
        results["native_single_img_per_s"] = args.n / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        ld.load_rgb_batch(rgb_paths, hw)
        results["native_batch_img_per_s"] = args.n / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        ld.load_gray_batch(gray_paths, hw)
        results["native_batch_gray_per_s"] = args.n / (time.perf_counter() - t0)

        from PIL import Image
        t0 = time.perf_counter()
        for p in rgb_paths:
            im = Image.open(p).convert("RGB").resize(hw, Image.BILINEAR)
            np.asarray(im)
        results["pil_single_img_per_s"] = args.n / (time.perf_counter() - t0)

        try:
            import cv2
            t0 = time.perf_counter()
            for p in rgb_paths:
                im = cv2.imread(p, cv2.IMREAD_COLOR)
                cv2.resize(im, hw, interpolation=cv2.INTER_LINEAR)
            results["cv2_single_img_per_s"] = args.n / (time.perf_counter() - t0)
        except ImportError:
            results["cv2_single_img_per_s"] = None

        results = {k: (round(v, 1) if v else v) for k, v in results.items()}
        results["n"] = args.n
        results["src"] = args.src
        results["target"] = args.hw
        print(json.dumps(results))


if __name__ == "__main__":
    main()
