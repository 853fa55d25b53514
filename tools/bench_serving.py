"""Serving request latency: LayoutPredictor end-to-end over the tunnel.

Round-1 measured 17.3 ms for a batch-1 8-frame 256px request (uint8
transfer, device-side pad slice). Re-measures with the round-2 knobs:
tuned scoped-vmem rollout compile (now default in rollout_jit) and the
opt-in nearest upsample.

  python tools/bench_serving.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

HW = 256


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.serving import LayoutPredictor

    model = GridNet(n_channels=8, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, HW, HW, 8), jnp.float32))

    rng = np.random.default_rng(0)
    img = rng.random((1, HW, HW, 3)).astype(np.float32)
    seg = rng.integers(0, 20, (1, HW, HW)).astype(np.int32)

    for up in ("bilinear", "nearest"):
        for batch in (1, 4):
            p = LayoutPredictor("GridNet", params, n_frames=8, batch=batch,
                                quantize_transfer=True, upsample=up)
            frames, layouts = p.predict(img, img, seg, seg)  # compile
            assert frames.shape == (1, 8, HW, HW, 3)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                p.predict(img, img, seg, seg)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000
            print(f"{up} batch={batch}: {ms:.1f} ms/request "
                  f"({8 * 1000 / ms:.0f} fps single-stream)", flush=True)

    # sequential vs pipelined multi-request throughput (same program; the
    # pipeline overlaps request i's fetch with i+1's upload+compute, which
    # is the whole cost on a tunneled device). Same-process back-to-back
    # A/B to control for tunnel weather.
    p = LayoutPredictor("GridNet", params, n_frames=8, batch=1,
                        quantize_transfer=True)
    p.predict(img, img, seg, seg)  # compile
    reqs = [(img, img, seg, seg)] * 8
    for mode in ("sequential", "pipelined", "sequential2", "pipelined2"):
        t0 = time.perf_counter()
        if mode.startswith("sequential"):
            out = [p.predict(*r) for r in reqs]
        else:
            out = list(p.predict_pipelined(iter(reqs), depth=3))
        dt = time.perf_counter() - t0
        assert len(out) == len(reqs)
        print(f"{mode}: {len(reqs)} requests in {dt*1000:.0f} ms "
              f"({dt*1000/len(reqs):.1f} ms/req)", flush=True)


if __name__ == "__main__":
    main()
