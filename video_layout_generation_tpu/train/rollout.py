"""Autoregressive rollout as ``lax.scan`` — the north-star inference path.

Capability parity with the reference ``generate_sequence``
(src/trainer.py:453-476): starting from two seed frames + layouts, slide a
window of the last two (frame, layout) pairs, predict the next pair, feed it
back; produce ``n_frames`` future frames. The reference loops in Python with
a per-step host sync; here the whole rollout is ONE compiled scan — no host
round-trips, fully fused, batched over N.

Input-contract note (SURVEY.md §2c#5, §3.3): the reference's rollout feeds an
8-channel input to a 10-channel-trained model (a latent bug). We support
both contracts: ``use_edges=True`` recomputes HNED edges on the fed-back
frames inside the scan (matching the training distribution — documented
intent); ``use_edges=False`` reproduces the literal 8-channel layout.

Perf: in edge mode the frozen HNED (VGG16-class trunk) dominates the step
cost. ``edge_scale=k`` (opt-in approximation) runs HNED on a 1/k bilinear
downsample of the frame and upsamples the fused edge map back — ~k^2 fewer
HNED FLOPs; edge maps are smooth, so k=2 is visually indistinguishable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .assemble import (assemble_model_input, denormalize_image,
                       normalize_model_output)


def make_rollout_fn(model_apply: Callable,
                    hned_apply: Optional[Callable] = None,
                    n_frames: int = 8, use_edges: bool = True,
                    jit: bool = True, edge_scale: int = 1):
    """Build ``rollout(params, hned_params, img1, img2, seg1, seg2)``.

    Args (to the built fn):
      img1/img2: (N,H,W,3) ImageNet-normalized seed frames (older first).
      seg1/seg2: (N,H,W,1) float class-id layouts.
    Returns:
      imgs: (N, n_frames, H, W, 3) normalized generated frames,
      segs: (N, n_frames, H, W, 1) float class-id layouts.
    """
    if use_edges and hned_apply is None:
        raise ValueError("use_edges=True requires hned_apply")

    if edge_scale < 1:
        raise ValueError(f"edge_scale must be >= 1, got {edge_scale}")

    def rollout(params, hned_params, img1, img2, seg1, seg2):
        def edge(f):
            img = denormalize_image(f)
            if edge_scale == 1:
                return hned_apply(hned_params, img)[-1]
            h, w = img.shape[1], img.shape[2]
            # HNED's 4 stride-2 pools need >= 16 px on each side; shapes are
            # static under jit so this raises clearly at trace/compile time
            # instead of as an opaque shape error deep inside the scan
            sh, sw = h // edge_scale, w // edge_scale
            if sh < 16 or sw < 16:
                raise ValueError(
                    f"edge_scale={edge_scale} shrinks {h}x{w} frames to "
                    f"{sh}x{sw}; HNED needs at least 16x16 inputs")
            small = resize_bilinear(img, (sh, sw), align_corners=False)
            e = hned_apply(hned_params, small)[-1]
            return resize_bilinear(e, (h, w), align_corners=False)

        if use_edges:
            # edges carried through the scan: e_old(t+1) == e_new(t), so
            # HNED runs once per generated frame instead of twice
            def step(carry, _):
                f_old, f_new, s_old, s_new, e_old, e_new = carry
                x = assemble_model_input(s_old, f_old, f_new, s_new,
                                         e_old, e_new)
                seg_logits, img = model_apply(params, x)
                img_n = normalize_model_output(img)
                seg_next = jnp.argmax(seg_logits, axis=-1)[..., None].astype(
                    jnp.float32)
                e_next = edge(img_n)
                return (f_new, img_n, s_new, seg_next, e_new, e_next), (
                    img_n, seg_next)

            carry0 = (img1, img2, seg1, seg2, edge(img1), edge(img2))
        else:
            def step(carry, _):
                f_old, f_new, s_old, s_new = carry
                x = assemble_model_input(s_old, f_old, f_new, s_new)
                seg_logits, img = model_apply(params, x)
                img_n = normalize_model_output(img)
                seg_next = jnp.argmax(seg_logits, axis=-1)[..., None].astype(
                    jnp.float32)
                return (f_new, img_n, s_new, seg_next), (img_n, seg_next)

            carry0 = (img1, img2, seg1, seg2)

        _, (imgs, segs) = jax.lax.scan(step, carry0, None, length=n_frames)
        # (T, N, ...) -> (N, T, ...)
        return (jnp.moveaxis(imgs, 0, 1), jnp.moveaxis(segs, 0, 1))

    # rollout_jit: tuned scoped-vmem budget, measured +1.9% on the b128
    # edge-mode rollout (tools/bench_edge_rollout.py); plain jit on CPU
    from ..models.fast_gridnet import rollout_jit
    return rollout_jit(rollout) if jit else rollout
