"""Transposed-conv semantics parity with torch.

Pin the exact flax equivalents of the torch upsampling convs used by the
pix2pix generators: ConvTranspose2d(k=4, s=2, p=1) == flax SAME
(models/unet_gen.py) and ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
== flax explicit ((1,2),(1,2)) padding (models/resnet_gen.py) — SAME does
NOT match the k=3 case.

Kernel layout note: flax ConvTranspose kernels are HWIO applied without the
flip torch uses, so the torch OIHW weight maps to HWIO with a spatial flip:
W_flax[h, w, i, o] = W_torch[i, o, H-1-h, W-1-w].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import flax.linen as nn


def _torch_to_flax_trans_kernel(wt: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight: (in, out, kh, kw)
    return np.ascontiguousarray(
        np.transpose(wt[:, :, ::-1, ::-1], (2, 3, 0, 1)))


@pytest.mark.parametrize("k,out_pad,pad", [(3, 1, ((1, 2), (1, 2))),
                                           (4, 0, "SAME")])
def test_convtranspose_stride2_matches_torch(k, out_pad, pad):
    rng = np.random.default_rng(0)
    cin, cout, h = 5, 7, 8
    x = rng.standard_normal((2, h, h, cin)).astype(np.float32)
    wt = rng.standard_normal((cin, cout, k, k)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32) * 0.01

    ref = F.conv_transpose2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(wt), torch.from_numpy(b), stride=2, padding=1,
        output_padding=out_pad).permute(0, 2, 3, 1).numpy()

    m = nn.ConvTranspose(cout, (k, k), strides=(2, 2), padding=pad)
    params = {"params": {
        "kernel": jnp.asarray(_torch_to_flax_trans_kernel(wt)),
        "bias": jnp.asarray(b)}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))

    assert got.shape == ref.shape == (2, 2 * h, 2 * h, cout)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("k", [3, 4])
def test_strided_conv_matches_torch(k):
    """Downsampling convs: torch Conv2d(k, s=2, p=1) == flax explicit
    ((1,1),(1,1)) padding (GridNet down blocks, discriminator ladder)."""
    rng = np.random.default_rng(1)
    cin, cout, h = 5, 6, 16
    x = rng.standard_normal((2, h, h, cin)).astype(np.float32)
    wt = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32) * 0.01

    ref = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                   torch.from_numpy(wt), torch.from_numpy(b), stride=2,
                   padding=1).permute(0, 2, 3, 1).numpy()

    m = nn.Conv(cout, (k, k), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = {"params": {
        "kernel": jnp.asarray(np.transpose(wt, (2, 3, 1, 0))),
        "bias": jnp.asarray(b)}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
