"""Input-phase-split packed conv (ops/packed.pack_kernel3x3_insplit):
4 summed (2,2,C,4Co) convs == the one-shot dense (3,3,4C,4Co) packed conv
== the logical 3x3 conv, bit-exactly in f32 (integer-valued data — the
established kernel-validation discipline, CLAUDE.md). Also gates the
VLG_PACKED_INSPLIT dispatch in the packed GridNet executor.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_layout_generation_tpu.ops.packed import (
    conv_packed1x2_dense, conv_packed1x2_insplit, conv_packed3x3_dense,
    conv_packed3x3_insplit, pack2x2, pack_kernel3x3, pack_kernel3x3_1x2,
    pack_kernel3x3_1x2_insplit, pack_kernel3x3_insplit, unpack2x2)


def _int(rng, shape, lo=-4, hi=5):
    return jnp.asarray(rng.integers(lo, hi, shape).astype(np.float32))


@pytest.mark.parametrize("ci,co", [(32, 32), (8, 16)])
def test_insplit_exact_vs_dense_and_logical(ci, co):
    rng = np.random.default_rng(0)
    x = _int(rng, (2, 12, 10, 4 * ci))
    w = _int(rng, (3, 3, ci, co), -3, 4)
    b = _int(rng, (co,), -2, 3)

    ref = conv_packed3x3_dense(x, pack_kernel3x3(w), b)
    got = conv_packed3x3_insplit(x, pack_kernel3x3_insplit(w), b)
    assert float(jnp.max(jnp.abs(ref - got))) == 0.0

    logical = jax.lax.conv_general_dilated(
        unpack2x2(x), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    assert float(jnp.max(jnp.abs(pack2x2(logical) - got))) == 0.0


@pytest.mark.parametrize("ci,co", [(32, 32), (8, 16)])
def test_insplit_concat_exact_vs_dense(ci, co):
    from video_layout_generation_tpu.ops.packed import (
        conv_packed3x3_insplit_concat, pack_kernel3x3_insplit_concat)
    rng = np.random.default_rng(5)
    x = _int(rng, (2, 12, 10, 4 * ci))
    w = _int(rng, (3, 3, ci, co), -3, 4)
    b = _int(rng, (co,), -2, 3)
    ref = conv_packed3x3_dense(x, pack_kernel3x3(w), b)
    got = conv_packed3x3_insplit_concat(
        x, pack_kernel3x3_insplit_concat(w), b)
    assert float(jnp.max(jnp.abs(ref - got))) == 0.0


@pytest.mark.parametrize("ci,co", [(64, 64), (8, 16)])
def test_insplit_1x2_concat_exact_vs_dense(ci, co):
    from video_layout_generation_tpu.ops.packed import (
        conv_packed1x2_insplit_concat, pack_kernel3x3_1x2_insplit_concat)
    rng = np.random.default_rng(6)
    x = _int(rng, (2, 10, 12, 2 * ci))
    w = _int(rng, (3, 3, ci, co), -3, 4)
    b = _int(rng, (co,), -2, 3)
    ref = conv_packed1x2_dense(x, pack_kernel3x3_1x2(w), b)
    got = conv_packed1x2_insplit_concat(
        x, pack_kernel3x3_1x2_insplit_concat(w), b)
    assert float(jnp.max(jnp.abs(ref - got))) == 0.0


@pytest.mark.parametrize("mode", ["1", "concat"])
def test_executor_insplit_modes_close(monkeypatch, mode):
    """Both insplit modes drive the full packed executor to the same
    result as dense (f32 accumulation-order noise only)."""
    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)
    model = GridNet(n_channels=8, dtype=jnp.float32,
                    filters_level=(8, 12, 16))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 3, (1, 32, 32, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    monkeypatch.delenv("VLG_PACKED_INSPLIT", raising=False)
    seg0, img0 = make_packed_gridnet_apply(dtype=jnp.float32)(params, x)
    monkeypatch.setenv("VLG_PACKED_INSPLIT", mode)
    seg1, img1 = make_packed_gridnet_apply(dtype=jnp.float32)(params, x)
    np.testing.assert_allclose(np.asarray(seg0), np.asarray(seg1),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               atol=1e-5, rtol=0)


@pytest.mark.parametrize("ci,co", [(64, 64), (8, 16)])
def test_insplit_1x2_exact_vs_dense(ci, co):
    rng = np.random.default_rng(3)
    x = _int(rng, (2, 10, 12, 2 * ci))
    w = _int(rng, (3, 3, ci, co), -3, 4)
    b = _int(rng, (co,), -2, 3)
    ref = conv_packed1x2_dense(x, pack_kernel3x3_1x2(w), b)
    got = conv_packed1x2_insplit(x, pack_kernel3x3_1x2_insplit(w), b)
    assert float(jnp.max(jnp.abs(ref - got))) == 0.0


def test_insplit_1x2_tap_budget():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    total = 0
    for k, _pad in pack_kernel3x3_1x2_insplit(w):
        a = np.asarray(k).reshape(3, 2, 4, 2, 4)       # ky qx ci ex co
        a = a.transpose(0, 1, 3, 2, 4)
        total += int((np.abs(a).sum(axis=(3, 4)) > 0).sum())
    assert total == 2 * 9


def test_insplit_tap_budget():
    """Each split kernel carries exactly the 9 redistributed logical taps
    (the FLOP-accounting claim: 16 dense blocks, 9 nonzero -> 1.78x)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    total = 0
    for k, _pad in pack_kernel3x3_insplit(w):
        a = np.asarray(k).reshape(2, 2, 4, 4, 4)       # qy qx ci eo co
        a = a.transpose(0, 1, 3, 2, 4)                  # qy qx eo ci co
        total += int((np.abs(a).sum(axis=(3, 4)) > 0).sum())
    assert total == 4 * 9  # 9 logical taps per input phase


@pytest.mark.parametrize("packer", ["3x3", "1x2"])
def test_insplit_packers_jit_traceable(packer):
    """The packers must build kernels with traceable ops: eager packing of
    concrete params AND packing inside an enclosing jit (e.g. a jitted
    rollout wrapper re-packs per call) must both work and agree."""
    rng = np.random.default_rng(8)
    w = _int(rng, (3, 3, 8, 16), -3, 4)
    pack = (pack_kernel3x3_insplit if packer == "3x3"
            else pack_kernel3x3_1x2_insplit)
    eager = pack(w)
    jitted = jax.jit(lambda v: [k for k, _ in pack(v)])(w)
    for (ke, _), kj in zip(eager, jitted):
        assert float(jnp.max(jnp.abs(ke - kj))) == 0.0


def test_executor_insplit_dispatch_exact(monkeypatch):
    """make_packed_gridnet_apply under VLG_PACKED_INSPLIT=1 matches the
    default executor bit-for-bit in f32."""
    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.models.fast_gridnet import (
        make_packed_gridnet_apply)
    model = GridNet(n_channels=8, dtype=jnp.float32,
                    filters_level=(8, 12, 16))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 3, (1, 32, 32, 8)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    # dyadic-quantized params: f32 sums stay exact, so any split-vs-dense
    # difference is structural, not accumulation-order noise
    params = jax.tree_util.tree_map(
        lambda p: jnp.round(p * 16.0) / 16.0, params)

    monkeypatch.delenv("VLG_PACKED_INSPLIT", raising=False)
    base = make_packed_gridnet_apply(dtype=jnp.float32)
    seg0, img0 = base(params, x)
    monkeypatch.setenv("VLG_PACKED_INSPLIT", "1")
    seg1, img1 = make_packed_gridnet_apply(dtype=jnp.float32)(params, x)
    # op-level equality is bit-exact (tests above); through the full
    # executor the align-corners stencil's non-dyadic blend weights leave
    # only accumulation-order noise (~1e-7 f32) between the two forms
    np.testing.assert_allclose(np.asarray(seg0), np.asarray(seg1),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               atol=1e-5, rtol=0)
