"""Banded Pallas depthwise conv: forward + custom-VJP grads vs the XLA
reference, in interpreter mode (CPU CI). Mirrors the reference extension's
fwd/dgrad/wgrad correctness tests (cutlass/examples/19_.../test_correctness.py)
for the kernel set that replaces backward_data_fp32.cu / backward_filter_fp32.cu."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.ops.depthwise import depthwise_conv2d_xla
from slak_tpu.ops import pallas_banded as pb


# (kh, kw, h, w) chosen so both regimes are exercised: tiny maps take the
# full-2D Toeplitz kernel (use_banded2d), larger maps the 1-D banded kernel.
SHAPES = [(13, 5, 6, 6), (5, 13, 6, 6), (9, 9, 6, 6),          # 2-D
          (51, 5, 10, 12), (5, 51, 10, 12),                    # 2-D, big K
          (51, 5, 16, 16), (5, 51, 16, 16), (13, 13, 24, 24),  # 1-D
          (13, 5, 16, 16)]                                     # 1-D


def test_regime_split():
    # A2 footprint = (H*W)^2 * itemsize (unpadded Toeplitz)
    assert pb.use_banded2d(6, 6, 13, 5, 4)
    assert pb.use_banded2d(10, 12, 51, 5, 4)
    assert not pb.use_banded2d(16, 16, 51, 5, 4)
    # the SLaK-T stage map sizes at bf16: only stage 4 (7x7) -> 2-D
    assert not pb.use_banded2d(56, 56, 51, 5, 2)
    assert not pb.use_banded2d(28, 28, 49, 5, 2)
    assert not pb.use_banded2d(14, 14, 47, 5, 2)
    assert pb.use_banded2d(7, 7, 13, 5, 2)


@pytest.mark.parametrize("kh,kw,h,w", SHAPES)
def test_banded_fwd_matches_xla(rng, kh, kw, h, w):
    n, c = 4, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    got = pb.depthwise_conv2d_banded(x, wt, True)
    want = depthwise_conv2d_xla(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kh,kw,h,w", SHAPES)
def test_banded_grads_match_xla(rng, kh, kw, h, w):
    """Custom VJP (banded dgrad via flipped taps + banded MXU wgrad) vs
    XLA autodiff — the TPU analog of the reference's dgrad/wgrad kernels."""
    n, c = 2, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    # non-symmetric cotangent: sum(y * r) so dy = r exercises real shapes
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    gx, gw = jax.grad(
        lambda x_, w_: jnp.sum(pb.depthwise_conv2d_banded(x_, w_, True) * r),
        argnums=(0, 1))(x, wt)
    gx_ref, gw_ref = jax.grad(
        lambda x_, w_: jnp.sum(depthwise_conv2d_xla(x_, w_) * r),
        argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_banded_batch_blocked_accumulation(rng):
    """Multi-block batch grid: fwd blocks along N; wgrad accumulates
    partial dA across batch blocks into one output block."""
    n, h, w, c, kh, kw = 6, 8, 8, 2, 13, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    xcp = pb._to_cmajor_wpad(x, kw // 2)

    y = pb.dwconv_banded_cmajor(xcp, wt, nb=2, interpret=True)
    want = jnp.transpose(depthwise_conv2d_xla(x, wt), (3, 1, 2, 0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    dy = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    dA = pb.wgrad_banded_cmajor(xcp, dy, kw, nb=2, interpret=True)
    dA1 = pb.wgrad_banded_cmajor(xcp, dy, kw, nb=6, interpret=True)
    np.testing.assert_allclose(np.asarray(dA), np.asarray(dA1),
                               rtol=1e-4, atol=1e-4)
    dw = pb.band_extract(dA, kh)
    gw_ref = jax.grad(
        lambda w_: jnp.sum(depthwise_conv2d_xla(x, w_)
                           * jnp.transpose(dy, (3, 1, 2, 0))))(wt)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_banded_channel_blocked(rng):
    """cb > 1 with C not a multiple of cb: channel padding + blocked grid."""
    n, h, w, c, kh, kw = 4, 8, 8, 5, 13, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    xcp = pb._to_cmajor_wpad(x, kw // 2)
    y = pb.dwconv_banded_cmajor(xcp, wt, nb=4, cb=3, interpret=True)
    want = jnp.transpose(depthwise_conv2d_xla(x, wt), (3, 1, 2, 0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    dy = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    dA = pb.wgrad_banded_cmajor(xcp, dy, kw, nb=2, cb=2, interpret=True)
    dw = pb.band_extract(dA, kh)
    gw_ref = jax.grad(
        lambda w_: jnp.sum(depthwise_conv2d_xla(x, w_)
                           * jnp.transpose(dy, (3, 1, 2, 0))))(wt)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_banded_bf16(rng):
    n, h, w, c, kh, kw = 2, 8, 8, 2, 13, 5
    x32 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    w32 = (rng.standard_normal((kh, kw, c)) * 0.1).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    wt = jnp.asarray(w32, jnp.bfloat16)
    got = pb.depthwise_conv2d_banded(x, wt, True)
    want = depthwise_conv2d_xla(jnp.asarray(x32), jnp.asarray(w32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=5e-2, atol=5e-2)
    gx, gw = jax.grad(
        lambda x_, w_: jnp.sum(
            pb.depthwise_conv2d_banded(x_, w_, True).astype(jnp.float32) ** 2),
        argnums=(0, 1))(x, wt)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16


@pytest.mark.parametrize("kh,kw,h,w,g", [
    (51, 5, 16, 16, 8),    # g = 128//16
    (13, 5, 16, 16, 5),    # g capped at s
    (13, 5, 24, 24, 5),    # g = min(s, 128//24)
    (51, 5, 10, 12, 8),    # non-square map
])
def test_banded_stacked_matches_per_tap(rng, kh, kw, h, w, g):
    """Tap-stacked (M-packed) kernel vs the per-tap kernel and XLA: same
    contract, chunked tap dots + shift-add epilogue."""
    n, c = 4, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    assert pb.stack_group(h, kw) == min(g, 128 // h, kw)
    xcp = pb._to_cmajor_wpad(x, kw // 2)
    got = pb.dwconv_banded_stacked_cmajor(xcp, wt, interpret=True)
    ref = pb.dwconv_banded_cmajor(xcp, wt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    want = jnp.transpose(depthwise_conv2d_xla(x, wt), (3, 1, 2, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_banded_stacked_blocked(rng):
    """Stacked kernel with multi-block batch + channel grids."""
    n, h, w, c, kh, kw = 6, 8, 8, 5, 13, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    xcp = pb._to_cmajor_wpad(x, kw // 2)
    got = pb.dwconv_banded_stacked_cmajor(xcp, wt, nb=2, cb=3,
                                          interpret=True)
    want = jnp.transpose(depthwise_conv2d_xla(x, wt), (3, 1, 2, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_batch_block_gate():
    assert pb.batch_block(64, jnp.bfloat16) is None   # padded by the entry
    assert pb.batch_block(128, jnp.bfloat16) == 128
    assert pb.batch_block(256, jnp.bfloat16) == 256
    assert pb.batch_block(256, jnp.float32) == 128
    assert pb.batch_block(512, jnp.bfloat16) == 256
    assert pb.batch_block(384, jnp.bfloat16) == 128
    assert pb.batch_block(96, jnp.float32) is None


def test_pad_batch_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((5, 3, 3, 2)), jnp.float32)
    xp, n = pb._pad_batch(x)
    assert xp.shape[0] == 128 and n == 5
    np.testing.assert_array_equal(np.asarray(xp[:5]), np.asarray(x))
    assert float(jnp.abs(xp[5:]).max()) == 0.0
