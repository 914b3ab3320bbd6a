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


@pytest.mark.parametrize("tmode", ["kernel", "input", "dualout", "dualboth"])
def test_pair_fused_matches_split(rng, tmode):
    """Fused decomposed-pair kernel (one pallas call, in-kernel halos) vs
    the split two-call path and XLA, for every layout-shuffle placement."""
    for (n, h, w, c, K, s) in [(4, 16, 16, 3, 51, 5), (4, 10, 12, 5, 31, 5),
                               (2, 24, 16, 3, 13, 3)]:
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((s, K, c)) * 0.1, jnp.float32)
        s1 = jnp.asarray(rng.standard_normal(c), jnp.float32)
        s2 = jnp.asarray(rng.standard_normal(c), jnp.float32)
        got = pb.lk_pair_fused(x, w1, w2, s1, s2, tmode=tmode,
                               interpret=True)
        want = (depthwise_conv2d_xla(x, w1) * s1
                + depthwise_conv2d_xla(x, w2) * s2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        ref = pb.lk_pair_banded(x, w1, w2, s1, s2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_pair_fused_blocked(rng):
    """Fused pair with explicit multi-block batch + channel grids."""
    n, h, w, c, K, s = 6, 12, 10, 5, 13, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((s, K, c)) * 0.1, jnp.float32)
    xc = jnp.transpose(x, (3, 1, 2, 0))
    want = jnp.transpose(depthwise_conv2d_xla(x, w1)
                         + depthwise_conv2d_xla(x, w2), (3, 1, 2, 0))
    for tmode in ("kernel", "dualboth"):
        got = pb.dwpair_fused_cmajor(xc, w1, w2, nb=2, cb=3, tmode=tmode,
                                     interpret=True)
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


# ---------------------------------------------------------------------------
# conv + fused BN batch statistics (depthwise_conv2d_banded_stats)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kh,kw,h,w", [(51, 5, 16, 16), (5, 51, 16, 16),
                                       (13, 5, 6, 6)])
def test_banded_stats_fwd(rng, kh, kw, h, w):
    """(y, s1, s2) from the stats-fused kernel == conv + XLA reductions,
    in both 1-D orientations and the 2-D tiny-map route."""
    n, c = 4, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    y, s1, s2 = pb.depthwise_conv2d_banded_stats(x, wt, True)
    want = pb.depthwise_conv2d_banded(x, wt, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    yf = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(s1), yf.sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (yf * yf).sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_banded_stats_grads(rng):
    """Grads through a BN-like composite of (y, s1, s2) match the unfused
    composition (conv custom VJP + XLA sums) — verifies the ds1/ds2
    routing dy_eff = dy + ds1 + 2*y*ds2 in the stats VJP."""
    n, h, w, c, kh, kw = 4, 16, 16, 3, 31, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    cnt = n * h * w

    def loss_fused(x, wt):
        y, s1, s2 = pb.depthwise_conv2d_banded_stats(x, wt, True)
        mean = s1 / cnt
        var = s2 / cnt - mean ** 2
        z = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(z * jnp.cos(z))

    def loss_ref(x, wt):
        y = pb.depthwise_conv2d_banded(x, wt, True)
        mean = jnp.mean(y, (0, 1, 2))
        var = jnp.mean(y * y, (0, 1, 2)) - mean ** 2
        z = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(z * jnp.cos(z))

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, wt)
    (lr, gr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_batch_norm_from_sums_matches_batch_norm(rng):
    from slak_tpu.ops.batchnorm import batch_norm, batch_norm_from_sums
    n, h, w, c = 4, 6, 6, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    rm = jnp.asarray(rng.standard_normal(c), jnp.float32)
    rv = jnp.asarray(rng.random(c) + 0.5, jnp.float32)
    want = batch_norm(x, scale, bias, rm, rv, train=True)
    s1 = jnp.sum(x, (0, 1, 2))
    s2 = jnp.sum(x * x, (0, 1, 2))
    got = batch_norm_from_sums(x, s1, s2, n * h * w, scale, bias, rm, rv)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
