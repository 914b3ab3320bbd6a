"""Depthwise conv vs torch F.conv2d reference — mirrors the reference's
extension correctness tests (cutlass/examples/19_.../test_correctness.py),
parametrized over square and rectangular kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slak_tpu.ops.depthwise import depthwise_conv2d_xla, large_kernel_conv


def torch_dwconv(x_nhwc, w_hwc, pad):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    c = w_hwc.shape[-1]
    w = torch.from_numpy(np.transpose(w_hwc, (2, 0, 1)))[:, None]  # (C,1,kh,kw)
    y = F.conv2d(x, w, padding=pad, groups=c)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("kh,kw", [(3, 3), (7, 7), (13, 13), (31, 31),
                                   (51, 5), (5, 51), (61, 5)])
def test_dwconv_matches_torch(rng, kh, kw):
    n, h, w, c = 2, 16, 16, 8
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wt = rng.standard_normal((kh, kw, c), dtype=np.float32) * 0.1
    got = np.asarray(depthwise_conv2d_xla(jnp.asarray(x), jnp.asarray(wt)))
    want = torch_dwconv(x, wt, (kh // 2, kw // 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dwconv_grads_match_torch(rng):
    n, h, w, c, k = 2, 12, 12, 4, 7
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wt = rng.standard_normal((k, k, c), dtype=np.float32) * 0.1

    def loss_jax(x_, w_):
        return jnp.sum(depthwise_conv2d_xla(x_, w_) ** 2)

    gx, gw = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(wt))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    wt_t = torch.from_numpy(np.transpose(wt, (2, 0, 1)))[:, None].requires_grad_(True)
    y = F.conv2d(xt, wt_t, padding=k // 2, groups=c)
    (y ** 2).sum().backward()
    gx_t = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))
    gw_t = np.transpose(wt_t.grad.numpy()[:, 0], (1, 2, 0))
    np.testing.assert_allclose(np.asarray(gx), gx_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), gw_t, rtol=1e-4, atol=1e-3)


def test_large_kernel_conv_fuses_branches(rng):
    """sum of (conv * scale + bias) across branches == fused op."""
    n, h, w, c = 2, 10, 10, 4
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    shapes = [(13, 5), (5, 13), (5, 5)]
    ws = [jnp.asarray(rng.standard_normal((kh, kw, c), dtype=np.float32) * 0.1)
          for kh, kw in shapes]
    scales = [jnp.asarray(rng.standard_normal(c, dtype=np.float32))
              for _ in shapes]
    biases = [jnp.asarray(rng.standard_normal(c, dtype=np.float32))
              for _ in shapes]
    fused = large_kernel_conv(jnp.asarray(x), ws, scales, biases, impl="xla")
    want = sum(depthwise_conv2d_xla(jnp.asarray(x), wi) * s + b
               for wi, s, b in zip(ws, scales, biases))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


# --- MXU (banded-matmul) path ------------------------------------------------

from slak_tpu.ops.dwconv_mxu import depthwise_conv2d_mxu, mxu_supported


@pytest.mark.parametrize("kh,kw", [(13, 5), (5, 13), (51, 5), (5, 51),
                                   (9, 9), (61, 5)])
def test_mxu_path_matches_xla(rng, kh, kw):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((kh, kw, 8), dtype=np.float32) * 0.1)
    ref = depthwise_conv2d_xla(x, wt)
    got = depthwise_conv2d_mxu(x, wt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_mxu_path_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 4), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((13, 5, 4), dtype=np.float32) * 0.1)

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) ** 2)

    gx1, gw1 = jax.grad(loss(depthwise_conv2d_xla), (0, 1))(x, wt)
    gx2, gw2 = jax.grad(loss(depthwise_conv2d_mxu), (0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-4, atol=1e-3)


def test_mxu_supported_rules():
    assert mxu_supported((51, 5, 8))
    assert mxu_supported((5, 51, 8))
    assert not mxu_supported((5, 5, 8))    # small stays native
    assert not mxu_supported((7, 7, 8))
    assert not mxu_supported((4, 4, 8))    # even kernels unsupported


# --- grouped (block-diagonal MXU) path ---------------------------------------

from slak_tpu.ops.dwconv_grouped import depthwise_conv2d_grouped


@pytest.mark.parametrize("kh,kw,c", [(13, 5, 8), (5, 13, 24), (51, 5, 124),
                                     (9, 9, 40)])
def test_grouped_path_matches_xla(rng, kh, kw, c):
    """Includes C not divisible by the group width (124, 24, 40)."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((kh, kw, c), dtype=np.float32) * 0.1)
    ref = depthwise_conv2d_xla(x, wt)
    got = depthwise_conv2d_grouped(x, wt, group=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_grouped_path_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 12), dtype=np.float32))
    wt = jnp.asarray(rng.standard_normal((13, 5, 12), dtype=np.float32) * 0.1)

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) ** 2)

    gx1, gw1 = jax.grad(loss(depthwise_conv2d_xla), (0, 1))(x, wt)
    gx2, gw2 = jax.grad(
        loss(lambda x, w: depthwise_conv2d_grouped(x, w, group=8)),
        (0, 1))(x, wt)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-4, atol=1e-3)
