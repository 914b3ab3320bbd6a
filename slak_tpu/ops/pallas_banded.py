"""Pallas banded-GEMM depthwise conv — per-channel MXU matmuls with the
batch dimension on the lane axis. Forward, dgrad and wgrad all ride the MXU,
making this the TPU counterpart of the reference's full fwd/dgrad/wgrad
CUDA kernel set (``cutlass/examples/19_large_depthwise_conv2d_torch_extension/
forward_fp32.cu``, ``backward_data_fp32.cu:31-82``,
``backward_filter_fp32.cu:31-82``).

This is the true TPU analog of the reference's implicit-GEMM mapping
("grid.x = channel K, per-channel GEMM of output pixels x input pixels",
``cutlass/include/cutlass/convolution/kernel/implicit_batched_gemm_tn_
dwconv2d.h:222-228``): grid = (channels, batch blocks), and each program
runs the 1-D banded contraction

    out[c, h, w, n] = sum_h2 A[c, j, h, h2] * x[c, h2, w+j, n]    (j < s)

as s MXU dots of (H, H) @ (H, W, N).

The contraction runs over the UNPADDED height: a same-padded conv's padded
rows are zeros, so the (H, Hp = H + K - 1) banded matrix of the textbook
formulation wastes Hp/H of the dot's contraction dim on zero products.
``A[c, j, h, h2] = w[h2 - h + K//2, j, c]`` over the (H, H) real extent is
exact and, since the per-channel dot cost scales with the contraction dim,
1.9x / 2.7x / 4.3x cheaper at SLaK-T stage-1/2/3 map sizes (measured: the
kernels are MXU-issue-bound, time ~ K_dim * N_dim and independent of M).
Only the *width* carries a (small, s//2) halo, for the j-tap slide.

The input lives in C-major layout (C, H, Wp, N) with the batch N on the
128-lane axis, so each channel's operands are contiguous — the thing XLA's
batched ``dot_general`` could not give us (measured 3-13 TFLOPS there).

Backward (the part the reference ships as separate CUDA kernels):
  * dgrad: the transpose of a stride-1 same-padded conv with odd taps is the
    same conv with spatially flipped taps — so dgrad reuses the forward
    kernel with ``w[::-1, ::-1]``. Same cost as the forward.
  * wgrad: dw[k, j, c] = sum_h dA[c, j, h, h + k - K//2] where
    dA[c, j, h, h2] = sum_{w,n} dy[c, h, w, n] * xp[c, h2, w+j, n] is a
    per-channel (H, W*N) @ (W*N, H) MXU dot (contraction over the flattened
    output-pixel*batch axis — Mosaic supports the (W, N) -> (W*N,) lane
    merge only when N % 128 == 0, hence the wgrad batch gate). The band
    extraction is a tiny masked einsum in XLA.

The (s, K) rectangular twin runs through the same kernels with H and W
swapped by the caller. Banded matrices A are built in XLA from the tap
weights each call (cheap gather; weights change every step).

Precision: fp32 operands use ``Precision.HIGHEST`` (6-pass exact fp32 on
the MXU); bf16 operands use the native bf16 MXU path with fp32 accumulation
— matching the reference's fp16 kernels, whose wgrad likewise accumulates
and emits fp32 (``backward_filter_fp16.cu:18``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _precision(dtype):
    return lax.Precision.HIGHEST if dtype == jnp.float32 else None


def batch_block(n: int, dtype) -> Optional[int]:
    """Per-program batch-block size for the banded kernels, or None if the
    batch is not a multiple of 128 (the NHWC entry points then zero-pad the
    batch up to one — see :func:`_pad_batch`).

    Mosaic lowers the kernels' 3-D dots / reshapes by merging (W, nb) into
    the lane axis, which only compiles when nb % 128 == 0 (measured: nb=2
    and nb=64 both fail to lower). nb = 256 @ bf16 / 128 @ fp32 keeps the
    per-program VMEM footprint comfortable at SLaK map sizes."""
    if n % 128 != 0:
        return None
    if jnp.dtype(dtype).itemsize <= 2 and n % 256 == 0:
        return 256
    return 128


def _pad_batch(x: Array, interpret: bool = False):
    """Zero-pad the NHWC batch up to a multiple of 128 (exact: padded rows
    produce padded outputs that are sliced away; they contribute zero to
    wgrad). Returns (padded, original_n). Interpret mode has no lane-block
    constraint, so it skips the padding."""
    n = x.shape[0]
    np_ = -(-n // 128) * 128
    if interpret or np_ == n:
        return x, n
    return jnp.pad(x, ((0, np_ - n), (0, 0), (0, 0), (0, 0))), n


def build_banded(w: Array, H: int) -> Array:
    """(K, s, C) taps -> (C, s, H, H) banded matrices over the unpadded
    height: A[c, j, h, h2] = w[h2 - h + K//2, j, c] for 0 <= h2-h+K//2 < K.
    """
    K = w.shape[0]
    h2 = jnp.arange(H)[None, :]
    h = jnp.arange(H)[:, None]
    k = h2 - h + K // 2
    valid = (k >= 0) & (k < K)
    A = jnp.where(valid[:, :, None, None], w[jnp.clip(k, 0, K - 1)], 0)
    return A.transpose(3, 2, 0, 1)  # (C, s, H, H)


# ---------------------------------------------------------------------------
# forward (also dgrad, via flipped taps)
# ---------------------------------------------------------------------------


def _pick_cb(H: int, Wp: int, nb: int, itemsize: int) -> int:
    """Channels per grid step: pack as many channels per step as a ~2 MB
    input block allows (double-buffered in+out stays well under VMEM)."""
    per_ch = H * Wp * nb * itemsize
    return max(1, min(32, (2 * 1024 * 1024) // per_ch))


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_channels(a: Array, cp: int) -> Array:
    c = a.shape[0]
    if c == cp:
        return a
    return jnp.pad(a, ((0, cp - c),) + ((0, 0),) * (a.ndim - 1))


def _fwd_kernel(a_ref, x_ref, o_ref, *, s: int, W: int, cb: int, prec):
    for i in range(cb):
        acc = jnp.zeros(o_ref.shape[1:], jnp.float32)  # (H, W, nb)
        for j in range(s):
            xs = x_ref[i, :, j:j + W, :]               # (H, W, nb)
            acc += lax.dot_general(
                a_ref[i, j], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o_ref[i] = acc.astype(o_ref.dtype)


def dwconv_banded_cmajor(xc: Array, w: Array, nb: Optional[int] = None,
                         cb: Optional[int] = None,
                         interpret: bool = False) -> Array:
    """xc: (C, H, Wp, N) C-major input, W-padded only (Wp = W + 2*(kw//2),
    height UNPADDED); w: (kh, kw, C) taps with kh the contracted (long)
    axis. Returns (C, H, W, N)."""
    C, H, Wp, N = xc.shape
    kh, s, _ = w.shape
    W = Wp - 2 * (s // 2)
    if nb is None:
        nb = batch_block(N, xc.dtype)
        if nb is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb = N
    assert N % nb == 0, (N, nb)
    if cb is None:
        cb = _pick_cb(H, Wp, nb, jnp.dtype(xc.dtype).itemsize)
    cp = _round_up(C, cb)
    A = _pad_channels(build_banded(w, H).astype(xc.dtype), cp)  # (cp,s,H,H)
    xc = _pad_channels(xc, cp)

    kernel = functools.partial(_fwd_kernel, s=s, W=W, cb=cb,
                               prec=_precision(xc.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, s, H, H), lambda c, b: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, Wp, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, H, W, N), xc.dtype),
        interpret=interpret,
    )(A, xc)
    return out if cp == C else out[:C]


# ---------------------------------------------------------------------------
# full-2D Toeplitz variant (small maps: one MXU dot per channel)
#
# Flattening BOTH spatial dims into a doubly-blocked Toeplitz matrix turns
# the whole conv into a single (H*W, H*W) @ (H*W, nb) dot per channel — no
# padding at all (same zero-row argument as the 1-D band), no in-kernel
# slicing, and symmetric in H/W so rectangular twins need no orientation
# swap.
#
# Dispatch (MEASURED, tools/probe_2d.py, v5e 2026-08-17): the streaming
# model "1-D = min(kh,kw) x-passes vs 2-D = ceil(H*W/128) M-tile passes"
# predicts 2-D wins whenever ceil(H*W/128) < min(kh,kw), but fwd+bwd train
# chains measure 2-D LOSING the moment the Toeplitz matrix needs a second
# 128-row M-tile — stage 3 (14x14, 2 tiles, (47,5)): 1-D 5.92 ms vs 2-D
# 7.45 ms; stage 2 (28x28, 7 tiles, (49,5)): 8.15 vs 30.7. Per-tile grid
# overhead + re-streaming x per M-tile erase the modelled saving. So the
# gate is exactly "one M-tile": H*W <= 128 (stage 4's 7x7, the round-2
# win, where the whole conv is a single MXU dot per channel).
# ---------------------------------------------------------------------------

_A2_BYTES_MAX = 64 * 1024


def use_banded2d(H: int, W: int, kh: int, kw: int, itemsize: int) -> bool:
    hw = H * W
    return (hw <= 128 and 1 < min(kh, kw)
            and hw * hw * itemsize <= _A2_BYTES_MAX)


def build_banded2d(w: Array, H: int, W: int) -> Array:
    """(kh, kw, C) taps -> (C, H*W, H*W) doubly-blocked Toeplitz over the
    unpadded extent:
    A2[c, h*W + w_, h2*W + w2] = w[h2 - h + kh//2, w2 - w_ + kw//2, c]."""
    kh, kw, C = w.shape
    kk = (jnp.arange(H)[None, :] - jnp.arange(H)[:, None]) + kh // 2
    jj = (jnp.arange(W)[None, :] - jnp.arange(W)[:, None]) + kw // 2
    vk = (kk >= 0) & (kk < kh)
    vj = (jj >= 0) & (jj < kw)
    a4 = w[jnp.clip(kk, 0, kh - 1)[:, :, None, None],
           jnp.clip(jj, 0, kw - 1)[None, None, :, :]]   # (H,H2,W,W2,C)
    a4 = jnp.where((vk[:, :, None, None] & vj[None, None])[..., None], a4, 0)
    a4 = a4.transpose(4, 0, 2, 1, 3)                    # (C,H,W,H2,W2)
    return a4.reshape(C, H * W, H * W)


def _fwd2d_kernel(a_ref, x_ref, o_ref, *, cb: int, prec):
    for i in range(cb):
        o_ref[i] = lax.dot_general(
            a_ref[i], x_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(o_ref.dtype)


def _pick_cb2d(hw: int, nb: int, itemsize: int) -> int:
    per_ch = (hw * hw + 2 * hw * nb) * itemsize
    return max(1, min(32, (2 * 1024 * 1024) // per_ch))


def dwconv_banded2d_cmajor(xc: Array, w: Array, nb: Optional[int] = None,
                           cb: Optional[int] = None,
                           interpret: bool = False) -> Array:
    """xc: (C, H, W, N) C-major UNPADDED input; w: (kh, kw, C).
    Returns (C, H, W, N) via one Toeplitz dot per channel."""
    C, H, W, N = xc.shape
    if nb is None:
        nb = batch_block(N, xc.dtype)
        if nb is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb = N
    assert N % nb == 0, (N, nb)
    if cb is None:
        cb = _pick_cb2d(H * W, nb, jnp.dtype(xc.dtype).itemsize)
    cp = _round_up(C, cb)
    A2 = _pad_channels(build_banded2d(w, H, W).astype(xc.dtype), cp)
    xf = _pad_channels(xc.reshape(C, H * W, N), cp)

    kernel = functools.partial(_fwd2d_kernel, cb=cb,
                               prec=_precision(xc.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, H * W, H * W), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H * W, nb), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, H * W, nb), lambda c, b: (c, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, H * W, N), xc.dtype),
        interpret=interpret,
    )(A2, xf)
    return out[:C].reshape(C, H, W, N)


def _wgrad2d_kernel(dy_ref, x_ref, o_ref, *, cb: int, prec):
    b = pl.program_id(1)
    for i in range(cb):
        val = lax.dot_general(dy_ref[i], x_ref[i], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)

        @pl.when(b == 0)
        def _():
            o_ref[i] = val

        @pl.when(b > 0)
        def _():
            o_ref[i] += val


def wgrad_banded2d_cmajor(xc: Array, dy: Array, nb: Optional[int] = None,
                          cb: Optional[int] = None,
                          interpret: bool = False) -> Array:
    """dA2[c, hw, pq] = sum_n dy[c, hw, n] * xc[c, pq, n] — the 2-D
    Toeplitz correlation over the unpadded extent. xc, dy: (C, H, W, N).
    Returns fp32 (C, H*W, H*W), accumulated over batch blocks."""
    C, H, W, N = xc.shape
    if nb is None:
        nb = batch_block(N, xc.dtype)
        if nb is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb = N
    assert N % nb == 0, (N, nb)
    if cb is None:
        cb = _pick_cb2d(H * W, nb, jnp.dtype(xc.dtype).itemsize)
    cp = _round_up(C, cb)
    xf = _pad_channels(xc.reshape(C, H * W, N), cp)
    df = _pad_channels(dy.reshape(C, H * W, N), cp)
    kernel = functools.partial(_wgrad2d_kernel, cb=cb,
                               prec=_precision(xc.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, H * W, nb), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H * W, nb), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, H * W, H * W), lambda c, b: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, H * W, H * W), jnp.float32),
        interpret=interpret,
    )(df, xf)
    return out[:C]


def band_extract2d(dA2: Array, kh: int, kw: int, H: int, W: int) -> Array:
    """(C, H*W, H*W) -> (kh, kw, C) tap grads:
    dw[k, j, c] = sum_{h,w} dA2[c, h*W+w, (h+k-kh//2)*W + (w+j-kw//2)]."""
    C = dA2.shape[0]
    dA5 = dA2.reshape(C, H, W, H, W)
    m1 = (jnp.arange(H)[None, :] - jnp.arange(H)[:, None]) + kh // 2
    M1 = jax.nn.one_hot(m1, kh, dtype=dA2.dtype)        # (H, H2, kh)
    m2 = (jnp.arange(W)[None, :] - jnp.arange(W)[:, None]) + kw // 2
    M2 = jax.nn.one_hot(m2, kw, dtype=dA2.dtype)        # (W, W2, kw)
    e = jnp.einsum("chwpq,hpk->cwqk", dA5, M1,
                   precision=lax.Precision.HIGHEST)
    return jnp.einsum("cwqk,wqj->kjc", e, M2,
                      precision=lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# wgrad
# ---------------------------------------------------------------------------


def _wgrad_kernel(dy_ref, x_ref, o_ref, *, s: int, H: int, W: int,
                  nb: int, cb: int, prec):
    b = pl.program_id(1)
    for i in range(cb):
        dy2 = dy_ref[i].reshape(H, W * nb)
        for j in range(s):
            xs = x_ref[i, :, j:j + W, :].reshape(H, W * nb)
            val = lax.dot_general(dy2, xs, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)

            @pl.when(b == 0)
            def _():
                o_ref[i, j] = val

            @pl.when(b > 0)
            def _():
                o_ref[i, j] += val


def wgrad_banded_cmajor(xc: Array, dy: Array, s: int,
                        nb: Optional[int] = None,
                        cb: Optional[int] = None,
                        interpret: bool = False) -> Array:
    """dA[c, j, h, h2] = sum_{w,n} dy[c,h,w,n] * xc[c,h2,w+j,n].

    xc: (C, H, Wp, N) W-padded input; dy: (C, H, W, N) output cotangent.
    Returns fp32 (C, s, H, H). Requires the per-program batch block to be
    a multiple of 128 (or the whole batch if smaller — interpret/test mode
    only): the in-kernel (W, nb) -> (W*nb,) lane merge needs full lanes."""
    C, H, Wp, N = xc.shape
    _, _, W, _ = dy.shape
    if nb is None:
        nb = batch_block(N, xc.dtype)
        if nb is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb = N
    assert N % nb == 0, (N, nb)
    if cb is None:
        cb = _pick_cb(H, Wp, nb, jnp.dtype(xc.dtype).itemsize)
    cp = _round_up(C, cb)
    xc = _pad_channels(xc, cp)
    dy = _pad_channels(dy, cp)
    kernel = functools.partial(_wgrad_kernel, s=s, H=H, W=W, nb=nb,
                               cb=cb, prec=_precision(xc.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, Wp, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, s, H, H), lambda c, b: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, s, H, H), jnp.float32),
        interpret=interpret,
    )(dy, xc)
    return out if cp == C else out[:C]


def band_extract(dA: Array, K: int) -> Array:
    """(C, s, H, H) correlation matrices -> (K, s, C) tap grads:
    dw[k, j, c] = sum_h dA[c, j, h, h + k - K//2]."""
    C, s, H, _ = dA.shape
    h = jnp.arange(H)[:, None, None]
    h2 = jnp.arange(H)[None, :, None]
    k = jnp.arange(K)[None, None, :]
    M = (h2 - h + K // 2 == k).astype(dA.dtype)         # (H, H2, K)
    return jnp.einsum("cjhq,hqk->kjc", dA, M,
                      precision=lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# NHWC entry point with custom VJP
# ---------------------------------------------------------------------------


def _to_cmajor_wpad(x: Array, pw: int) -> Array:
    """NHWC -> (C, H, W + 2*pw, N), padding the width only (the height is
    contracted unpadded)."""
    xc = jnp.transpose(x, (3, 1, 2, 0))            # (C, H, W, N)
    return jnp.pad(xc, ((0, 0), (0, 0), (pw, pw), (0, 0)))


def _banded_fwd_core(x: Array, w: Array, interpret: bool) -> Array:
    """kh >= kw orientation. x NHWC, w (K, s, C) -> NHWC."""
    _, s, _ = w.shape
    xcp = _to_cmajor_wpad(x, s // 2)
    y = dwconv_banded_cmajor(xcp, w, interpret=interpret)
    return jnp.transpose(y, (3, 1, 2, 0))


def _banded_fwd(x: Array, w: Array, interpret: bool) -> Array:
    x, n = _pad_batch(x, interpret)
    kh, kw, _ = w.shape
    _, H, W, _ = x.shape
    if use_banded2d(H, W, kh, kw, jnp.dtype(x.dtype).itemsize):
        xc = jnp.transpose(x, (3, 1, 2, 0))
        y = dwconv_banded2d_cmajor(xc, w, interpret=interpret)
        y = jnp.transpose(y, (3, 1, 2, 0))
    elif kw > kh:
        y = _banded_fwd_core(jnp.transpose(x, (0, 2, 1, 3)),
                             jnp.transpose(w, (1, 0, 2)), interpret)
        y = jnp.transpose(y, (0, 2, 1, 3))
    else:
        y = _banded_fwd_core(x, w, interpret)
    return y if y.shape[0] == n else y[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv2d_banded(x: Array, w: Array,
                            interpret: bool = False) -> Array:
    """Stride-1 same-padded (k//2 per dim) depthwise conv, banded MXU
    fwd/dgrad/wgrad. x: (N, H, W, C); w: (kh, kw, C), both kh, kw odd.
    The batch must satisfy :func:`batch_block` (the wgrad lane merge also
    needs N % 128 == 0 when compiled — callers gate on that)."""
    return _banded_fwd(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    """Forward that SAVES the C-major operand: the backward reuses it for
    wgrad and derives the cotangent's C-major form once for both dgrad and
    wgrad — 2 fewer full-tensor relayouts per branch backward than
    recomputing them from the NHWC residuals (measured ~1 ms per relayout
    at stage-1 bs128; see the round-3 train profile in ROADMAP.md)."""
    kh, kw, _ = w.shape
    xp, n = _pad_batch(x, interpret)
    _, H, W, _ = xp.shape
    if use_banded2d(H, W, kh, kw, jnp.dtype(x.dtype).itemsize):
        xc = jnp.transpose(xp, (3, 1, 2, 0))             # (C, H, W, Np)
        y = dwconv_banded2d_cmajor(xc, w, interpret=interpret)
        y = jnp.transpose(y, (3, 1, 2, 0))
        return (y if y.shape[0] == n else y[:n]), (xc, w)
    if kw > kh:
        # swapped orientation: (C, W, Hp, Np), contraction along W
        xcs = jnp.pad(jnp.transpose(xp, (3, 2, 1, 0)),
                      ((0, 0), (0, 0), (kh // 2, kh // 2), (0, 0)))
        y = dwconv_banded_cmajor(xcs, jnp.transpose(w, (1, 0, 2)),
                                 interpret=interpret)    # (C, W, H, Np)
        y = jnp.transpose(y, (3, 2, 1, 0))
        return (y if y.shape[0] == n else y[:n]), (xcs, w)
    xcp = _to_cmajor_wpad(xp, kw // 2)                   # (C, H, Wp, Np)
    y = dwconv_banded_cmajor(xcp, w, interpret=interpret)
    y = jnp.transpose(y, (3, 1, 2, 0))
    return (y if y.shape[0] == n else y[:n]), (xcp, w)


def _vjp_bwd(interpret, res, g):
    xc_saved, w = res
    kh, kw, _ = w.shape
    n, H, W, _ = g.shape
    cdt = xc_saved.dtype
    gp, _ = _pad_batch(g.astype(cdt), interpret)
    wf = w[::-1, ::-1, :].astype(cdt)    # flipped taps: exact dgrad
    if use_banded2d(H, W, kh, kw, jnp.dtype(cdt).itemsize):
        gc = jnp.transpose(gp, (3, 1, 2, 0))             # (C, H, W, Np)
        dxc = dwconv_banded2d_cmajor(gc, wf, interpret=interpret)
        dA2 = wgrad_banded2d_cmajor(xc_saved, gc, interpret=interpret)
        dw = band_extract2d(dA2, kh, kw, H, W)
        dx = jnp.transpose(dxc, (3, 1, 2, 0))
    elif kw > kh:
        gc = jnp.transpose(gp, (3, 2, 1, 0))             # (C, W, H, Np)
        gcp = jnp.pad(gc, ((0, 0), (0, 0), (kh // 2, kh // 2), (0, 0)))
        dxc = dwconv_banded_cmajor(gcp, jnp.transpose(wf, (1, 0, 2)),
                                   interpret=interpret)  # (C, W, H, Np)
        dA = wgrad_banded_cmajor(xc_saved, gc, kh, interpret=interpret)
        dw = jnp.transpose(band_extract(dA, kw), (1, 0, 2))
        dx = jnp.transpose(dxc, (3, 2, 1, 0))
    else:
        gc = jnp.transpose(gp, (3, 1, 2, 0))             # (C, H, W, Np)
        gcp = jnp.pad(gc, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)))
        dxc = dwconv_banded_cmajor(gcp, wf, interpret=interpret)
        dA = wgrad_banded_cmajor(xc_saved, gc, kw, interpret=interpret)
        dw = band_extract(dA, kh)
        dx = jnp.transpose(dxc, (3, 1, 2, 0))
    if dx.shape[0] != n:
        dx = dx[:n]
    return dx.astype(cdt), dw.astype(w.dtype)


depthwise_conv2d_banded.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# fused eval pair (LoRA1 + LoRA2 with folded-BN scales)
# ---------------------------------------------------------------------------


def lk_pair_banded(x: Array, w1: Array, w2: Array,
                   scale1: Array = None, scale2: Array = None,
                   interpret: bool = False) -> Array:
    """Decomposed pair LoRA1 (K,s) + LoRA2 (s,K) on NHWC input via two
    C-major banded passes. Per-branch folded-BN scales multiply the tap
    weights (free — they fold into the banded matrices). Returns the NHWC
    sum (biases are the caller's)."""
    x, n0 = _pad_batch(x, interpret)
    N, H, W, C = x.shape
    K, s, _ = w1.shape
    pw = s // 2
    if scale1 is not None:
        w1 = w1 * scale1.astype(w1.dtype)
    if scale2 is not None:
        w2 = w2 * scale2.astype(w2.dtype)

    xc = jnp.transpose(x, (3, 1, 2, 0))                  # (C, H, W, N)
    if use_banded2d(H, W, K, s, jnp.dtype(x.dtype).itemsize):
        # tiny maps: one Toeplitz dot per channel per branch, shared
        # C-major layout, single transpose back
        y1 = dwconv_banded2d_cmajor(xc, w1, interpret=interpret)
        y2 = dwconv_banded2d_cmajor(xc, w2, interpret=interpret)
        out = jnp.transpose(y1 + y2, (3, 1, 2, 0))
        return out if out.shape[0] == n0 else out[:n0]

    # LoRA1: contract along H; W carries the small s-halo
    xc1 = jnp.pad(xc, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    y1 = dwconv_banded_cmajor(xc1, w1, interpret=interpret)  # (C,H,W,N)

    # LoRA2: contract along W -> swap H/W and reuse the kernel
    xc2 = jnp.pad(jnp.transpose(xc, (0, 2, 1, 3)),
                  ((0, 0), (0, 0), (pw, pw), (0, 0)))        # (C, W, Hp', N)
    y2 = dwconv_banded_cmajor(xc2, jnp.transpose(w2, (1, 0, 2)),
                              interpret=interpret)           # (C, W, H, N)
    # both branch outputs transpose straight to NHWC inside one add-fusion
    # (transposing y2 into y1's layout first would cost an extra full-tensor
    # round trip)
    out = (jnp.transpose(y1, (3, 1, 2, 0))
           + jnp.transpose(y2, (3, 2, 1, 0)))                # NHWC
    return out if out.shape[0] == n0 else out[:n0]
