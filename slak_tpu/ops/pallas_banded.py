"""Pallas banded-GEMM depthwise conv — per-channel MXU matmuls with the
batch dimension on the lane axis.

This is the true TPU analog of the reference's implicit-GEMM mapping
("grid.x = channel K, per-channel GEMM of output pixels x input pixels",
``cutlass/include/cutlass/convolution/kernel/implicit_batched_gemm_tn_
dwconv2d.h:222-228``): grid = channels, and each program runs the 1-D
banded contraction

    out[c, h, w, n] = sum_hp A[c, j, h, hp] * x[c, hp, w+j, n]    (j < s)

as s MXU dots of (H, Hp) @ (Hp, W, N). The input lives in C-major layout
(C, Hp, Wp, N) with the *batch* N on the 128-lane axis, so each channel's
operands are contiguous — the thing XLA's batched ``dot_general`` could not
give us (measured 3-13 TFLOPS there vs ~MXU rate here).

The (s, K) rectangular twin runs through the same kernel with H and W
swapped by the caller. Banded matrices A are built in XLA from the tap
weights each call (cheap gather; weights change every step).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def build_banded(w: Array, H: int) -> Array:
    """(K, s, C) taps -> (C, s, H, Hp) banded matrices, Hp = H + 2*(K//2).

    A[c, j, h, hp] = w[hp - h, j, c] for 0 <= hp - h < K.
    """
    K = w.shape[0]
    Hp = H + 2 * (K // 2)
    hp = jnp.arange(Hp)[None, :]
    h = jnp.arange(H)[:, None]
    k = hp - h
    valid = (k >= 0) & (k < K)
    A = jnp.where(valid[:, :, None, None], w[jnp.clip(k, 0, K - 1)], 0)
    return A.transpose(3, 2, 0, 1)  # (C, s, H, Hp)


def _kernel(a_ref, x_ref, o_ref, *, s: int, H: int, W: int):
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)  # (H, W, N)
    for j in range(s):
        xs = x_ref[0, :, j:j + W, :]               # (Hp, W, N)
        acc += lax.dot_general(
            a_ref[0, j], xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def dwconv_banded_cmajor(xc: Array, w: Array, interpret: bool = False
                         ) -> Array:
    """xc: (C, Hp, Wp, N) padded C-major input (Hp = H + 2*(kh//2),
    Wp = W + 2*(kw//2)); w: (kh, kw, C) taps with kh the contracted (long)
    axis. Returns (C, H, W, N)."""
    C, Hp, Wp, N = xc.shape
    kh, s, _ = w.shape
    H = Hp - 2 * (kh // 2)
    W = Wp - 2 * (s // 2)
    A = build_banded(w, H).astype(xc.dtype)        # (C, s, H, Hp)

    kernel = functools.partial(_kernel, s=s, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, s, H, Hp), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, N), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, N), lambda c: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W, N), xc.dtype),
        interpret=interpret,
    )(A, xc)


def lk_pair_banded(x: Array, w1: Array, w2: Array,
                   scale1: Array = None, scale2: Array = None,
                   interpret: bool = False) -> Array:
    """Decomposed pair LoRA1 (K,s) + LoRA2 (s,K) on NHWC input via two
    C-major banded passes. Per-branch folded-BN scales multiply the tap
    weights (free — they fold into the banded matrices). Returns the NHWC
    sum (biases are the caller's)."""
    N, H, W, C = x.shape
    K, s, _ = w1.shape
    ph, pw = K // 2, s // 2
    if scale1 is not None:
        w1 = w1 * scale1.astype(w1.dtype)
    if scale2 is not None:
        w2 = w2 * scale2.astype(w2.dtype)

    # LoRA1: contract along H. layout (C, Hp, Wp, N)
    xc = jnp.transpose(x, (3, 1, 2, 0))
    xc1 = jnp.pad(xc, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    y1 = dwconv_banded_cmajor(xc1, w1, interpret=interpret)  # (C,H,W,N)

    # LoRA2: contract along W -> swap H/W and reuse the kernel
    xc2 = jnp.pad(jnp.transpose(xc, (0, 2, 1, 3)),
                  ((0, 0), (ph, ph), (pw, pw), (0, 0)))      # (C, Wp, Hp, N)
    y2 = dwconv_banded_cmajor(xc2, jnp.transpose(w2, (1, 0, 2)),
                              interpret=interpret)           # (C, W, H, N)
    # both branch outputs transpose straight to NHWC inside one add-fusion
    # (transposing y2 into y1's layout first would cost an extra full-tensor
    # round trip)
    return (jnp.transpose(y1, (3, 1, 2, 0))
            + jnp.transpose(y2, (3, 2, 1, 0)))               # NHWC
