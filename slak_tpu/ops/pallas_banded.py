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
# forward + fused BN batch statistics
#
# Train-mode branch BN (batchnorm.py) needs per-channel sum(y) and
# sum(y^2) over (N, H, W) — normally a full extra HBM read of the conv
# output right after the kernel wrote it. The fp32 accumulator is already
# in VMEM at the end of each channel's tap loop, so the kernel emits the
# two reductions as a second output, accumulated across batch grid steps
# exactly like the wgrad kernel's band accumulation (predicated init at
# b == 0; the batch axis is the minor grid axis, so blocks for a fixed
# channel block are revisited consecutively). The reduction runs on the
# CAST output value (bf16 when compute is bf16), keeping the statistics
# bit-comparable to XLA reducing the stored y. Zero-padded batch rows
# produce zero outputs and contribute exactly zero to both sums.
# ---------------------------------------------------------------------------


def _fwd_stats_kernel(a_ref, x_ref, o_ref, st_ref, *, s: int, W: int,
                      cb: int, prec):
    b = pl.program_id(1)
    for i in range(cb):
        acc = jnp.zeros(o_ref.shape[1:], jnp.float32)  # (H, W, nb)
        for j in range(s):
            xs = x_ref[i, :, j:j + W, :]
            acc += lax.dot_general(
                a_ref[i, j], xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        yc = acc.astype(o_ref.dtype)
        o_ref[i] = yc
        yf = yc.astype(jnp.float32)
        val = jnp.stack([jnp.sum(yf, axis=(0, 1)),
                         jnp.sum(yf * yf, axis=(0, 1))])      # (2, nb)

        @pl.when(b == 0)
        def _():
            st_ref[i] = val

        @pl.when(b > 0)
        def _():
            st_ref[i] += val


def dwconv_banded_stats_cmajor(xc: Array, w: Array,
                               nb: Optional[int] = None,
                               cb: Optional[int] = None,
                               interpret: bool = False):
    """:func:`dwconv_banded_cmajor` that also returns the per-channel BN
    batch sums. Returns (out (C, H, W, N), s1 (C,), s2 (C,)) with
    s1 = sum(out) and s2 = sum(out^2) over (H, W, N), fp32."""
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
    A = _pad_channels(build_banded(w, H).astype(xc.dtype), cp)
    xc = _pad_channels(xc, cp)

    kernel = functools.partial(_fwd_stats_kernel, s=s, W=W, cb=cb,
                               prec=_precision(xc.dtype))
    out, st = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, s, H, H), lambda c, b: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, Wp, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, 2, nb), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cp, H, W, N), xc.dtype),
            jax.ShapeDtypeStruct((cp, 2, nb), jnp.float32),
        ],
        interpret=interpret,
    )(A, xc)
    if cp != C:
        out, st = out[:C], st[:C]
    return out, st[:, 0, :].sum(-1), st[:, 1, :].sum(-1)


# ---------------------------------------------------------------------------
# tap-stacked variant: g taps of one channel packed densely along M
#
# Hypothesis (round 3): the per-tap dots are issue-bound at M = H << 128 —
# the dot (H, H) @ (H, W*nb) costs ~contraction_rows x lane_tiles
# regardless of M, so the array's M columns sit (128 - H)/128 idle.
# Packing g = floor(128/H) taps of the SAME channel densely along M —
# A_stack[(t*H + h), h2] = A_t[h, h2] — keeps the contraction at H (no
# FLOP inflation, unlike the round-2 block-diagonal channel packing) and
# cuts the per-channel issue cost from s*H to ceil(s/g)*H rows. The tap
# outputs come back stacked in one (g*H, Wp, nb) product; a VPU shift-add
# epilogue (z[t, :, j:j+W]) re-aligns them.
#
# MEASURED (tools/probe_stacked.py, v5e bs128 bf16 fwd chains,
# 2026-08-17): s1 1.01x, s2 1.10x, s3 1.02x — a wash where the model
# predicted 1.67/2.5/5x, and the deltas sit inside the chain harness's
# ~5 ms floor (tools/probe_floor.py). The per-tap dots are NOT the
# per-call bottleneck at SLaK shapes; kept as an opt-in variant +
# dead-end record, not wired into dispatch.
# ---------------------------------------------------------------------------


def stack_group(H: int, s: int) -> int:
    return max(1, min(s, 128 // H))


def build_banded_stacked(w: Array, H: int, g: int) -> Array:
    """(K, s, C) taps -> (C, nc, g*H, H) stacked banded matrices,
    nc = ceil(s/g); chunk q row (t*H + h) col h2 = w[h2 - h + K//2,
    q*g + t, c] (zero rows for tap indices >= s)."""
    K, s, C = w.shape
    nc = -(-s // g)
    wp = jnp.pad(w, ((0, 0), (0, nc * g - s), (0, 0)))
    A = build_banded(wp, H)                       # (C, nc*g, H, H)
    return A.reshape(C, nc, g * H, H)


def _fwd_stacked_kernel(a_ref, x_ref, o_ref, *, s: int, g: int, W: int,
                        H: int, cb: int, prec):
    nc = a_ref.shape[1]
    for i in range(cb):
        acc = jnp.zeros(o_ref.shape[1:], jnp.float32)      # (H, W, nb)
        for q in range(nc):
            z = lax.dot_general(
                a_ref[i, q], x_ref[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            for t in range(g):
                j = q * g + t
                if j < s:
                    acc += z[t * H:(t + 1) * H, j:j + W, :]
        o_ref[i] = acc.astype(o_ref.dtype)


def dwconv_banded_stacked_cmajor(xc: Array, w: Array,
                                 nb: Optional[int] = None,
                                 cb: Optional[int] = None,
                                 interpret: bool = False) -> Array:
    """Tap-stacked twin of :func:`dwconv_banded_cmajor` (same contract):
    xc (C, H, Wp, N) W-padded C-major, w (kh, kw, C) with kh contracted.
    Returns (C, H, W, N)."""
    C, H, Wp, N = xc.shape
    kh, s, _ = w.shape
    W = Wp - 2 * (s // 2)
    g = stack_group(H, s)
    if nb is None:
        nb = batch_block(N, xc.dtype)
        if nb is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb = N
        else:
            # the (g*H, Wp, nb) fp32 chunk product lives in VMEM scratch;
            # cap the lane block so it stays <= ~4 MB
            while nb > 128 and g * H * Wp * nb * 4 > 4 * 1024 * 1024:
                nb //= 2
    assert N % nb == 0, (N, nb)
    if cb is None:
        per_ch = (H * Wp * nb * jnp.dtype(xc.dtype).itemsize
                  + g * H * Wp * nb * 4)
        cb = max(1, min(32, (6 * 1024 * 1024) // per_ch))
    cp = _round_up(C, cb)
    A = _pad_channels(
        build_banded_stacked(w, H, g).astype(xc.dtype), cp)
    xc = _pad_channels(xc, cp)
    nc = A.shape[1]

    kernel = functools.partial(_fwd_stacked_kernel, s=s, g=g, W=W, H=H,
                               cb=cb, prec=_precision(xc.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, nc, g * H, H), lambda c, b: (c, 0, 0, 0),
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
# fused decomposed-pair kernel: LoRA1 + LoRA2 in ONE pallas call
#
# The round-3 trace (tools/parse_xplane.py on /tmp/prof_r3b_*) showed the
# eval/train step spending as much in LAYOUT GLUE as in conv math: per
# block, the split-call pair costs 2 XLA pads (the W/H halos), 2 C-major
# transposes, 2 separate branch outputs and an add fusion — ~13 full
# HBM passes of the activation vs 6 for a fused call.  This kernel reads
# the UNPADDED C-major block once, builds both halos in VMEM scratch,
# runs both branch orientations back-to-back on the MXU, and writes the
# SUMMED output — no pads, no per-branch tensors, no add pass.
#
# The LoRA2 orientation needs the block transposed to (W, H, nb) so its
# banded dot contracts over dim 0 (contracting over the sublane dim
# measured 2x worse, round 2).  Two modes:
#   * 'kernel': in-kernel jnp.swapaxes of the (H, W, nb) block (VMEM
#     relayout, no extra HBM stream);
#   * 'input': the caller passes a second, XLA-transposed stream (one
#     extra HBM read, zero in-kernel shuffle work).
# Both are exact; dispatch picks the measured winner (see lk_pair_fused).
# ---------------------------------------------------------------------------


def _pair_body(a1_ref, a2_ref, o_ref, xp_ref, xq_ref, i, *,
               s, H, W, prec, cdt):
    """Shared per-channel pair math once the halo scratches hold x (xp,
    H-major) and x^T (xq, W-major). Branch 2 runs first so only ONE fp32
    accumulator is ever live (its result is cast to the compute dtype
    before the swap — bitwise the same as the split path, which casts
    each branch before the XLA add)."""
    acc2 = jnp.zeros((W, H, xq_ref.shape[-1]), jnp.float32)
    for j in range(s):
        acc2 += lax.dot_general(
            a2_ref[i, j], xq_ref[:, j:j + H, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    y2 = jnp.swapaxes(acc2.astype(cdt), 0, 1)           # (H, W, nb) bf16
    acc = jnp.zeros((H, W, xp_ref.shape[-1]), jnp.float32)
    for j in range(s):
        acc += lax.dot_general(
            a1_ref[i, j], xp_ref[:, j:j + W, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    o_ref[i] = acc.astype(o_ref.dtype) + y2


def _pair_kernel(a1_ref, a2_ref, x_ref, o_ref, xp_ref, xq_ref, *,
                 s: int, H: int, W: int, cb: int, prec):
    ph = s // 2
    nb = x_ref.shape[-1]
    cdt = x_ref.dtype
    # halo columns stay zero across channel iterations; clear once per step
    xp_ref[:, :ph, :] = jnp.zeros((H, ph, nb), cdt)
    xp_ref[:, ph + W:, :] = jnp.zeros((H, ph, nb), cdt)
    xq_ref[:, :ph, :] = jnp.zeros((W, ph, nb), cdt)
    xq_ref[:, ph + H:, :] = jnp.zeros((W, ph, nb), cdt)
    for i in range(cb):
        x = x_ref[i]                                    # (H, W, nb)
        xp_ref[:, ph:ph + W, :] = x
        xq_ref[:, ph:ph + H, :] = jnp.swapaxes(x, 0, 1)
        _pair_body(a1_ref, a2_ref, o_ref, xp_ref, xq_ref, i,
                   s=s, H=H, W=W, prec=prec, cdt=cdt)


def _pair_kernel_dualin(a1_ref, a2_ref, x_ref, xt_ref, o_ref,
                        xp_ref, xq_ref, *, s, H, W, cb, prec):
    ph = s // 2
    nb = x_ref.shape[-1]
    cdt = x_ref.dtype
    xp_ref[:, :ph, :] = jnp.zeros((H, ph, nb), cdt)
    xp_ref[:, ph + W:, :] = jnp.zeros((H, ph, nb), cdt)
    xq_ref[:, :ph, :] = jnp.zeros((W, ph, nb), cdt)
    xq_ref[:, ph + H:, :] = jnp.zeros((W, ph, nb), cdt)
    for i in range(cb):
        xp_ref[:, ph:ph + W, :] = x_ref[i]
        xq_ref[:, ph:ph + H, :] = xt_ref[i]
        _pair_body(a1_ref, a2_ref, o_ref, xp_ref, xq_ref, i,
                   s=s, H=H, W=W, prec=prec, cdt=cdt)


def _pair_kernel_dualout(a1_ref, a2_ref, x_ref, o1_ref, o2_ref,
                         xp_ref, xq_ref, *, s, H, W, cb, prec):
    """No in-kernel shuffles at all: branch 2 is written in its natural
    transposed layout (cb, W, H, nb) and XLA's add-transpose fusion
    aligns the two outputs (the same pass the split path already pays,
    minus its two pads and duplicate x stream)."""
    ph = s // 2
    nb = x_ref.shape[-1]
    cdt = x_ref.dtype
    xp_ref[:, :ph, :] = jnp.zeros((H, ph, nb), cdt)
    xp_ref[:, ph + W:, :] = jnp.zeros((H, ph, nb), cdt)
    xq_ref[:, :ph, :] = jnp.zeros((W, ph, nb), cdt)
    xq_ref[:, ph + H:, :] = jnp.zeros((W, ph, nb), cdt)
    for i in range(cb):
        x = x_ref[i]
        xp_ref[:, ph:ph + W, :] = x
        xq_ref[:, ph:ph + H, :] = jnp.swapaxes(x, 0, 1)
        acc = jnp.zeros((H, W, nb), jnp.float32)
        for j in range(s):
            acc += lax.dot_general(
                a1_ref[i, j], xp_ref[:, j:j + W, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o1_ref[i] = acc.astype(o1_ref.dtype)
        acc2 = jnp.zeros((W, H, nb), jnp.float32)
        for j in range(s):
            acc2 += lax.dot_general(
                a2_ref[i, j], xq_ref[:, j:j + H, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o2_ref[i] = acc2.astype(o2_ref.dtype)


def _pair_kernel_dualin_dualout(a1_ref, a2_ref, x_ref, xt_ref,
                                o1_ref, o2_ref, xp_ref, xq_ref, *,
                                s, H, W, cb, prec):
    """Zero in-kernel shuffles: both orientations streamed in, both
    branch outputs written in their natural layouts."""
    ph = s // 2
    nb = x_ref.shape[-1]
    cdt = x_ref.dtype
    xp_ref[:, :ph, :] = jnp.zeros((H, ph, nb), cdt)
    xp_ref[:, ph + W:, :] = jnp.zeros((H, ph, nb), cdt)
    xq_ref[:, :ph, :] = jnp.zeros((W, ph, nb), cdt)
    xq_ref[:, ph + H:, :] = jnp.zeros((W, ph, nb), cdt)
    for i in range(cb):
        xp_ref[:, ph:ph + W, :] = x_ref[i]
        xq_ref[:, ph:ph + H, :] = xt_ref[i]
        acc = jnp.zeros((H, W, nb), jnp.float32)
        for j in range(s):
            acc += lax.dot_general(
                a1_ref[i, j], xp_ref[:, j:j + W, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o1_ref[i] = acc.astype(o1_ref.dtype)
        acc2 = jnp.zeros((W, H, nb), jnp.float32)
        for j in range(s):
            acc2 += lax.dot_general(
                a2_ref[i, j], xq_ref[:, j:j + H, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        o2_ref[i] = acc2.astype(o2_ref.dtype)


# tmode -> (kernel fn, dual input stream?, dual output stream?)
_PAIR_MODES = {
    "kernel":   (_pair_kernel,                False, False),
    "input":    (_pair_kernel_dualin,         True,  False),
    "dualout":  (_pair_kernel_dualout,        False, True),
    "dualboth": (_pair_kernel_dualin_dualout, True,  True),
}


def _pick_nb_cb_pair(H: int, W: int, s: int, N: int, itemsize: int,
                     in_streams: int, out_streams: int):
    """(nb, cb) for the pair kernels under a ~13 MB VMEM budget: in/out
    blocks (and the A1/A2 weight blocks) double-buffer per channel
    block; the halo scratches, the single live fp32 accumulator and the
    compute-dtype y2 temp are shared across the channel loop."""
    ph = s // 2
    streams = in_streams + out_streams
    nb = batch_block(N, jnp.bfloat16 if itemsize == 2 else jnp.float32)
    nb = nb or N
    # nb = 256 trips a Mosaic compiler crash in these kernels (remote
    # tpu_compile_helper exit 1 at model shapes, 2026-08-17) and a 128-lane
    # block fills the lanes anyway — cap and grid over batch instead.
    nb = min(nb, 128)
    while True:
        fixed = ((H * (W + 2 * ph) + W * (H + 2 * ph)) * nb * itemsize
                 + 4 * H * W * nb + H * W * nb * itemsize)
        per_ch = (2 * streams * H * W * nb * itemsize
                  + 2 * s * (H * H + W * W) * itemsize)
        cb = (13 * 1024 * 1024 - fixed) // max(per_ch, 1)
        if cb >= 1 or nb <= 128:
            return nb, max(1, min(32, int(cb)))
        nb //= 2


def dwpair_fused_cmajor(xc: Array, w1: Array, w2: Array,
                        nb: Optional[int] = None, cb: Optional[int] = None,
                        tmode: str = "kernel",
                        interpret: bool = False,
                        xq: Optional[Array] = None,
                        sum_out: bool = True):
    """Fused decomposed pair on an UNPADDED C-major block.

    xc: (C, H, W, N); w1: (K, s, C) contracting along H (s taps along W);
    w2: (s, K, C) contracting along W (s taps along H). Returns
    (C, H, W, N) = dwconv(x, w1) + dwconv(x, w2), both stride-1
    same-padded (k//2 per dim, matching forward_fp32.cu:140-144).

    ``tmode`` picks where the two layout shuffles happen (see the block
    comment above): 'kernel' = both in-kernel (x swap + y2 swap);
    'input' = a second XLA-transposed x stream, y2 swapped in-kernel;
    'dualout' = x swapped in-kernel, branch-2 output written transposed
    and add-transposed by XLA; 'dualboth' = zero in-kernel shuffles
    (dual input stream AND dual output).

    ``xq``: caller-provided (C, W, H, N) orientation of x for the dual-in
    modes (the dual-resident eval stage keeps both orientations live, so
    no transpose is needed here). ``sum_out=False`` with a dual-out mode
    returns the raw pair ``(y1 (C,H,W,N), y2 (C,W,H,N))`` unsummed — the
    dual-resident MLP kernel adds them tile-local via its grid indexing.
    """
    C, H, W, N = xc.shape
    K, s, _ = w1.shape
    assert w2.shape[0] == s and w2.shape[1] == K
    kern, dual_in, dual_out = _PAIR_MODES[tmode]
    if nb is None or cb is None:
        if batch_block(N, xc.dtype) is None:
            assert interpret, "compiled banded kernels need batch % 128 == 0"
            nb, cb = N, 1
        else:
            nb, cb = _pick_nb_cb_pair(H, W, s, N,
                                      jnp.dtype(xc.dtype).itemsize,
                                      in_streams=2 if dual_in else 1,
                                      out_streams=2 if dual_out else 1)
    assert N % nb == 0, (N, nb)
    cp = _round_up(C, cb)
    A1 = _pad_channels(build_banded(w1, H).astype(xc.dtype), cp)
    A2 = _pad_channels(
        build_banded(jnp.transpose(w2, (1, 0, 2)), W).astype(xc.dtype), cp)
    xcp = _pad_channels(xc, cp)
    ph = s // 2

    scratch = [
        pltpu.VMEM((H, W + 2 * ph, nb), xcp.dtype),
        pltpu.VMEM((W, H + 2 * ph, nb), xcp.dtype),
    ]
    common = dict(s=s, H=H, W=W, cb=cb, prec=_precision(xcp.dtype))
    in_specs = [
        pl.BlockSpec((cb, s, H, H), lambda c, b: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cb, s, W, W), lambda c, b: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                     memory_space=pltpu.VMEM),
    ]
    args = [A1, A2, xcp]
    if dual_in:
        xt = (_pad_channels(xq, cp) if xq is not None
              else jnp.transpose(xcp, (0, 2, 1, 3)))  # (cp, W, H, N)
        in_specs.append(
            pl.BlockSpec((cb, W, H, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM))
        args.append(xt)
    out_spec1 = pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                             memory_space=pltpu.VMEM)
    if dual_out:
        out_specs = [out_spec1,
                     pl.BlockSpec((cb, W, H, nb), lambda c, b: (c, 0, 0, b),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((cp, H, W, N), xc.dtype),
                     jax.ShapeDtypeStruct((cp, W, H, N), xc.dtype)]
    else:
        out_specs = out_spec1
        out_shape = jax.ShapeDtypeStruct((cp, H, W, N), xc.dtype)
    out = pl.pallas_call(
        functools.partial(kern, **common),
        grid=(cp // cb, N // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # Mosaic's default 16M scoped-vmem stack cap rejects these kernels
        # at stage-1/2 shapes (17.2-18.1M measured: the halo scratches +
        # swap temporaries on top of the blocks); the physical VMEM is
        # 128M, so raise the cap rather than shrink cb below the MXU
        # sweet spot.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if dual_out:
        if not sum_out:
            y1, y2 = out
            return ((y1, y2) if cp == C else (y1[:C], y2[:C]))
        # XLA's add-transpose fusion aligns the branch-2 output — the
        # same pass the split path pays, minus its pads + extra x stream.
        out = out[0] + jnp.swapaxes(out[1], 1, 2)
    return out if cp == C else out[:C]


def lk_pair_fused(x: Array, w1: Array, w2: Array,
                  scale1: Array = None, scale2: Array = None,
                  tmode: str = "kernel",
                  interpret: bool = False) -> Array:
    """NHWC entry for the fused pair: one pallas call, no XLA pads, one
    summed output. Same contract as :func:`lk_pair_banded`."""
    x, n0 = _pad_batch(x, interpret)
    if scale1 is not None:
        w1 = w1 * scale1.astype(w1.dtype)
    if scale2 is not None:
        w2 = w2 * scale2.astype(w2.dtype)
    xc = jnp.transpose(x, (3, 1, 2, 0))              # (C, H, W, N)
    y = dwpair_fused_cmajor(xc, w1, w2, tmode=tmode, interpret=interpret)
    out = jnp.transpose(y, (3, 1, 2, 0))
    return out if out.shape[0] == n0 else out[:n0]


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
# conv + fused BN batch statistics, with custom VJP
# ---------------------------------------------------------------------------


def _xla_stats(y: Array):
    yf = y.astype(jnp.float32)
    return jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv2d_banded_stats(x: Array, w: Array,
                                  interpret: bool = False):
    """:func:`depthwise_conv2d_banded` that also returns the per-channel
    BN batch sums (s1, s2) = (sum(y), sum(y^2)) over (N, H, W), fp32 —
    fused into the conv kernel's epilogue so train-mode BN skips its
    statistics read of y (one full HBM pass of the activation per branch
    per step). The 2-D tiny-map route computes the sums in XLA (the maps
    are small enough that the pass is negligible there)."""
    y = _banded_fwd(x, w, interpret)
    return (y,) + _xla_stats(y)


def _vjp_stats_fwd(x, w, interpret):
    """Mirror of :func:`_vjp_fwd` using the stats-emitting forward kernel;
    additionally saves y (the backward's dy_eff needs it — see below)."""
    kh, kw, _ = w.shape
    xp, n = _pad_batch(x, interpret)
    _, H, W, _ = xp.shape
    if use_banded2d(H, W, kh, kw, jnp.dtype(x.dtype).itemsize):
        xc = jnp.transpose(xp, (3, 1, 2, 0))
        y = dwconv_banded2d_cmajor(xc, w, interpret=interpret)
        y = jnp.transpose(y, (3, 1, 2, 0))
        if y.shape[0] != n:
            y = y[:n]
        s1, s2 = _xla_stats(y)
        return (y, s1, s2), (xc, w, y)
    if kw > kh:
        xcs = jnp.pad(jnp.transpose(xp, (3, 2, 1, 0)),
                      ((0, 0), (0, 0), (kh // 2, kh // 2), (0, 0)))
        yc, s1, s2 = dwconv_banded_stats_cmajor(
            xcs, jnp.transpose(w, (1, 0, 2)), interpret=interpret)
        y = jnp.transpose(yc, (3, 2, 1, 0))
        if y.shape[0] != n:
            y = y[:n]
        return (y, s1, s2), (xcs, w, y)
    xcp = _to_cmajor_wpad(xp, kw // 2)
    yc, s1, s2 = dwconv_banded_stats_cmajor(xcp, w, interpret=interpret)
    y = jnp.transpose(yc, (3, 1, 2, 0))
    if y.shape[0] != n:
        y = y[:n]
    return (y, s1, s2), (xcp, w, y)


def _vjp_stats_bwd(interpret, res, cot):
    """(dy, ds1, ds2) -> (dx, dw): the sums' cotangents fold into an
    effective output cotangent dy_eff = dy + ds1[c] + 2*y*ds2[c] (from
    d sum(y)/dy = 1 and d sum(y^2)/dy = 2y), then the standard banded
    dgrad/wgrad pair runs on dy_eff."""
    xc_saved, w, y = res
    dy, ds1, ds2 = cot
    g = (dy.astype(jnp.float32) + ds1
         + 2.0 * ds2 * y.astype(jnp.float32)).astype(y.dtype)
    dx, dw = _vjp_bwd(interpret, (xc_saved, w), g)
    return dx, dw


depthwise_conv2d_banded_stats.defvjp(_vjp_stats_fwd, _vjp_stats_bwd)


# ---------------------------------------------------------------------------
# C-major custom VJP: the resident TRAINING stage's conv branch
#
# The round-4 train trace (ROADMAP.md) showed the step paying an N-minor
# layout tax the eval path had already deleted: every branch's NHWC entry
# transposes x to C-major, runs the kernel, transposes back — and the
# backward pays the same three relayouts again (_vjp_bwd). The resident
# training stage (models/slak.py) transposes ONCE at stage entry and runs
# every block on (C, H, W, N); this VJP is its conv primitive — identical
# kernels, zero NHWC adapters, and no batch padding (the stage gate
# requires N % 128 == 0 when compiled, so BN sums and wgrad see only real
# batch rows).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dwconv_banded_stats_cmajor_vjp(xc: Array, w: Array,
                                   interpret: bool = False):
    """C-major twin of :func:`depthwise_conv2d_banded_stats`.

    xc: (C, H, W, N) unpadded C-major activation; w: (kh, kw, C), both
    taps odd, with kh >= kw (callers pass the (s, K) LoRA2 branch through
    (0, 2, 1, 3)-transposed views) unless the 2-D tiny-map route applies
    (H*W <= 128 — symmetric in H/W, any odd pair). Compiled callers must
    guarantee N % 128 == 0. Returns (y (C, H, W, N), s1 (C,), s2 (C,))
    with s1/s2 the fp32 BN batch sums of y over (H, W, N)."""
    (y, s1, s2), _ = _cm_vjp_fwd(xc, w, interpret)
    return y, s1, s2


def _cm_vjp_fwd(xc, w, interpret):
    kh, kw, _ = w.shape
    C, H, W, N = xc.shape
    if use_banded2d(H, W, kh, kw, jnp.dtype(xc.dtype).itemsize):
        y = dwconv_banded2d_cmajor(xc, w, interpret=interpret)
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, (1, 2, 3))
        s2 = jnp.sum(yf * yf, (1, 2, 3))
        return (y, s1, s2), (xc, w, y)
    assert kh >= kw, (kh, kw)
    xcp = jnp.pad(xc, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)))
    yc, s1, s2 = dwconv_banded_stats_cmajor(xcp, w, interpret=interpret)
    return (yc, s1, s2), (xcp, w, yc)


def _cm_vjp_bwd(interpret, res, cot):
    """(dy, ds1, ds2) -> (dxc, dw), all C-major. Same math as
    :func:`_vjp_stats_bwd` minus its NHWC relayouts: dy_eff folds the
    sums' cotangents, dgrad = flipped-tap forward, wgrad = the banded
    correlation kernels."""
    xc_saved, w, y = res
    dy, ds1, ds2 = cot
    kh, kw, _ = w.shape
    cdt = y.dtype
    g = (dy.astype(jnp.float32) + ds1[:, None, None, None]
         + 2.0 * ds2[:, None, None, None] * y.astype(jnp.float32)
         ).astype(cdt)
    wf = w[::-1, ::-1, :].astype(cdt)
    C, H, W, N = g.shape
    if use_banded2d(H, W, kh, kw, jnp.dtype(cdt).itemsize):
        dxc = dwconv_banded2d_cmajor(g, wf, interpret=interpret)
        dA2 = wgrad_banded2d_cmajor(xc_saved, g, interpret=interpret)
        dw = band_extract2d(dA2, kh, kw, H, W)
    else:
        gcp = jnp.pad(g, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)))
        dxc = dwconv_banded_cmajor(gcp, wf, interpret=interpret)
        dA = wgrad_banded_cmajor(xc_saved, g, kw, interpret=interpret)
        dw = band_extract(dA, kh)
    return dxc.astype(cdt), dw.astype(w.dtype)


dwconv_banded_stats_cmajor_vjp.defvjp(_cm_vjp_fwd, _cm_vjp_bwd)


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
