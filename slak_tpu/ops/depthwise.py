"""Large-kernel depthwise 2-D convolution — the TPU-native replacement for the
reference's CUTLASS implicit-GEMM CUDA extension.

Reference behavior being replicated (not translated):
  * ``DepthWiseConv2dImplicitGEMM`` (reference ``depthwise_conv2d_implicit_gemm.py:14-66``)
    is a stride-1 depthwise conv that *always* uses "same" padding of
    ``(kh//2, kw//2)`` regardless of what the caller passed (reference
    ``models/SLaK.py:21-22`` ignores stride/padding args; the extension infers
    padding per-dimension, ``forward_fp32.cu:140-144``). Kernels may be
    rectangular, e.g. (51, 5) and (5, 51) for the decomposed branches.
  * fwd/dgrad/wgrad exist in fp32 + fp16 (accum fp32). Here the XLA/Pallas
    paths support fp32 + bf16 with fp32 accumulation.

Design notes (TPU-first):
  * NHWC layout throughout — channels on the 128-lane axis, so per-tap FMAs
    on the VPU are fully vectorized. (The reference is NCHW because CUDA.)
  * Weight layout is ``(kh, kw, C)``.
  * The XLA path (`lax.conv_general_dilated` with ``feature_group_count=C``)
    is the always-available reference implementation used for correctness
    diffing; the banded Pallas path (``slak_tpu.ops.pallas_banded``) is the
    fast path for the decomposed rectangular pair, and the grouped-MXU path
    (``slak_tpu.ops.dwconv_grouped``) covers the remaining large kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _same_pad(kh: int, kw: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    # CUTLASS extension convention: pad = k//2 per spatial dim
    # (forward_fp32.cu:140-144). Odd kernels => exact "same" output.
    return ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2))


def depthwise_conv2d_xla(x: Array, w: Array) -> Array:
    """Stride-1 same-padded depthwise conv. x: (N,H,W,C), w: (kh,kw,C)."""
    kh, kw, c = w.shape
    assert x.shape[-1] == c, f"channel mismatch {x.shape} vs {w.shape}"
    # HWIO with I=1 (each group has one input channel)
    rhs = w.reshape(kh, kw, 1, c)
    # NB: no preferred_element_type here — a f32 accumulator dtype breaks the
    # autodiff transpose when x is bf16 (f32 cotangent vs bf16 operand), and
    # TPU MXU convs accumulate bf16 in f32 internally regardless.
    out = lax.conv_general_dilated(
        x,
        rhs.astype(x.dtype),
        window_strides=(1, 1),
        padding=_same_pad(kh, kw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def depthwise_conv2d_xla_cmajor(xc: Array, w: Array) -> Array:
    """Stride-1 same-padded depthwise conv on a C-major activation.
    xc: (C, H, W, N), w: (kh, kw, C). Returns (C, H, W, N). Used by the
    resident training stage (models/slak.py) for the small (s, s) branch,
    whose banded formulation would cost the same as the long branch (the
    band lives inside an (H, H) matrix regardless of K) — XLA's native
    grouped conv with explicit CHWN dimension numbers keeps the activation
    resident instead."""
    kh, kw, c = w.shape
    assert xc.shape[0] == c, f"channel mismatch {xc.shape} vs {w.shape}"
    rhs = w.reshape(kh, kw, 1, c)
    return lax.conv_general_dilated(
        xc,
        rhs.astype(xc.dtype),
        window_strides=(1, 1),
        padding=_same_pad(kh, kw),
        dimension_numbers=("CHWN", "HWIO", "CHWN"),
        feature_group_count=c,
    )


def depthwise_conv2d(x: Array, w: Array, b: Optional[Array] = None,
                     impl: str = "auto", interpret: bool = False) -> Array:
    """Public depthwise conv. impl in {'auto', 'xla', 'mxu', 'grouped'}.

    'auto' picks the grouped block-diagonal MXU path for large kernels on
    TPU (see :mod:`slak_tpu.ops.dwconv_grouped`) and XLA's native lowering
    otherwise. 'banded' is the per-channel banded-GEMM Pallas path with a
    custom MXU VJP (see :mod:`slak_tpu.ops.pallas_banded`) — the training
    fast path, selected by the model layer per measured shape gates.
    NB: forcing 'banded' zero-pads the batch up to a multiple of 128 when
    compiled (lane-axis constraint) — a bs<32 caller pays up to 128x wasted
    lane work; the model-layer gates only route batches >= 32 here.
    ``interpret`` runs the Pallas path in interpret mode (CPU tests /
    multi-chip dryruns; lifts the batch padding)."""
    if impl == "banded":
        from slak_tpu.ops.pallas_banded import depthwise_conv2d_banded
        out = depthwise_conv2d_banded(x, w, interpret)
    elif impl == "mxu":
        from slak_tpu.ops.dwconv_mxu import depthwise_conv2d_mxu
        out = depthwise_conv2d_mxu(x, w)
    elif impl == "grouped" or (impl == "auto" and _grouped_ok(x, w)):
        from slak_tpu.ops.dwconv_grouped import depthwise_conv2d_grouped
        out = depthwise_conv2d_grouped(x, w)
    else:
        out = depthwise_conv2d_xla(x, w)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# Eval-pair dispatch: 'split' (two pallas calls + XLA pads/transposes/
# add) or one fused pallas call with the two layout shuffles placed per
# mode — 'fused-kernel' (in-kernel x swap + y2 swap), 'fused-input'
# (second XLA-transposed x stream), 'fused-dualout' (branch-2 output
# written transposed, XLA add-transpose), 'fused-dualboth' (dual input
# AND dual output, zero in-kernel shuffles).  Measured at FULL-MODEL
# level (the only trustworthy instrument on the tunnel — see CLAUDE.md
# timing protocol (d)); tools/probe_pair_ab.py re-measures.
# STATUS (closed 2026-08-17): all four fused modes are bit-exact vs
# split (interpret), and at full-model level (eval fwd bs256, median of
# 5, two runs) the surviving modes are a WASH: split 169.2/170.6 ms,
# fused-input 170.0/170.1, fused-dualboth 174.2/176.3 — XLA was already
# overlapping the split path's pads/transposes/add with the MXU-bound
# kernels, so merging the calls buys no wall time.  'fused-kernel' and
# 'fused-dualout' (the two with an in-kernel swapaxes of the x block)
# fail to compile at full-model shapes: the "remote_compile HTTP 500"
# is a scoped-VMEM stack OOM (measured 18.11M vs the 16M limit — the
# swap temporary on top of the halo scratches).  'split' stays the
# default by measurement; the fused kernels remain as tested variants.
PAIR_IMPL = "split"


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def banded_train_ok(x: Array, w: Array, interpret: bool = False) -> bool:
    """Gate for routing a *training* depthwise conv to the banded Pallas
    path with its custom MXU VJP (fwd + dgrad + wgrad all banded dots).

    Hard constraints: odd taps (the flipped-tap dgrad identity) and
    batch >= 64 — Mosaic lowers the kernels' dots by merging (W, nb) into
    the lane axis, which needs full 128-lane blocks; non-multiples are
    zero-padded up to 128 (exact: padded rows are zero in x, contribute
    zero to wgrad and the fused BN sums, and their dx rows are sliced).

    Measured v5e bs128 bf16 (fwd+dgrad+wgrad per branch, ms, 2026-08-17,
    unpadded-contraction kernels):
      56x56 C=124 (51,5): xla 19.9 -> banded 8.83 (2.25x)
      28x28 C=249 (49,5): xla 12.6 -> banded 7.15 (1.76x)
      14x14 C=499 (47,5): xla  8.3 -> banded 5.41 (1.53x, 1-D)
       7x7  C=998 (13,5): xla 4.33 -> banded 4.26 (parity, 2-D Toeplitz)
    => gate at max(kh, kw) >= 31, plus the tiny-map 2-D regime.

    Batch crossover (tools/probe_batch.py, pad-to-128 banded vs XLA
    autodiff, bf16 train chains, 2026-08-18): ratios xla/banded
      s1 56x56 C124 (51,5): bs32 0.81 | bs64 1.40 | bs96 1.75 | bs128 2.30
      s2 28x28 C249 (49,5): bs32 0.91 | bs64 1.28 | bs96 1.61 | bs128 2.01
    => padded banded wins from bs64 up at both stages; XLA keeps bs<64."""
    from slak_tpu.ops.pallas_banded import batch_block, use_banded2d
    kh, kw, _ = w.shape
    if kh % 2 != 1 or kw % 2 != 1:
        return False
    if not interpret and not (
            _on_tpu() and (batch_block(x.shape[0], x.dtype) is not None
                           or x.shape[0] >= 64)):
        return False
    return (max(kh, kw) >= 31
            or (max(kh, kw) >= 13     # tiny (5,5) branches stay on XLA
                and use_banded2d(x.shape[1], x.shape[2], kh, kw,
                                 jnp.dtype(x.dtype).itemsize)))


def _grouped_ok(x: Array, w: Array) -> bool:
    # Measured on v5e (see dwconv_grouped docstring): the block-diagonal
    # grouped-conv path beats XLA's native depthwise lowering for the large
    # SLaK kernels; the banded-matmul ('mxu') and Pallas tap-loop paths were
    # both measured slower at big maps and stay opt-in.
    kh, kw, _ = w.shape
    return _on_tpu() and max(kh, kw) > 7 and kh % 2 == 1 and kw % 2 == 1


# ---------------------------------------------------------------------------
# Fused SLaK large-kernel conv: the three-branch decomposed conv
# (reference ReparamLargeKernelConv, models/SLaK.py:60-100).
# ---------------------------------------------------------------------------

def large_kernel_conv(
    x: Array,
    weights: Sequence[Array],
    scales: Optional[Sequence[Array]] = None,
    biases: Optional[Sequence[Array]] = None,
    impl: str = "auto",
    interpret: bool = False,
    defer_bias: bool = False,
) -> Array:
    """Sum of several same-padded stride-1 depthwise convs over the same input,
    each optionally followed by a per-channel affine (fused BN):

        out = sum_i affine_i(dwconv(x, w_i))

    This is the fused form of ``LoRA1(x) + LoRA2(x) + small_conv(x)`` where
    each branch is conv+BN (reference models/SLaK.py:92-95). In eval mode the
    BN folds into (scale, bias); in train mode callers run the branches
    unfused via :func:`depthwise_conv2d` so BN can see batch stats.
    """
    n = len(weights)
    if scales is None:
        scales = [None] * n
    if biases is None:
        biases = [None] * n

    # banded Pallas path: the decomposed rectangular pair at K >= 31
    # (measured fastest on v5e: 1.15-1.7x over the grouped-MXU path;
    # see ops/pallas_banded.py)
    from slak_tpu.ops.pallas_banded import batch_block
    kh0, kw0 = weights[0].shape[0], weights[0].shape[1]
    is_pair = (len(weights) >= 2 and kh0 >= 31 and kw0 < kh0
               and weights[1].shape[0] == kw0 and weights[1].shape[1] == kh0
               # batch rides the 128-lane axis; multiples of 128 tile the
               # blocked grid exactly, smaller batches are zero-padded to
               # 128. Measured v5e stage1 pair eval (ms): bs32 banded 10.7
               # vs grouped 21.2; bs64 11.1 vs 15.4; bs128 9.9 vs 15.4 —
               # banded wins down to bs32 even with 4x lane padding.
               and (interpret
                    or batch_block(x.shape[0], x.dtype) is not None
                    or x.shape[0] >= 32))
    if is_pair and (impl == "banded" or (impl == "auto" and _on_tpu())):
        from slak_tpu.ops.pallas_banded import lk_pair_banded, lk_pair_fused
        # Fold every extra branch that FITS INSIDE LoRA1's (K, s) taps —
        # i.e. the (s, s) small branch — directly into LoRA1's tap tensor
        # (scales applied first, center-padded): exact for stride-1
        # same-padded odd kernels, the same identity the reference uses at
        # merge time (models/SLaK.py:102-122) — applied here at EVAL time,
        # killing the small branch's conv + affine + add entirely
        # (measured r3: ~3 ops/block of full-activation elementwise).
        kh0, kw0 = weights[0].shape[0], weights[0].shape[1]
        w1e = weights[0] if scales[0] is None \
            else weights[0] * scales[0].astype(weights[0].dtype)
        bias_total = None
        leftover = []
        for w, s, b in zip(weights[2:], scales[2:], biases[2:]):
            if w.shape[0] <= kh0 and w.shape[1] <= kw0:
                we = w if s is None else w * s.astype(w.dtype)
                ph = (kh0 - w.shape[0]) // 2
                pw = (kw0 - w.shape[1]) // 2
                w1e = w1e + jnp.pad(
                    we, ((ph, kh0 - w.shape[0] - ph),
                         (pw, kw0 - w.shape[1] - pw), (0, 0)))
                if b is not None:
                    bias_total = b if bias_total is None else bias_total + b
            else:
                leftover.append((w, s, b))
        for b in biases[:2]:
            if b is not None:
                bias_total = b if bias_total is None else bias_total + b
        if PAIR_IMPL == "split":
            y = lk_pair_banded(x, w1e, weights[1], None, scales[1],
                               interpret=interpret)
        else:
            # fused pair: one pallas call, in-kernel halos; the tmode
            # suffix picks where the two layout shuffles happen
            y = lk_pair_fused(x, w1e, weights[1], None, scales[1],
                              tmode=PAIR_IMPL.removeprefix("fused-"),
                              interpret=interpret)
        for w, s, b in leftover:
            z = depthwise_conv2d_xla(x, w)
            if s is not None:
                z = z * s.astype(z.dtype)
            if b is not None:
                z = z + b.astype(z.dtype)
            y = y + z
        if defer_bias:
            # caller folds bias_total into a later in-VMEM add (e.g. the
            # fused MLP's LN input) — skips a full elementwise pass
            return y, bias_total
        if bias_total is not None:
            y = y + bias_total.astype(y.dtype)
        return y

    use_grouped = impl == "grouped" or (
        impl == "auto" and any(_grouped_ok(x, w) for w in weights))
    if use_grouped:
        # pad channels ONCE for all branches (per-call padding costs a full
        # activation copy per branch — measured to eat most of the MXU win)
        from slak_tpu.ops.dwconv_grouped import (depthwise_conv2d_grouped,
                                                 pick_group, _round_up)
        c = x.shape[-1]
        g = max(pick_group(w.shape[0], w.shape[1], c) for w in weights
                if max(w.shape[0], w.shape[1]) > 7)
        cp = _round_up(c, g)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c))) \
            if cp != c else x
        out = None
        for w, s, b in zip(weights, scales, biases):
            wp = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c))) if cp != c else w
            kh, kw, _ = w.shape
            if max(kh, kw) > 7:
                y = depthwise_conv2d_grouped(xp, wp, group=g)
            else:
                y = depthwise_conv2d_xla(xp, wp)
            if s is not None:
                y = y * jnp.pad(s, (0, cp - c)).astype(y.dtype) \
                    if cp != c else y * s.astype(y.dtype)
            if b is not None:
                y = y + jnp.pad(b, (0, cp - c)).astype(y.dtype) \
                    if cp != c else y + b.astype(y.dtype)
            out = y if out is None else out + y
        return out[..., :c]

    out = None
    for w, s, b in zip(weights, scales, biases):
        y = depthwise_conv2d(x, w, impl=impl, interpret=interpret)
        if s is not None:
            y = y * s.astype(y.dtype)
        if b is not None:
            y = y + b.astype(y.dtype)
        out = y if out is None else out + y
    return out
