"""Pallas fused large-kernel conv — the TPU-native replacement for the
reference's CUTLASS ``DepthWiseConv2dImplicitGEMM`` extension
(``cutlass/examples/19_large_depthwise_conv2d_torch_extension``), fusing the
whole ``ReparamLargeKernelConv`` eval forward (``models/SLaK.py:89-100``)
into ONE pass over the input:

    out = BN1(conv_{KxS}(x)) + BN2(conv_{SxK}(x)) + BN3(conv_{SxS}(x))

With eval-mode BN folded to per-channel (scale, bias), each branch's scale
premultiplies its kernel taps, so all branches accumulate into a single
fp32 register tile and the input tile is read from VMEM once — vs three
full HBM round-trips in the unfused path.

Layout: NHWC with channels on the 128-wide lane axis; grid over
(batch, channel-blocks); the whole (padded) H x W plane of one channel
block lives in VMEM (56x56 stage-1 maps fit easily — SURVEY.md §7 "whole-
HxW-resident tiles per channel block"). The tap loop runs on the VPU as
shifted full-tile FMAs: ``lax.fori_loop`` over the long kernel axis with
the short axis unrolled.

Backward runs through a ``custom_vjp`` that reuses the XLA conv path (the
fused kernel is the inference/eval hot path; training keeps per-branch BN
batch stats and uses the unfused path anyway).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_kernel(x_ref, w1_ref, w2_ref, ws_ref, bias_ref, out_ref, *,
                  H: int, W: int, k1: Tuple[int, int], k2: Tuple[int, int],
                  ks: Tuple[int, int], off1: Tuple[int, int],
                  off2: Tuple[int, int], offs: Tuple[int, int],
                  has_small: bool):
    """One (batch, channel-block) cell: x_ref (Hp, Wp, CB) padded input;
    w*_ref tap weights (kh, kw, CB) with BN scale pre-folded; bias_ref
    (1, CB) summed per-channel bias; out_ref (H, W, CB)."""
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # (H, W, CB)

    def tap_sum(acc, w_ref, kh, kw, oh, ow):
        # long axis via fori_loop (dynamic H offset), short axis unrolled
        def body(dh, acc):
            xh = x_ref[0, pl.ds(dh + oh, H)]       # (H, Wp, CB)
            wrow = w_ref[pl.ds(dh, 1)][0]          # (kw, CB)
            for dw in range(kw):
                acc += (xh[:, dw + ow:dw + ow + W, :].astype(jnp.float32)
                        * wrow[dw, :].astype(jnp.float32))
            return acc
        return lax.fori_loop(0, kh, body, acc)

    acc = tap_sum(acc, w1_ref, k1[0], k1[1], off1[0], off1[1])
    acc = tap_sum(acc, w2_ref, k2[0], k2[1], off2[0], off2[1])
    if has_small:
        acc = tap_sum(acc, ws_ref, ks[0], ks[1], offs[0], offs[1])
    out_ref[0] = (acc + bias_ref[0, :].astype(jnp.float32)).astype(
        out_ref.dtype)


def fused_lk_conv_pallas(
    x: Array,
    weights: Sequence[Array],
    scales: Optional[Sequence[Optional[Array]]] = None,
    biases: Optional[Sequence[Optional[Array]]] = None,
    *,
    interpret: bool = False,
) -> Array:
    """Fused multi-branch same-padded stride-1 depthwise conv.

    x: (N, H, W, C); weights: 2 or 3 arrays (kh_i, kw_i, C); scales/biases:
    folded-BN per-channel affines per branch (None -> identity).
    """
    n_b = len(weights)
    assert n_b in (2, 3), "fused kernel supports 2 or 3 branches"
    if scales is None:
        scales = [None] * n_b
    if biases is None:
        biases = [None] * n_b

    N, H, W, C = x.shape
    CB = 128
    Cp = _round_up(C, CB)
    n_cb = Cp // CB

    # fold scales into taps; sum biases
    folded_w = []
    total_bias = jnp.zeros((C,), jnp.float32)
    for w, s, b in zip(weights, scales, biases):
        wf = w.astype(jnp.float32)
        if s is not None:
            wf = wf * s.astype(jnp.float32)
        folded_w.append(wf)
        if b is not None:
            total_bias = total_bias + b.astype(jnp.float32)

    khs = [w.shape[0] for w in weights]
    kws = [w.shape[1] for w in weights]
    ph, pw = max(k // 2 for k in khs), max(k // 2 for k in kws)
    Hp, Wp = H + 2 * ph, W + 2 * pw

    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, Cp - C)))
    wp = [jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C))).astype(x.dtype)
          for w in folded_w]
    if n_b == 2:  # dummy small branch
        wp.append(jnp.zeros((1, 1, Cp), x.dtype))
        khs.append(1)
        kws.append(1)
    bias_p = jnp.pad(total_bias, (0, Cp - C)).reshape(1, Cp).astype(x.dtype)

    # per-branch start offsets inside the max-halo padded tile:
    # branch pad is k//2, tile pad is ph/pw -> offset = ph - kh//2
    offs = [(ph - khs[i] // 2, pw - kws[i] // 2) for i in range(3)]

    kernel = functools.partial(
        _fused_kernel, H=H, W=W,
        k1=(khs[0], kws[0]), k2=(khs[1], kws[1]), ks=(khs[2], kws[2]),
        off1=offs[0], off2=offs[1], offs=offs[2], has_small=(n_b == 3))

    out = pl.pallas_call(
        kernel,
        grid=(N, n_cb),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, CB), lambda n, c: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khs[0], kws[0], CB), lambda n, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khs[1], kws[1], CB), lambda n, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khs[2], kws[2], CB), lambda n, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB), lambda n, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, CB), lambda n, c: (n, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cp), x.dtype),
        interpret=interpret,
    )(xp, wp[0], wp[1], wp[2], bias_p)
    return out[..., :C]


def depthwise_conv2d_pallas(x: Array, w: Array, interpret: bool = False
                            ) -> Array:
    """Single-branch Pallas depthwise conv (same padding, stride 1)."""
    return fused_lk_conv_pallas(x, [w, jnp.zeros_like(w[:1, :1])],
                                interpret=interpret)


# --- differentiable wrapper --------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_lk_conv(x, w1, w2, ws, s1, s2, ss, b1, b2, bs):
    """3-branch fused conv with folded affines; custom VJP via XLA convs."""
    return fused_lk_conv_pallas(x, [w1, w2, ws], [s1, s2, ss], [b1, b2, bs])


def _ref_forward(x, w1, w2, ws, s1, s2, ss, b1, b2, bs):
    from slak_tpu.ops.depthwise import depthwise_conv2d_xla
    out = None
    for w, s, b in ((w1, s1, b1), (w2, s2, b2), (ws, ss, bs)):
        y = depthwise_conv2d_xla(x, w)
        y = y * s.astype(y.dtype) + b.astype(y.dtype)
        out = y if out is None else out + y
    return out


def _fwd(x, w1, w2, ws, s1, s2, ss, b1, b2, bs):
    return (fused_lk_conv(x, w1, w2, ws, s1, s2, ss, b1, b2, bs),
            (x, w1, w2, ws, s1, s2, ss, b1, b2, bs))


def _bwd(res, g):
    return jax.vjp(_ref_forward, *res)[1](g)


fused_lk_conv.defvjp(_fwd, _bwd)
