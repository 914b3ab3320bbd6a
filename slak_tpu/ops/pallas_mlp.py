"""Fused ConvNeXt-block MLP tail — LN + pwconv1 + GELU + pwconv2 + gamma
(+ residual) in one Pallas pass over token tiles.

The reference runs this as separate ops (``models/SLaK.py:145-166``:
``norm -> pwconv1 -> act -> pwconv2 -> gamma* -> residual``); on TPU the
4C-wide intermediate (e.g. (128, 56, 56, 496) = 397 MB bf16 at SLaK-T
stage 1, bs128) round-trips HBM between every op, so the sequence runs at
~17-25 TFLOPS despite being the model's FLOPs bulk. Keeping the 4C tile in
VMEM measured 6.06 -> 4.31 ms per stage-1 block fwd (1.41x) and
3.24 -> 2.78 at stage 3 (v5e, bs128 bf16, 2026-08-17).

Layout: tokens (N*H*W) tiled on the sublane axis, channels on lanes; the
(C, 4C) / (4C, C) weights stay resident in VMEM across the token grid
(constant index_map), which caps the fused path at weight footprints
<= _W_BYTES_MAX — all four SLaK-T stages since the 64M vmem cap landed
(stage 4 eval measured faster fused; its TRAINING backward stays XLA,
see fused_mlp_bwd_ok / models/slak.py TRAIN_WIDE_MLP_BWD).

GELU is the exact erf formulation, computed with the Abramowitz-Stegun
7.1.26 rational approximation (|err| <= 1.5e-7, below bf16 resolution;
Mosaic exposes no erf primitive).

Backward: a second fused kernel recomputes h/a/g per token tile in VMEM
and emits dy alongside dW1/dW2/db/dgamma/dLN accumulated across the token
grid (constant out index_map + predicated init, the same pattern as the
banded wgrad) — the TPU analog of shipping dedicated backward kernels the
way the reference does for its conv. The backward tile needs ~3 fp32
(Tt, 4C) intermediates resident, so it is gated to C <= _BWD_C_MAX
(SLaK-T stages 1-2); wider stages train through the plain XLA composition
(measured: an XLA-recompute custom VJP is ~43 ms/step WORSE than XLA's
own selective remat — never hide the composition from the autodiff
without a real backward kernel).

Wide-C backward: CLOSED as the deliberate design (round 3). Measured
per-block bwd chains (v5e bs128 bf16, ~5 ms/iter harness floor per
tools/probe_floor.py):

    stage 2 (T=100352, C=249): fused 7.45 | XLA 8.93  -> fused 1.6x
    stage 3 (T=25088,  C=499): F-chunked 7.17 | XLA 6.97 -> XLA wins

After subtracting the floor, XLA's stage-3 bwd is ~2.0 ms — already AT
the MXU compute floor (2x fwd FLOPs = 2*2*T*C*4C*2 = 200 GFLOP at the
measured 105 TFLOPS = 1.9 ms), because at C >= 499 the matmuls are big
enough that XLA tiles them well and the LN/GELU elementwise it fails to
fuse is a small fraction. There is no headroom for any fused
formulation (W2-major chunking included — it still recomputes h per
chunk, the exact cost that made the F-chunked variant a wash), so
stages 3-4 deliberately train through XLA.
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

# Resident-weight budget for the fused fwd kernel. 9M (the original
# 16M-scoped-vmem-era gate) kept stage 4 (C=998, 15.9M of weights) on
# the XLA composition; with the kernel's 64M vmem cap the wide shapes
# fit, and fusing stage 4's eval tail measured faster at full-model
# level: 133.7 vs 134.9 ms/pass (v5e bs256 bf16 chain/3,
# tools/probe_mlp4.py, 2026-08-19). Training still requires the
# backward gate (fused_mlp_bwd_ok / TRAIN_WIDE_MLP_BWD — measured
# slower for wide C, see models/slak.py).
_W_BYTES_MAX = 20 * 1024 * 1024
_BWD_C_MAX = 256
LN_EPS = 1e-6
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| <= 1.5e-7."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_as(x * 0.7071067811865476))


def fused_mlp_ok(c: int, c4: int, itemsize: int, on_tpu: bool) -> bool:
    return on_tpu and 2 * c * c4 * itemsize <= _W_BYTES_MAX


def _mlp_kernel(y_ref, res_ref, p_ref, w1_ref, w2_ref, o_ref, *, C: int,
                add_residual: bool):
    y = y_ref[...]
    yf = y.astype(jnp.float32) + p_ref[5, :C]
    mu = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=1, keepdims=True)
    h = (yf - mu) * lax.rsqrt(var + LN_EPS)
    h = h * p_ref[0, :C] + p_ref[1, :C]
    a = lax.dot_general(h.astype(y.dtype), w1_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    g = _gelu_exact(a + p_ref[2])
    o = lax.dot_general(g.astype(y.dtype), w2_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    o = (o + p_ref[3, :C]) * p_ref[4, :C]
    if add_residual:
        o = res_ref[...].astype(jnp.float32) + o
    o_ref[...] = o.astype(o_ref.dtype)


def _pick_tt(c: int, itemsize: int = 2) -> int:
    # keep the (Tt, 4C) fp32 activation tile ~2-4 MB; fp32 operands double
    # the in/out/weight blocks too (C=249 fp32 at Tt=1024 measured 18.1M
    # scoped VMEM, limit 16M), so halve the tile
    tt = 1024 if c <= 256 else 512
    return tt // 2 if itemsize >= 4 else tt


def _pick_tt_bwd(c: int, itemsize: int = 2) -> int:
    # the backward tile holds ~3 fp32 (Tt, 4C) intermediates plus the
    # resident dW accumulators; C=249 at Tt=1024 measured 16.86M scoped
    # VMEM (limit 16M)
    tt = 1024 if c <= 128 else 512
    return tt // 2 if itemsize >= 4 else tt


def _mlp_fused_2d(y2, res2, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                  pre_bias, add_residual, interpret):
    """(T, C) tokens-major core. Returns (T, C)."""
    T, C = y2.shape
    C4 = w1.shape[1]
    Tt = _pick_tt(C, jnp.dtype(y2.dtype).itemsize)
    Tp = -(-T // Tt) * Tt
    if Tp != T:
        y2 = jnp.pad(y2, ((0, Tp - T), (0, 0)))
        res2 = jnp.pad(res2, ((0, Tp - T), (0, 0)))
    pk = jnp.zeros((8, C4), jnp.float32)
    pk = pk.at[0, :C].set(ln_scale).at[1, :C].set(ln_bias).at[2].set(b1)
    pk = pk.at[3, :C].set(b2).at[4, :C].set(gamma)
    pk = pk.at[5, :C].set(pre_bias)
    kern = functools.partial(_mlp_kernel, C=C, add_residual=add_residual)
    out = pl.pallas_call(
        kern,
        grid=(Tp // Tt,),
        in_specs=[
            pl.BlockSpec((Tt, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tt, C), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, C), y2.dtype),
        # stage-4 widths (C=998: 15.9M of resident weights + the 8.2M
        # fp32 tile) exceed Mosaic's default 16M scoped-vmem cap; the
        # physical VMEM is 128M, so raise the cap (same as the fused
        # pair kernels) instead of gating the shape out.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(y2, res2, pk, w1.astype(y2.dtype), w2.astype(y2.dtype))
    return out[:T] if Tp != T else out


def fused_mlp_bwd_ok(c: int) -> bool:
    return c <= _BWD_C_MAX


def _mlp_bwd_kernel(y_ref, do_ref, p_ref, w1_ref, w2_ref,
                    dy_ref, dw1_ref, dw2_ref, dv1_ref, dv2_ref, *, C: int):
    """Recompute h/a/g for the tile, emit dy; accumulate dW1 (C, C4),
    dW2 (C4, C), dv1 (1, C4) = db1 and dv2 (4, C) = [db2; dgamma; dlns;
    dlnb] across the token grid."""
    t = pl.program_id(0)
    y = y_ref[...]
    cdt = y.dtype
    yf = y.astype(jnp.float32) + p_ref[5, :C]
    mu = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=1, keepdims=True)
    inv = lax.rsqrt(var + LN_EPS)
    xhat = (yf - mu) * inv
    h = xhat * p_ref[0, :C] + p_ref[1, :C]
    hb = h.astype(cdt)
    a = lax.dot_general(hb, w1_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + p_ref[2]
    erf_a = _erf_as(a * _INV_SQRT2)
    g = 0.5 * a * (1.0 + erf_a)
    gb = g.astype(cdt)

    dout = do_ref[...].astype(jnp.float32)
    # o_pre = gb @ W2 + b2 (recomputed for dgamma only)
    o_pre = lax.dot_general(gb, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + p_ref[3, :C]
    dgamma = jnp.sum(dout * o_pre, axis=0, keepdims=True)        # (1, C)
    do = dout * p_ref[4, :C]                                     # * gamma
    db2 = jnp.sum(do, axis=0, keepdims=True)                     # (1, C)
    dob = do.astype(cdt)
    # dW2 += g^T @ do
    dw2 = lax.dot_general(gb, dob, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)    # (C4, C)
    # dg = do @ W2^T ; da = dg * gelu'(a)
    dg = lax.dot_general(dob, w2_ref[...], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)     # (Tt, C4)
    gp = (0.5 * (1.0 + erf_a)
          + a * _INV_SQRT_2PI * jnp.exp(-0.5 * a * a))
    da = dg * gp
    db1 = jnp.sum(da, axis=0, keepdims=True)                     # (1, C4)
    dab = da.astype(cdt)
    # dW1 += h^T @ da
    dw1 = lax.dot_general(hb, dab, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)    # (C, C4)
    # dh = da @ W1^T
    dh = lax.dot_general(dab, w1_ref[...], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)     # (Tt, C)
    dlns = jnp.sum(dh * xhat, axis=0, keepdims=True)             # (1, C)
    dlnb = jnp.sum(dh, axis=0, keepdims=True)                    # (1, C)
    # LN backward
    dxh = dh * p_ref[0, :C]
    m1 = jnp.mean(dxh, axis=1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
    dy = inv * (dxh - m1 - xhat * m2)
    dy_ref[...] = dy.astype(dy_ref.dtype)

    dv2 = jnp.concatenate([db2, dgamma, dlns, dlnb], axis=0)     # (4, C)

    @pl.when(t == 0)
    def _():
        dw1_ref[...] = dw1
        dw2_ref[...] = dw2
        dv1_ref[...] = db1
        dv2_ref[...] = dv2

    @pl.when(t > 0)
    def _():
        dw1_ref[...] += dw1
        dw2_ref[...] += dw2
        dv1_ref[...] += db1
        dv2_ref[...] += dv2


def _mlp_bwd_2d(y2, do2, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                pre_bias, interpret):
    T, C = y2.shape
    C4 = w1.shape[1]
    Tt = _pick_tt_bwd(C, jnp.dtype(y2.dtype).itemsize)
    Tp = -(-T // Tt) * Tt
    if Tp != T:
        y2 = jnp.pad(y2, ((0, Tp - T), (0, 0)))
        do2 = jnp.pad(do2, ((0, Tp - T), (0, 0)))
    pk = jnp.zeros((8, C4), jnp.float32)
    pk = pk.at[0, :C].set(ln_scale).at[1, :C].set(ln_bias).at[2].set(b1)
    pk = pk.at[3, :C].set(b2).at[4, :C].set(gamma)
    pk = pk.at[5, :C].set(pre_bias)
    kern = functools.partial(_mlp_bwd_kernel, C=C)
    dy, dw1, dw2, dv1, dv2 = pl.pallas_call(
        kern,
        grid=(Tp // Tt,),
        in_specs=[
            pl.BlockSpec((Tt, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tt, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, C), y2.dtype),
            jax.ShapeDtypeStruct((C, C4), jnp.float32),
            jax.ShapeDtypeStruct((C4, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
            jax.ShapeDtypeStruct((4, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(y2, do2, pk, w1.astype(y2.dtype), w2.astype(y2.dtype))
    dy = dy[:T] if Tp != T else dy
    return dy, dw1, dw2, dv1[0], dv2[0], dv2[1], dv2[2], dv2[3]


def _mlp_bwd_chunked_kernel(y_ref, do_ref, pc_ref, pb1_ref, w1_ref, w2_ref,
                            dy_ref, dw1_ref, dw2_ref, dv1_ref, dv2_ref,
                            *, NF: int):
    """F-chunked backward for wide channels: grid (token tiles, C4 chunks),
    F innermost so the y/dout tiles stay resident. dW1/dW2/db1 blocks are
    per-chunk (init at t==0); the dy ref accumulates dh across chunks and
    is finalized with the LN backward on the last chunk.

    pc: (4, C) = [ln_scale; ln_bias; b2; gamma]; pb1: (1, C4) blocked
    (1, Fc).

    Measured (v5e, s3 shape T=25088 C=499, fwd+bwd chain): 7.17 ms vs
    6.97 for XLA autodiff of the composition — the NF-fold recompute of
    LN/h cancels the fusion win, so the model keeps the plain composition
    for training at C > _BWD_C_MAX and this kernel only backs the VJP of
    *differentiated eval* forwards (e.g. ERF analysis), where the
    alternative would hide the composition from XLA entirely."""
    t = pl.program_id(0)
    f = pl.program_id(1)
    y = y_ref[...]
    cdt = y.dtype
    yf = y.astype(jnp.float32) + pc_ref[4]
    mu = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=1, keepdims=True)
    inv = lax.rsqrt(var + LN_EPS)
    xhat = (yf - mu) * inv
    h = xhat * pc_ref[0] + pc_ref[1]
    hb = h.astype(cdt)
    a = lax.dot_general(hb, w1_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + pb1_ref[0]
    erf_a = _erf_as(a * _INV_SQRT2)
    g = 0.5 * a * (1.0 + erf_a)
    gb = g.astype(cdt)

    dout = do_ref[...].astype(jnp.float32)
    o_p = lax.dot_general(gb, w2_ref[...], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    dgamma_p = jnp.sum(dout * o_p, axis=0, keepdims=True)       # (1, C)
    do = dout * pc_ref[3]
    dob = do.astype(cdt)
    dw2 = lax.dot_general(gb, dob, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    dg = lax.dot_general(dob, w2_ref[...], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    gp = (0.5 * (1.0 + erf_a)
          + a * _INV_SQRT_2PI * jnp.exp(-0.5 * a * a))
    da = dg * gp
    db1 = jnp.sum(da, axis=0, keepdims=True)                    # (1, Fc)
    dab = da.astype(cdt)
    dw1 = lax.dot_general(hb, dab, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    dh_p = lax.dot_general(dab, w1_ref[...], (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)  # (Tt, C)

    @pl.when(t == 0)
    def _():
        dw1_ref[...] = dw1
        dw2_ref[...] = dw2
        dv1_ref[...] = db1

    @pl.when(t > 0)
    def _():
        dw1_ref[...] += dw1
        dw2_ref[...] += dw2
        dv1_ref[...] += db1

    @pl.when((t == 0) & (f == 0))
    def _():
        dv2_ref[...] = jnp.zeros_like(dv2_ref)

    @pl.when(f == 0)
    def _():
        db2 = jnp.sum(do, axis=0, keepdims=True)
        dv2_ref[0:1] += db2
        # b2's contribution to dgamma: sum_t dout * b2
        dv2_ref[1:2] += (jnp.sum(dout, axis=0, keepdims=True) * pc_ref[2])
        dy_ref[...] = dh_p

    dv2_ref[1:2] += dgamma_p

    @pl.when(f > 0)
    def _():
        dy_ref[...] += dh_p

    @pl.when(f == NF - 1)
    def _():
        dh = dy_ref[...]
        dv2_ref[2:3] += jnp.sum(dh * xhat, axis=0, keepdims=True)
        dv2_ref[3:4] += jnp.sum(dh, axis=0, keepdims=True)
        dxh = dh * pc_ref[0]
        m1 = jnp.mean(dxh, axis=1, keepdims=True)
        m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
        dy_ref[...] = inv * (dxh - m1 - xhat * m2)


def _pick_fc(c4: int, itemsize: int = 2) -> int:
    # chunk width: ~1024 (bf16) / ~512 (fp32 — weight chunks double),
    # rounded up to the 128-lane block granularity
    target = 1024 if itemsize < 4 else 512
    nf = -(-c4 // target)
    return -(-(-(-c4 // nf)) // 128) * 128


def _mlp_bwd_chunked_2d(y2, do2, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                        pre_bias, interpret):
    T, C = y2.shape
    C4 = w1.shape[1]
    Fc = _pick_fc(C4, jnp.dtype(y2.dtype).itemsize)
    C4p = -(-C4 // Fc) * Fc
    NF = C4p // Fc
    if C4p != C4:
        w1 = jnp.pad(w1, ((0, 0), (0, C4p - C4)))
        w2 = jnp.pad(w2, ((0, C4p - C4), (0, 0)))
        b1 = jnp.pad(b1, (0, C4p - C4))
    Tt = 128   # Tt=256 at C=499 measured 17.4M scoped VMEM (limit 16M)
    Tp = -(-T // Tt) * Tt
    if Tp != T:
        y2 = jnp.pad(y2, ((0, Tp - T), (0, 0)))
        do2 = jnp.pad(do2, ((0, Tp - T), (0, 0)))
    pc = jnp.stack([ln_scale, ln_bias, b2, gamma,
                    jnp.broadcast_to(pre_bias, ln_scale.shape)]
                   ).astype(jnp.float32)
    pb1 = b1[None].astype(jnp.float32)
    kern = functools.partial(_mlp_bwd_chunked_kernel, NF=NF)
    dy, dw1, dw2, dv1, dv2 = pl.pallas_call(
        kern,
        grid=(Tp // Tt, NF),
        in_specs=[
            pl.BlockSpec((Tt, C), lambda t, f: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, C), lambda t, f: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, C), lambda t, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fc), lambda t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Fc), lambda t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc, C), lambda t, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Tt, C), lambda t, f: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Fc), lambda t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc, C), lambda t, f: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fc), lambda t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C), lambda t, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C4p), jnp.float32),
            jax.ShapeDtypeStruct((C4p, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C4p), jnp.float32),
            jax.ShapeDtypeStruct((4, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(y2, do2, pc, pb1, w1.astype(y2.dtype), w2.astype(y2.dtype))
    dy = dy[:T] if Tp != T else dy
    return (dy, dw1[:, :C4], dw2[:C4], dv1[0, :C4], dv2[0], dv2[1],
            dv2[2], dv2[3])


# ---------------------------------------------------------------------------
# C-major variant: (C, M) tiles for the layout-resident eval path
#
# The round-4 eval trace (tools/parse_xplane.py on /tmp/prof_r4_eval)
# attributed ~38 of 132 ms/pass to LAYOUT GLUE: the banded conv wants
# C-major (C, H, W, N) — channels on the grid, (W, N) merged onto lanes —
# while the tokens-major MLP kernel above wants (N*H*W, C) — channels on
# lanes. Every block therefore paid ~2-3 full-activation transposes. This
# kernel runs the SAME fused tail directly on (C, M) tiles (M = H*W*N
# flattened from the conv's C-major output — a free reshape), so an eval
# stage can stay C-major end-to-end: LN reduces over the sublane axis,
# the two matmuls run with pre-transposed weights ((4C, C) @ (C, mt) and
# (C, 4C) @ (4C, mt) — same MXU work, mirrored), per-channel params
# broadcast along lanes from (C, 1) columns.
# ---------------------------------------------------------------------------


def _mlp_cmajor_kernel(y_ref, res_ref, p_ref, w1t_ref, w2t_ref, o_ref, *,
                       C: int, add_residual: bool):
    y = y_ref[...]                                      # (C, mt)
    yf = y.astype(jnp.float32) + p_ref[:C, 4:5]         # + pre_bias
    mu = jnp.mean(yf, axis=0, keepdims=True)            # (1, mt)
    var = jnp.mean(jnp.square(yf - mu), axis=0, keepdims=True)
    h = (yf - mu) * lax.rsqrt(var + LN_EPS)
    h = h * p_ref[:C, 0:1] + p_ref[:C, 1:2]
    a = lax.dot_general(w1t_ref[...], h.astype(y.dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (C4, mt)
    g = _gelu_exact(a + p_ref[:, 5:6])
    o = lax.dot_general(w2t_ref[...], g.astype(y.dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (C, mt)
    o = (o + p_ref[:C, 2:3]) * p_ref[:C, 3:4]
    if add_residual:
        o = res_ref[...].astype(jnp.float32) + o
    o_ref[...] = o.astype(o_ref.dtype)


def _pick_mt(c: int, itemsize: int = 2) -> int:
    # the (C4, mt) fp32 GELU input dominates the tile budget, same math
    # as _pick_tt for the tokens-major twin
    mt = 1024 if c <= 256 else 512
    return mt // 2 if itemsize >= 4 else mt


def _mlp_cmajor_2d(yc, resc, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                   pre_bias, add_residual, interpret):
    """(C, M) C-major core. Returns (C, M)."""
    C, M = yc.shape
    C4 = w1.shape[1]
    mt = _pick_mt(C, jnp.dtype(yc.dtype).itemsize)
    Mp = -(-M // mt) * mt
    if Mp != M:
        # padded columns are pure zeros: var 0 -> rsqrt(eps), h = ln_bias;
        # harmless garbage in sliced-away lanes, never NaN
        yc = jnp.pad(yc, ((0, 0), (0, Mp - M)))
        resc = jnp.pad(resc, ((0, 0), (0, Mp - M)))
    pk = jnp.zeros((C4, 8), jnp.float32)
    pk = pk.at[:C, 0].set(ln_scale).at[:C, 1].set(ln_bias)
    pk = pk.at[:C, 2].set(b2).at[:C, 3].set(gamma)
    pk = pk.at[:C, 4].set(pre_bias).at[:, 5].set(b1)
    kern = functools.partial(_mlp_cmajor_kernel, C=C,
                             add_residual=add_residual)
    out = pl.pallas_call(
        kern,
        grid=(Mp // mt,),
        in_specs=[
            pl.BlockSpec((C, mt), lambda m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, mt), lambda m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, 8), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, mt), lambda m: (0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Mp), yc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(yc, resc, pk,
      jnp.transpose(w1).astype(yc.dtype), jnp.transpose(w2).astype(yc.dtype))
    return out[:, :M] if Mp != M else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_mlp_cmajor(yc: Array, resc: Array, ln_scale: Array, ln_bias: Array,
                     w1: Array, b1: Array, w2: Array, b2: Array, gamma: Array,
                     pre_bias: Array = None,
                     add_residual: bool = True,
                     interpret: bool = False) -> Array:
    """C-major fused block tail: same math as :func:`fused_mlp` on
    (C, H, W, N) (or already-flat (C, M)) activations — the layout the
    banded conv kernels emit. yc is the conv output, resc the block
    shortcut; see the C-major block comment above."""
    shp = yc.shape
    out = _mlp_cmajor_2d(yc.reshape(shp[0], -1), resc.reshape(shp[0], -1),
                         ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                         pre_bias, add_residual, interpret)
    return out.reshape(shp)


def _cmajor_vjp_fwd(yc, resc, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    pre_bias, add_residual, interpret):
    out = fused_mlp_cmajor(yc, resc, ln_scale, ln_bias, w1, b1, w2, b2,
                           gamma, pre_bias, add_residual, interpret)
    res0 = jnp.zeros((), resc.dtype)
    return out, (yc, res0, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                 pre_bias)


def _cmajor_vjp_bwd(add_residual, interpret, resids, g):
    """Delegates to the tokens-major backward kernels via two transposes —
    only differentiated-eval forwards (e.g. ERF analysis) take this path;
    training uses the tokens-major :func:`fused_mlp`."""
    yc, res0, ln_scale, ln_bias, w1, b1, w2, b2, gamma, pre_bias = resids
    shp = yc.shape
    C = shp[0]
    y2 = jnp.transpose(yc.reshape(C, -1))               # (M, C)
    g2 = jnp.transpose(g.reshape(C, -1))
    bwd = _mlp_bwd_2d if fused_mlp_bwd_ok(C) else _mlp_bwd_chunked_2d
    dy, dw1, dw2, db1, db2, dgamma, dlns, dlnb = bwd(
        y2, g2, ln_scale, ln_bias, w1, b1, w2, b2, gamma, pre_bias,
        interpret)
    dres = (g.astype(res0.dtype) if add_residual
            else jnp.zeros(g.shape, res0.dtype))
    dpre = jnp.sum(dy.astype(jnp.float32), axis=0).astype(pre_bias.dtype)
    return (jnp.transpose(dy).reshape(shp).astype(yc.dtype), dres,
            dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dgamma.astype(gamma.dtype), dpre)


fused_mlp_cmajor.defvjp(_cmajor_vjp_fwd, _cmajor_vjp_bwd)


# ---------------------------------------------------------------------------
# Dual-orientation C-major variant: the zero-glue resident block tail
#
# The dual-resident eval stage keeps BOTH orientations of the activation
# live — xh (C, H, W, N) for the LoRA1 conv and xq (C, W, H, N) for
# LoRA2 — so the pair conv kernel runs with dual inputs AND dual outputs
# (no halo pads, no transposes, no add pass; _pair_kernel_dualin_dualout).
# This kernel closes the loop: per (h, batch-block) grid step it reads the
# y1 tile (C, 1, W, nb), the matching y2 tile (C, W, 1, nb) — the
# "transpose" is pure grid indexing, no data shuffle — sums the branches,
# runs LN+MLP+gamma+residual on the (C, W, nb) tile (dots contract the
# leading C axis; Mosaic merges (W, nb) onto lanes exactly as in the
# banded conv kernels), and writes the block output in BOTH orientations,
# again via grid indexing only. A resident block therefore has ZERO XLA
# layout ops.
#
# MEASURED OUTCOME (tools/probe_eval_ab.py, v5e bs256 bf16 full-model
# chain/3, 2026-08-19): dual 161.6 ms/pass vs cmajor-split 133.7 vs
# per-block NHWC 140.1 — zero-glue LOSES. The doubled orientation writes
# (the pair conv emits y1+y2 unsummed, this kernel emits oh+oq) plus the
# (C, W, nb) tile shape cost more than the ~2 per-block XLA transposes
# they remove. Kept as a tested variant (eval_layout='dual'); the
# default resident path is the single-orientation split (slak.py).
# ---------------------------------------------------------------------------


def _mlp_cmajor_dual_kernel(y1_ref, y2_ref, res_ref, p_ref, w1t_ref,
                            w2t_ref, *out_refs, C: int, emit_q: bool):
    def pc(col):                                   # per-channel (C, 1, 1)
        return p_ref[:C, col:col + 1][:, :, None]
    # branch add in the compute dtype (bit-matches the split path's XLA
    # bf16 add), then up to fp32 for the LN
    y = (y1_ref[:, 0] + y2_ref[...]).astype(jnp.float32)      # (C, W, nb)
    yf = y + pc(4)                                 # + pre_bias
    mu = jnp.mean(yf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=0, keepdims=True)
    h = (yf - mu) * lax.rsqrt(var + LN_EPS)
    h = h * pc(0) + pc(1)
    cdt = y1_ref.dtype
    a = lax.dot_general(w1t_ref[...], h.astype(cdt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (C4, W, nb)
    g = _gelu_exact(a + p_ref[:, 5:6][:, :, None])
    o = lax.dot_general(w2t_ref[...], g.astype(cdt),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (C, W, nb)
    o = (o + pc(2)) * pc(3)
    o = res_ref[:, 0].astype(jnp.float32) + o
    ob = o.astype(out_refs[0].dtype)
    out_refs[0][:, 0] = ob
    if emit_q:
        out_refs[1][...] = ob


def fused_mlp_cmajor_dual_raw(y1, y2, resh, ln_scale, ln_bias, w1, b1,
                              w2, b2, gamma, pre_bias, emit_q, interpret):
    """y1, resh: (C, H, W, N); y2: (C, W, H, N). Returns (oh, oq) —
    oq is None when ``emit_q`` is False (last block of a stage)."""
    C, H, W, N = y1.shape
    C4 = w1.shape[1]
    nb = min(128, N) if N % 128 == 0 else N
    assert interpret or N % nb == 0
    nB = N // nb
    pk = jnp.zeros((C4, 8), jnp.float32)
    pk = pk.at[:C, 0].set(ln_scale).at[:C, 1].set(ln_bias)
    pk = pk.at[:C, 2].set(b2).at[:C, 3].set(gamma)
    pk = pk.at[:C, 4].set(pre_bias).at[:, 5].set(b1)
    kern = functools.partial(_mlp_cmajor_dual_kernel, C=C, emit_q=emit_q)
    # Mosaic's last-two-dims rule forbids a (.., 1, nb) block on the
    # (C, W, H, N) q-orientation (the 1 sits on H). The trailing (H, N)
    # dims are contiguous, so flatten them to H*N OUTSIDE the kernel (a
    # free reshape) and index (C, W, nb) blocks at h*nB + n — the same
    # pure-grid-indexing "transpose", lowering-legal.
    out_specs = [pl.BlockSpec((C, 1, W, nb), lambda h, n: (0, h, 0, n),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((C, H, W, N), y1.dtype)]
    if emit_q:
        out_specs.append(
            pl.BlockSpec((C, W, nb), lambda h, n: (0, 0, h * nB + n),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((C, W, H * N), y1.dtype))
    out = pl.pallas_call(
        kern,
        grid=(H, nB),
        in_specs=[
            pl.BlockSpec((C, 1, W, nb), lambda h, n: (0, h, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, W, nb), lambda h, n: (0, 0, h * nB + n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1, W, nb), lambda h, n: (0, h, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, 8), lambda h, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C4, C), lambda h, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C4), lambda h, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(y1, y2.reshape(C, W, H * N), resh, pk,
      jnp.transpose(w1).astype(y1.dtype), jnp.transpose(w2).astype(y1.dtype))
    if emit_q:
        return out[0], out[1].reshape(C, W, H, N)
    return out[0], None


def _reference_mlp_dual(y1, y2, resh, ln_scale, ln_bias, w1, b1, w2, b2,
                        gamma, pre_bias, emit_q):
    """Differentiable jnp twin of the dual kernel (tests + VJP backward)."""
    y = y1 + jnp.swapaxes(y2, 1, 2)                # compute-dtype add
    # tokens-major reference on the transposed view
    out = _reference_mlp(jnp.transpose(y, (3, 1, 2, 0)),
                         jnp.transpose(resh, (3, 1, 2, 0)),
                         ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                         pre_bias, True)
    oh = jnp.transpose(out, (3, 1, 2, 0))
    if not emit_q:
        return oh, None
    return oh, jnp.swapaxes(oh, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_mlp_cmajor_dual(y1: Array, y2: Array, resh: Array,
                          ln_scale: Array, ln_bias: Array,
                          w1: Array, b1: Array, w2: Array, b2: Array,
                          gamma: Array, pre_bias: Array,
                          emit_q: bool = True,
                          interpret: bool = False):
    return fused_mlp_cmajor_dual_raw(y1, y2, resh, ln_scale, ln_bias,
                                     w1, b1, w2, b2, gamma, pre_bias,
                                     emit_q, interpret)


def _dual_vjp_fwd(y1, y2, resh, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                  pre_bias, emit_q, interpret):
    out = fused_mlp_cmajor_dual(y1, y2, resh, ln_scale, ln_bias, w1, b1,
                                w2, b2, gamma, pre_bias, emit_q, interpret)
    return out, (y1, y2, resh, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                 pre_bias)


def _dual_vjp_bwd(emit_q, interpret, resids, cots):
    """Differentiated-eval-only path (e.g. ERF analysis): autodiff of the
    jnp twin — training never routes through the dual-resident stage."""
    def ref(*args):
        oh, oq = _reference_mlp_dual(*args, emit_q=emit_q)
        return (oh, oq) if emit_q else (oh,)
    cot = tuple(cots) if emit_q else (cots[0],)
    _, vjp = jax.vjp(ref, *resids)
    return vjp(cot)


fused_mlp_cmajor_dual.defvjp(_dual_vjp_fwd, _dual_vjp_bwd)


def _reference_mlp(y, res, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                   pre_bias, add_residual):
    """The exact op composition being fused (models/layers.py layer_norm +
    models/slak.py pwconv pair, plus the folded-BN bias add that precedes
    the LN in the eval conv path) — used for the VJP backward and as the
    non-TPU fallback."""
    yf = y.astype(jnp.float32) + pre_bias
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=-1, keepdims=True)
    h = ((yf - mu) * lax.rsqrt(var + LN_EPS) * ln_scale
         + ln_bias).astype(y.dtype)
    a = jnp.dot(h, w1.astype(h.dtype),
                preferred_element_type=jnp.float32) + b1
    g = jax.nn.gelu(a, approximate=False).astype(y.dtype)
    o = jnp.dot(g, w2.astype(g.dtype),
                preferred_element_type=jnp.float32) + b2
    o = o * gamma
    if add_residual:
        o = res.astype(jnp.float32) + o
    return o.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_mlp(y: Array, res: Array, ln_scale: Array, ln_bias: Array,
              w1: Array, b1: Array, w2: Array, b2: Array, gamma: Array,
              pre_bias: Array = None,
              add_residual: bool = True, interpret: bool = False) -> Array:
    """NHWC fused block tail: ``res + gamma * pw2(gelu(pw1(LN(y + pre_bias))))``
    (or just the branch when ``add_residual=False`` — the train-mode
    drop-path multiplies outside). y, res: (N, H, W, C); pre_bias is the
    per-channel folded-BN bias of the preceding eval conv, added to the
    LN input in-VMEM so the eval path skips a full elementwise pass over
    the activation."""
    shp = y.shape
    out = _mlp_fused_2d(y.reshape(-1, shp[-1]), res.reshape(-1, shp[-1]),
                        ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                        pre_bias, add_residual, interpret)
    return out.reshape(shp)


def _vjp_fwd(y, res, ln_scale, ln_bias, w1, b1, w2, b2, gamma, pre_bias,
             add_residual, interpret):
    out = fused_mlp(y, res, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    pre_bias, add_residual, interpret)
    # the backward needs res only for dres's shape/dtype (res.shape ==
    # y.shape); saving the full tensor would keep the shortcut alive
    # through every block's backward — save a dtype-carrying scalar instead.
    res0 = jnp.zeros((), res.dtype)
    return out, (y, res0, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                 pre_bias)


def _vjp_bwd(add_residual, interpret, resids, g):
    y, res0, ln_scale, ln_bias, w1, b1, w2, b2, gamma, pre_bias = resids
    shp = y.shape
    C = shp[-1]
    bwd = _mlp_bwd_2d if fused_mlp_bwd_ok(C) else _mlp_bwd_chunked_2d
    dy, dw1, dw2, db1, db2, dgamma, dlns, dlnb = bwd(
        y.reshape(-1, C), g.reshape(-1, C), ln_scale, ln_bias,
        w1, b1, w2, b2, gamma, pre_bias, interpret)
    dres = (g.astype(res0.dtype) if add_residual
            else jnp.zeros(g.shape, res0.dtype))
    # y' = y + pre_bias enters only the LN, so d pre_bias is the
    # token-sum of the LN-input cotangent dy
    dpre = jnp.sum(dy.astype(jnp.float32), axis=0).astype(pre_bias.dtype)
    return (dy.reshape(shp).astype(y.dtype), dres,
            dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dgamma.astype(gamma.dtype), dpre)


fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)
