"""The SLaK model family, TPU-native (NHWC, functional, jit-friendly).

Re-implements the behavior of the reference ``models/SLaK.py`` (ConvNeXt
skeleton + ReparamLargeKernelConv with decomposed rectangular large kernels):

  * 4 stages, stem = conv 4x4/s4 + LN, downsample = LN + conv 2x2/s2
    (reference models/SLaK.py:188-199).
  * Block = large-kernel dwconv -> LN -> Linear(4x) -> GELU -> Linear ->
    gamma * -> droppath residual (reference models/SLaK.py:126-166). In NHWC
    the reference's NCHW<->NHWC permute dance (models/SLaK.py:156-163)
    disappears.
  * ReparamLargeKernelConv (reference models/SLaK.py:60-123): when
    ``decom``, branches LoRA1 (K x s) + LoRA2 (s x K) [+ small s x s when
    s < K], each conv+BN, summed. When not decom: one K x K branch
    [+ small]. ``merge`` folds BN and recenters the small kernel into a
    single conv for deployment (models/SLaK.py:102-122).
  * kernel_size is a 5-list: 4 per-stage kernel sizes + trailing small
    kernel; ConvNeXt mode is [7,7,7,7,100] which disables the small branch
    (small >= K) (reference README.md:137, models/SLaK.py:85-87).

Parameters are plain nested dicts (pytrees); BN running stats live in a
separate ``state`` tree so grads stay clean. All functions are pure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from slak_tpu.models.layers import (LN_EPS, layer_norm, gelu, drop_path,
                                    trunc_normal)
from slak_tpu.ops.batchnorm import batch_norm, fold_bn
from slak_tpu.ops.depthwise import depthwise_conv2d, large_kernel_conv

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SLaKConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    kernel_size: Tuple[int, ...] = (51, 49, 47, 13, 5)  # 4 stage Ks + small
    width_factor: float = 1.0
    decom: bool = True               # reference flag ``Decom``
    branch_bn: bool = True           # reference flag ``bn``: BN on each branch
    num_classes: int = 1000
    in_chans: int = 3
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    head_init_scale: float = 1.0
    conv_impl: str = "auto"          # 'auto' | 'xla' | 'grouped' | 'banded'
    mlp_impl: str = "auto"           # 'auto' (fused Pallas when it fits) | 'xla'
    # Eval activation layout for qualifying stages (_stage_resident_ok):
    #   'auto'/'cmajor' — single-resident (C,H,W,N) with per-block pads
    #     and an orientation transpose (RESIDENT_PAIR_IMPL picks the pair
    #     mode); the measured winner (see below);
    #   'dual' — DUAL-resident: both C-major orientations (C,H,W,N) +
    #     (C,W,H,N) stay live across the stage; the pair conv runs
    #     dual-in/dual-out and the MLP kernel reads/writes both
    #     orientations via grid indexing — ZERO XLA layout ops per block.
    #     Measured SLOWER (tools/probe_eval_ab.py, v5e bs256 bf16 chain/3,
    #     2026-08-19): dual 161.6 ms/pass vs cmajor-split 133.7 vs NHWC
    #     140.1 — the dual orientation writes (conv pair + MLP each emit
    #     both orientations) and the (C, W, nb) MLP tiling cost more than
    #     the per-block transposes they remove; kept as a tested variant;
    #   'nhwc' — the per-block NHWC round trips (A/B + fallback).
    eval_layout: str = "auto"
    # Train activation layout for qualifying stages
    # (_stage_resident_train_ok): 'auto'/'cmajor' — C-major resident train
    # blocks (the banded custom-VJP pair with zero NHWC adapters + a
    # C-contracted XLA MLP; 'auto' additionally consults the measured
    # per-stage table TRAIN_RESIDENT_STAGES); 'nhwc' — the per-branch
    # NHWC round trips (A/B + fallback).
    train_layout: str = "auto"
    # Per-block activation rematerialization for the TRAIN forward
    # (jax.checkpoint): only block boundaries stay live across the
    # backward, each block's interior recomputes. Trades one extra block
    # forward of FLOPs for the dominant activation-memory term — the
    # TPU-native answer to the reference's multi-GPU memory headroom
    # (SLaK-B bs128 needs 17.2G unremat'd and OOMs a 15.75G v5e chip).
    # No reference analog: torch SLaK never checkpoints activations.
    remat: bool = False
    # Run the Pallas kernels in interpret mode (CPU testing / multi-chip
    # dryruns of the real kernel routing; lifts the batch%128 constraint).
    pallas_interpret: bool = False
    bn_axis_name: Optional[str] = None  # SyncBN over this mesh axis if set

    def __post_init__(self):
        if self.eval_layout not in ("auto", "cmajor", "dual", "nhwc"):
            raise ValueError(
                f"eval_layout must be one of auto/cmajor/dual/nhwc, got "
                f"{self.eval_layout!r}")
        if self.train_layout not in ("auto", "cmajor", "nhwc"):
            raise ValueError(
                f"train_layout must be one of auto/cmajor/nhwc, got "
                f"{self.train_layout!r}")
        if self.conv_impl not in ("auto", "xla", "grouped", "banded"):
            raise ValueError(
                f"conv_impl must be one of auto/xla/grouped/banded, got "
                f"{self.conv_impl!r}")
        if self.mlp_impl not in ("auto", "xla"):
            raise ValueError(
                f"mlp_impl must be 'auto' or 'xla', got {self.mlp_impl!r}")

    @property
    def widened_dims(self) -> Tuple[int, ...]:
        return tuple(int(d * self.width_factor) for d in self.dims)

    @property
    def small_kernel(self) -> int:
        return self.kernel_size[-1]

    def stage_kernel(self, i: int) -> int:
        return self.kernel_size[i]

    def has_small_branch(self, i: int) -> bool:
        return self.small_kernel < self.stage_kernel(i)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _conv_init(rng, kh, kw, cin, cout, bias=True):
    p = {"w": trunc_normal(rng, (kh, kw, cin, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _dense_init(rng, cin, cout):
    return {"w": trunc_normal(rng, (cin, cout)),
            "b": jnp.zeros((cout,), jnp.float32)}


def _ln_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _branch_init(rng, kh, kw, c, branch_bn):
    """One conv(+BN) branch of the large-kernel conv. Weight (kh, kw, C)."""
    params = {"w": trunc_normal(rng, (kh, kw, c))}
    state = {}
    if branch_bn:
        params["bn"] = {"scale": jnp.ones((c,), jnp.float32),
                        "bias": jnp.zeros((c,), jnp.float32)}
        state["bn"] = {"mean": jnp.zeros((c,), jnp.float32),
                       "var": jnp.ones((c,), jnp.float32)}
    return params, state


def _lk_init(rng, cfg: SLaKConfig, stage: int, c: int):
    k = cfg.stage_kernel(stage)
    s = cfg.small_kernel
    params, state = {}, {}
    keys = jax.random.split(rng, 3)
    if cfg.decom:
        params["LoRA1"], state["LoRA1"] = _branch_init(keys[0], k, s, c,
                                                       cfg.branch_bn)
        params["LoRA2"], state["LoRA2"] = _branch_init(keys[1], s, k, c,
                                                       cfg.branch_bn)
    else:
        params["origin"], state["origin"] = _branch_init(keys[0], k, k, c,
                                                         cfg.branch_bn)
    if cfg.has_small_branch(stage):
        params["small"], state["small"] = _branch_init(keys[2], s, s, c,
                                                       cfg.branch_bn)
    return params, state


def _block_init(rng, cfg: SLaKConfig, stage: int, c: int):
    keys = jax.random.split(rng, 4)
    lk_p, lk_s = _lk_init(keys[0], cfg, stage, c)
    params = {
        "lk": lk_p,
        "norm": _ln_init(c),
        "pwconv1": _dense_init(keys[1], c, 4 * c),
        "pwconv2": _dense_init(keys[2], 4 * c, c),
    }
    if cfg.layer_scale_init_value > 0:
        params["gamma"] = jnp.full((c,), cfg.layer_scale_init_value,
                                   jnp.float32)
    return params, {"lk": lk_s}


def init(rng: jax.Array, cfg: SLaKConfig) -> Tuple[Params, Params]:
    """Returns (params, state). state holds BN running stats."""
    dims = cfg.widened_dims
    n_keys = 6 + sum(cfg.depths)
    keys = iter(jax.random.split(rng, n_keys))

    downsample: List[Params] = []
    downsample.append({
        "conv": _conv_init(next(keys), 4, 4, cfg.in_chans, dims[0]),
        "norm": _ln_init(dims[0]),
    })
    for i in range(3):
        downsample.append({
            "norm": _ln_init(dims[i]),
            "conv": _conv_init(next(keys), 2, 2, dims[i], dims[i + 1]),
        })

    stages, stages_state = [], []
    for i in range(4):
        blocks, blocks_state = [], []
        for _ in range(cfg.depths[i]):
            bp, bs = _block_init(next(keys), cfg, i, dims[i])
            blocks.append(bp)
            blocks_state.append(bs)
        stages.append(blocks)
        stages_state.append(blocks_state)

    head = _dense_init(next(keys), dims[-1], cfg.num_classes)
    head = {"w": head["w"] * cfg.head_init_scale,
            "b": head["b"] * cfg.head_init_scale}

    params = {
        "downsample": downsample,
        "stages": stages,
        "norm": _ln_init(dims[-1]),
        "head": head,
    }
    state = {"stages": stages_state}
    return params, state


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _branch_forward(x, p, s, *, train, cfg: SLaKConfig):
    """conv(+BN) branch. Returns (y, new_branch_state)."""
    # train-mode 'auto': banded Pallas with its custom MXU VJP when the
    # shape gate passes (fwd = banded dots, dgrad = flipped-tap banded,
    # wgrad = per-channel (H, W*N)@(W*N, Hp) dots) — the TPU analog of the
    # reference's backward_data_fp32.cu / backward_filter_fp32.cu; plain
    # XLA otherwise (grouped-MXU's block-diagonal wgrad costs g x the
    # FLOPs and measured 3x slower end-to-end on v5e: 129 vs 382 img/s).
    impl = cfg.conv_impl
    if train and impl == "auto":
        from slak_tpu.ops.depthwise import banded_train_ok
        impl = ("banded" if banded_train_ok(x, p["w"], cfg.pallas_interpret)
                else "xla")
    new_s = dict(s)
    if train and impl == "banded" and "bn" in p:
        # fused epilogue: the banded kernel emits the BN batch sums, so
        # the statistics pass over y (one full HBM read per branch per
        # step) disappears; the custom VJP routes the sums' cotangents
        # (pallas_banded.depthwise_conv2d_banded_stats)
        from slak_tpu.ops.pallas_banded import depthwise_conv2d_banded_stats
        from slak_tpu.ops.batchnorm import batch_norm_from_sums
        y, s1, s2 = depthwise_conv2d_banded_stats(x, p["w"],
                                                  cfg.pallas_interpret)
        count = x.shape[0] * x.shape[1] * x.shape[2]
        y, m, v = batch_norm_from_sums(
            y, s1, s2, count, p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"], axis_name=cfg.bn_axis_name)
        new_s["bn"] = {"mean": m, "var": v}
        return y, new_s
    # conv bias only in bn-less variants (official ConvNeXt dwconv)
    y = depthwise_conv2d(x, p["w"], b=p.get("b"), impl=impl,
                         interpret=cfg.pallas_interpret)
    if "bn" in p:
        y, m, v = batch_norm(y, p["bn"]["scale"], p["bn"]["bias"],
                             s["bn"]["mean"], s["bn"]["var"], train=train,
                             axis_name=cfg.bn_axis_name if train else None)
        new_s["bn"] = {"mean": m, "var": v}
    return y, new_s


def _lk_forward(x, p, s, *, train, cfg: SLaKConfig):
    """ReparamLargeKernelConv forward (reference models/SLaK.py:89-100).

    Returns (y, deferred_bias, new_state): in the eval fast path the
    folded-BN bias is RETURNED instead of added (``defer_bias=True``) so
    the block can fold it into the fused MLP's in-VMEM LN input — one
    full elementwise pass over the activation saved per block; the block
    adds it explicitly when the fused tail is not taken."""
    if "reparam" in p:
        y = depthwise_conv2d(x, p["reparam"]["w"], b=p["reparam"]["b"],
                             impl=cfg.conv_impl,
                             interpret=cfg.pallas_interpret)
        return y, None, s

    branch_names = [n for n in ("LoRA1", "LoRA2", "origin", "small") if n in p]
    if not train and all("bn" in p[n] for n in branch_names):
        # eval fast path: fold each branch BN into an affine, fuse all
        # branches into one pass over the input.
        ws, scales, biases = [], [], []
        for n in branch_names:
            mult, add = fold_bn(p[n]["bn"]["scale"], p[n]["bn"]["bias"],
                                s[n]["bn"]["mean"], s[n]["bn"]["var"])
            ws.append(p[n]["w"])
            scales.append(mult)
            biases.append(add)
        out = large_kernel_conv(x, ws, scales, biases, impl=cfg.conv_impl,
                                interpret=cfg.pallas_interpret,
                                defer_bias=True)
        if isinstance(out, tuple):
            return out[0], out[1], s
        return out, None, s

    out = None
    new_s = {}
    for n in branch_names:
        y, new_s[n] = _branch_forward(x, p[n], s[n], train=train, cfg=cfg)
        out = y if out is None else out + y
    return out, None, new_s


# ---------------------------------------------------------------------------
# C-major resident eval stage (round 4)
#
# The round-4 eval trace attributed ~38 of 132 ms/pass to layout glue:
# the banded conv kernels want C-major (C, H, W, N), the tokens-major
# fused MLP wants (N*H*W, C), so every block paid 2-3 full-activation
# transposes plus 2 XLA halo pads. Qualifying stages now transpose ONCE
# at stage entry, run conv + MLP entirely in C-major (the fused pair
# kernel builds halos in VMEM; fused_mlp_cmajor works on (C, M) tiles),
# and transpose back at stage exit. Both conv sub-modes are exact
# (tested bit-level in interpret mode vs the NHWC path's kernels).
# ---------------------------------------------------------------------------

# 'split': two dwconv_banded_cmajor calls + halo pads + an add-transpose
#   (the NHWC path's kernels minus its NHWC round trips); fused
#   single-call modes 'input'/'kernel'/'dualout'/'dualboth' place the
#   LoRA2 orientation shuffle differently (see pallas_banded).
# Measured full-model eval, v5e bs256 bf16 chain/3 (tools/probe_eval_ab.py,
# 2026-08-19, raised scoped-vmem cap): split 134.5 ms/pass | dualout
# 134.3 | input 137.1 | kernel (in-kernel swap) 139.4 | per-block NHWC
# 139.8. split/dualout tie; split keeps the long-tested two-call kernels.
RESIDENT_PAIR_IMPL = "split"

# Experiment knob (round 4, CLOSED): route TRAIN-mode fused MLP through
# the Pallas fwd + F-chunked bwd for C > fused_mlp_bwd_ok's monolithic
# limit (stage 3, C=499). The round-4 train trace showed the in-situ XLA
# stage-3 MLP at ~29 ms/step vs a ~4 ms compute floor (N-minor layouts
# inherited from the C-major conv custom-calls), suggesting the kernels
# could win at step level despite the round-3 chain wash (7.17 vs 6.97
# ms). MEASURED (tools/probe_wide_mlp.py, v5e bs128 bf16 full train
# step, 2026-08-19): wide=False 258.6 ms (495 img/s) vs wide=True
# 261.7 ms — the chunked bwd pays the same layout tax on entry, so XLA
# keeps stage 3-4 training. Stays False by measurement.
TRAIN_WIDE_MLP_BWD = False


def _fold_eval_pair(p, s):
    """Eval-folded decomposed pair: returns (w1e, w2e, bias_total) with
    branch BNs folded into tap scales, the small branch center-padded into
    LoRA1's (K, s) taps (exact for stride-1 same-padded odd kernels — the
    reference's own merge identity, models/SLaK.py:102-122), and the
    deferred per-channel bias. Mirrors large_kernel_conv's fold order so
    the resident path is bit-comparable to the NHWC eval path."""
    m1, a1 = fold_bn(p["LoRA1"]["bn"]["scale"], p["LoRA1"]["bn"]["bias"],
                     s["LoRA1"]["bn"]["mean"], s["LoRA1"]["bn"]["var"])
    m2, a2 = fold_bn(p["LoRA2"]["bn"]["scale"], p["LoRA2"]["bn"]["bias"],
                     s["LoRA2"]["bn"]["mean"], s["LoRA2"]["bn"]["var"])
    w1e = p["LoRA1"]["w"] * m1.astype(p["LoRA1"]["w"].dtype)
    w2e = p["LoRA2"]["w"] * m2.astype(p["LoRA2"]["w"].dtype)
    bias_total = None
    if "small" in p:
        ms, as_ = fold_bn(p["small"]["bn"]["scale"], p["small"]["bn"]["bias"],
                          s["small"]["bn"]["mean"], s["small"]["bn"]["var"])
        ws = p["small"]["w"] * ms.astype(p["small"]["w"].dtype)
        kh, kw, _ = w1e.shape
        sh, sw, _ = ws.shape
        ph, pw = (kh - sh) // 2, (kw - sw) // 2
        w1e = w1e + jnp.pad(ws, ((ph, kh - sh - ph), (pw, kw - sw - pw),
                                 (0, 0)))
        bias_total = as_
    bias_total = a1 if bias_total is None else bias_total + a1
    bias_total = bias_total + a2
    return w1e, w2e, bias_total


def _stage_resident_ok(cfg: SLaKConfig, blocks, n_batch: int, dtype) -> bool:
    if cfg.eval_layout == "nhwc":
        return False
    if cfg.conv_impl not in ("auto", "banded") or cfg.mlp_impl == "xla":
        return False
    from slak_tpu.ops.depthwise import _on_tpu
    from slak_tpu.ops.pallas_banded import batch_block
    from slak_tpu.ops.pallas_mlp import fused_mlp_ok
    interp = cfg.pallas_interpret
    if not (interp or _on_tpu()):
        return False
    if not (interp or batch_block(n_batch, dtype) is not None
            or n_batch >= 32):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    for bp in blocks:
        lk = bp["lk"]
        if "LoRA1" not in lk or "LoRA2" not in lk:
            return False
        # _fold_eval_pair folds exactly these branches; any other
        # bn-bearing branch (e.g. 'origin' from a hand-built checkpoint)
        # would be silently dropped — reject instead.
        if set(lk) - {"LoRA1", "LoRA2", "small"}:
            return False
        if not all("bn" in lk[n] for n in lk):
            return False
        kh, kw, c = lk["LoRA1"]["w"].shape
        if kh < 31 or kw >= kh or lk["LoRA2"]["w"].shape[:2] != (kw, kh):
            return False
        if "small" in lk and (lk["small"]["w"].shape[0] > kh
                              or lk["small"]["w"].shape[1] > kw):
            return False
        if not fused_mlp_ok(c, bp["pwconv1"]["w"].shape[1], itemsize, True):
            return False
    return True


def _block_forward_resident(xc, p, s, *, cfg: SLaKConfig):
    """One eval block on a C-major (C, H, W, N) resident activation."""
    from slak_tpu.ops.pallas_banded import (dwconv_banded_cmajor,
                                            dwpair_fused_cmajor)
    from slak_tpu.ops.pallas_mlp import fused_mlp_cmajor
    interp = cfg.pallas_interpret
    w1e, w2e, bias_total = _fold_eval_pair(p["lk"], s["lk"])
    if RESIDENT_PAIR_IMPL != "split":
        y = dwpair_fused_cmajor(xc, w1e, w2e, tmode=RESIDENT_PAIR_IMPL,
                                interpret=interp)
    else:
        pw = w1e.shape[1] // 2
        y1 = dwconv_banded_cmajor(
            jnp.pad(xc, ((0, 0), (0, 0), (pw, pw), (0, 0))), w1e,
            interpret=interp)
        y2 = dwconv_banded_cmajor(
            jnp.pad(jnp.transpose(xc, (0, 2, 1, 3)),
                    ((0, 0), (0, 0), (pw, pw), (0, 0))),
            jnp.transpose(w2e, (1, 0, 2)), interpret=interp)
        y = y1 + jnp.transpose(y2, (0, 2, 1, 3))
    c = p["pwconv1"]["w"].shape[0]
    gamma = p["gamma"] if "gamma" in p else jnp.ones((c,), jnp.float32)
    return fused_mlp_cmajor(
        y, xc, p["norm"]["scale"], p["norm"]["bias"],
        p["pwconv1"]["w"], p["pwconv1"]["b"],
        p["pwconv2"]["w"], p["pwconv2"]["b"], gamma,
        bias_total.astype(jnp.float32), True, interp)


def _stage_forward_dual(x, blocks, states, cfg: SLaKConfig):
    """Dual-resident eval stage: both C-major orientations live across the
    stage; every block is exactly two pallas calls with zero XLA layout
    ops between them (see the block comment above and pallas_mlp's
    dual-kernel comment)."""
    from slak_tpu.ops.pallas_banded import _pad_batch, dwpair_fused_cmajor
    from slak_tpu.ops.pallas_mlp import fused_mlp_cmajor_dual
    interp = cfg.pallas_interpret
    xp, n0 = _pad_batch(x, interp)
    xh = jnp.transpose(xp, (3, 1, 2, 0))             # (C, H, W, N)
    xq = jnp.transpose(xp, (3, 2, 1, 0))             # (C, W, H, N)
    for j, bp in enumerate(blocks):
        w1e, w2e, bias_total = _fold_eval_pair(bp["lk"], states[j]["lk"])
        y1, y2 = dwpair_fused_cmajor(xh, w1e, w2e, tmode="dualboth",
                                     interpret=interp, xq=xq,
                                     sum_out=False)
        c = bp["pwconv1"]["w"].shape[0]
        gamma = (bp["gamma"] if "gamma" in bp
                 else jnp.ones((c,), jnp.float32))
        xh, xq = fused_mlp_cmajor_dual(
            y1, y2, xh, bp["norm"]["scale"], bp["norm"]["bias"],
            bp["pwconv1"]["w"], bp["pwconv1"]["b"],
            bp["pwconv2"]["w"], bp["pwconv2"]["b"], gamma,
            bias_total.astype(jnp.float32), j < len(blocks) - 1, interp)
    x = jnp.transpose(xh, (3, 1, 2, 0))
    return x if x.shape[0] == n0 else x[:n0]


# ---------------------------------------------------------------------------
# C-major resident TRAIN stage (round 5)
#
# Eval earned 1983 -> 2096 img/s by deleting the per-block layout glue
# (see the round-4 comment above); the train step still paid it twice —
# every branch's NHWC entry transposed x to C-major and back (fwd AND
# bwd, _vjp_stats_fwd/_vjp_bwd), and the stage-3/4 XLA MLP inherited an
# N-minor layout from the conv custom-calls (~29 ms/step vs a ~4 ms
# compute floor in the round-4 trace, ROADMAP.md). A resident train
# stage transposes ONCE at entry, runs the branches through the C-major
# custom VJP (pallas_banded.dwconv_banded_stats_cmajor_vjp — the same
# kernels, zero NHWC adapters), BN on caxis=0, and an MLP written as
# C-contracted dots — (C, 4C) x (C, M) — so XLA sees the M-major layout
# natively in both directions of autodiff. No batch padding: the gate
# requires N % 128 == 0 when compiled, keeping BN sums and wgrad exact.
# ---------------------------------------------------------------------------

# Per-stage routing for train_layout='auto', set by measurement
# (tools/probe_train_layout.py, SLaK-T 51x51 w1.3 bs128 bf16 full train
# step, TPU 2026-08-20, median of 5):
#   0000 265.6 ms | 0010 260.5 | 0001 270.0 | 0011 272.2 | 1100 271.3 |
#   1111 278.3.
# Only stage 3 wins resident: stages 1-2 trade the fused Pallas MLP
# backward for the resident layout and lose, and stage 4 (C=998, 7x7
# maps) is faster through the fused Pallas MLP than through the
# C-contracted XLA dots. Re-run the probe before changing.
TRAIN_RESIDENT_STAGES = (False, False, True, False)

# MLP tail of the resident train block: 'xla' = C-contracted dots (XLA
# autodiff), 'fused' = fused_mlp_cmajor (Pallas LN+MLP fwd; bwd via the
# tokens-major wide-chunked kernel behind two cheap (C,M) transposes).
# A/B with probe_train_layout.py masks '0010' vs '0010f'. Measured
# (v5e bs128 bf16 full train step, 2026-08-20): 'fused' 264.3 ms vs
# 'xla' 265.3 — a wash; the fused fwd's win is cancelled by the
# chunked bwd's NF-fold LN/h recompute (see _mlp_bwd_chunked_kernel
# docstring), so the simpler XLA autodiff tail stays the default.
TRAIN_RESIDENT_MLP = "xla"


def _stage_resident_train_ok(cfg: SLaKConfig, blocks, x, stage_idx: int) \
        -> bool:
    """Gate for the C-major resident TRAIN stage: every branch must ride
    the banded custom-VJP path (decomposed rectangular pair at K >= 31,
    or the 2-D tiny-map route) with branch BN, and the batch must tile
    the 128-lane blocks exactly (no padding — padded rows would corrupt
    the NEXT block's BN sums and wgrad once the MLP makes them nonzero)."""
    if cfg.train_layout == "nhwc":
        return False
    if cfg.conv_impl not in ("auto", "banded"):
        return False
    if (cfg.train_layout == "auto"
            and not TRAIN_RESIDENT_STAGES[min(stage_idx, 3)]):
        return False
    from slak_tpu.ops.depthwise import _on_tpu
    from slak_tpu.ops.pallas_banded import batch_block, use_banded2d
    interp = cfg.pallas_interpret
    if not (interp or _on_tpu()):
        return False
    if not (interp or batch_block(x.shape[0], x.dtype) is not None):
        return False
    H, W = x.shape[1], x.shape[2]
    itemsize = jnp.dtype(x.dtype).itemsize
    for bp in blocks:
        lk = bp["lk"]
        if "LoRA1" not in lk or "LoRA2" not in lk:
            return False
        if set(lk) - {"LoRA1", "LoRA2", "small"}:
            return False
        if not all("bn" in lk[n] for n in lk):
            return False
        kh, kw, _ = lk["LoRA1"]["w"].shape
        if kh % 2 != 1 or kw % 2 != 1:
            return False
        if lk["LoRA2"]["w"].shape[:2] != (kw, kh):
            return False
        if not (use_banded2d(H, W, kh, kw, itemsize)
                or (max(kh, kw) >= 31 and kh != kw)):
            return False
        if "small" in lk:
            sh, sw, _ = lk["small"]["w"].shape
            if sh % 2 != 1 or sw % 2 != 1:
                return False
    return True


def _branch_forward_resident_train(xc, p, s, *, cfg: SLaKConfig):
    """One conv(+BN) branch on a (C, H, W, N) resident activation, train
    mode. The rectangular pair and the tiny-map shapes ride the C-major
    banded custom VJP with the stats-fused BN epilogue; the small (s, s)
    branch at large maps uses XLA's grouped conv with CHWN dimension
    numbers (its banded form would cost as much as the long branch — the
    band lives inside an (H, H) matrix regardless of K)."""
    from slak_tpu.ops.batchnorm import batch_norm_from_sums
    from slak_tpu.ops.depthwise import depthwise_conv2d_xla_cmajor
    from slak_tpu.ops.pallas_banded import (dwconv_banded_stats_cmajor_vjp,
                                            use_banded2d)
    C, H, W, N = xc.shape
    kh, kw, _ = p["w"].shape
    interp = cfg.pallas_interpret
    itemsize = jnp.dtype(xc.dtype).itemsize
    new_s = dict(s)
    if "bn" in p and (use_banded2d(H, W, kh, kw, itemsize)
                      or max(kh, kw) >= 31):
        if kw > kh and not use_banded2d(H, W, kh, kw, itemsize):
            # (s, K) orientation: same kernels on the (C, W, H, N) view
            xq = jnp.transpose(xc, (0, 2, 1, 3))
            y, s1, s2 = dwconv_banded_stats_cmajor_vjp(
                xq, jnp.transpose(p["w"], (1, 0, 2)), interp)
            y = jnp.transpose(y, (0, 2, 1, 3))
        else:
            y, s1, s2 = dwconv_banded_stats_cmajor_vjp(xc, p["w"], interp)
        y, m, v = batch_norm_from_sums(
            y, s1, s2, H * W * N, p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"], axis_name=cfg.bn_axis_name,
            caxis=0)
        new_s["bn"] = {"mean": m, "var": v}
        return y, new_s
    y = depthwise_conv2d_xla_cmajor(xc, p["w"])
    if "b" in p:
        y = y + p["b"].astype(y.dtype)[:, None, None, None]
    if "bn" in p:
        from slak_tpu.ops.batchnorm import batch_norm
        y, m, v = batch_norm(y, p["bn"]["scale"], p["bn"]["bias"],
                             s["bn"]["mean"], s["bn"]["var"], train=True,
                             axis_name=cfg.bn_axis_name, caxis=0)
        new_s["bn"] = {"mean": m, "var": v}
    return y, new_s


def _block_forward_resident_train(xc, p, s, *, dp_rate, rng,
                                  cfg: SLaKConfig):
    """One train block on a (C, H, W, N) resident activation. The MLP
    tail is the plain XLA composition written C-contracted (same dtype
    discipline as the NHWC fallback in _block_forward so the two paths
    are parity-comparable); XLA autodiffs it natively — no layout
    handoff from the conv custom-calls in either direction."""
    shortcut = xc
    out = None
    new_s = {}
    for n in ("LoRA1", "LoRA2", "origin", "small"):
        if n not in p["lk"]:
            continue
        y, new_s[n] = _branch_forward_resident_train(
            xc, p["lk"][n], s["lk"][n], cfg=cfg)
        out = y if out is None else out + y
    c, c4 = p["pwconv1"]["w"].shape
    cdt = out.dtype
    from slak_tpu.ops.pallas_mlp import fused_mlp_cmajor, fused_mlp_ok
    if (TRAIN_RESIDENT_MLP == "fused" and cfg.mlp_impl != "xla"
            and fused_mlp_ok(c, c4, jnp.dtype(cdt).itemsize, True)):
        gamma = (p["gamma"] if "gamma" in p
                 else jnp.ones((c,), jnp.float32))
        pre_bias = jnp.zeros((c,), jnp.float32)
        args = (out, shortcut, p["norm"]["scale"], p["norm"]["bias"],
                p["pwconv1"]["w"], p["pwconv1"]["b"],
                p["pwconv2"]["w"], p["pwconv2"]["b"], gamma, pre_bias)
        interp = cfg.pallas_interpret
        if dp_rate > 0.0 and rng is not None:
            branch = fused_mlp_cmajor(*args, False, interp)
            return (shortcut + drop_path(branch, dp_rate, rng, True, axis=3),
                    {"lk": new_s})
        return fused_mlp_cmajor(*args, True, interp), {"lk": new_s}
    yf = out.astype(jnp.float32)
    mu = jnp.mean(yf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(yf - mu), axis=0, keepdims=True)
    h = (yf - mu) * lax.rsqrt(var + LN_EPS)
    h = (h * p["norm"]["scale"][:, None, None, None]
         + p["norm"]["bias"][:, None, None, None]).astype(cdt)
    shape4 = h.shape
    hm = h.reshape(c, -1)                                   # (C, M)
    a = lax.dot_general(p["pwconv1"]["w"].astype(cdt), hm,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                        ).astype(cdt)                       # (4C, M)
    a = a + p["pwconv1"]["b"].astype(cdt)[:, None]
    g = gelu(a)
    o = lax.dot_general(p["pwconv2"]["w"].astype(cdt), g,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32
                        ).astype(cdt)                       # (C, M)
    o = o + p["pwconv2"]["b"].astype(cdt)[:, None]
    if "gamma" in p:
        o = o * p["gamma"].astype(cdt)[:, None]
    o = o.reshape(shape4)
    o = drop_path(o, dp_rate, rng, True, axis=3)
    return shortcut + o, {"lk": new_s}


def _block_forward(x, p, s, *, train, dp_rate, rng, cfg: SLaKConfig):
    shortcut = x
    y, lk_bias, lk_state = _lk_forward(x, p["lk"], s["lk"], train=train,
                                       cfg=cfg)

    # Fused LN+MLP tail (Pallas, ops/pallas_mlp.py): keeps the 4C-wide
    # intermediate in VMEM — measured 1.41x/1.17x per stage-1/3 block over
    # the XLA op sequence on v5e; stage 4 (998, 3992) fuses in eval since
    # the 64M vmem cap (133.7 vs 134.9 ms/pass, tools/probe_mlp4.py).
    # Training additionally requires the fused backward kernel to fit
    # (C <= 256): hiding the composition from XLA's autodiff without a
    # real backward kernel measured 43 ms/step SLOWER than native remat,
    # and the F-chunked wide bwd measured a step-level loss (see
    # TRAIN_WIDE_MLP_BWD above).
    from slak_tpu.ops.depthwise import _on_tpu
    from slak_tpu.ops.pallas_mlp import (fused_mlp, fused_mlp_bwd_ok,
                                         fused_mlp_ok)
    c, c4 = p["pwconv1"]["w"].shape
    interp = cfg.pallas_interpret
    if (cfg.mlp_impl != "xla"
            and fused_mlp_ok(c, c4, jnp.dtype(y.dtype).itemsize,
                             _on_tpu() or interp)
            and (not train or fused_mlp_bwd_ok(c) or TRAIN_WIDE_MLP_BWD)):
        gamma = (p["gamma"] if "gamma" in p
                 else jnp.ones((c,), jnp.float32))
        pre_bias = (jnp.zeros((c,), jnp.float32) if lk_bias is None
                    else lk_bias.astype(jnp.float32))
        args = (y, shortcut, p["norm"]["scale"], p["norm"]["bias"],
                p["pwconv1"]["w"], p["pwconv1"]["b"],
                p["pwconv2"]["w"], p["pwconv2"]["b"], gamma, pre_bias)
        if train and dp_rate > 0.0 and rng is not None:
            branch = fused_mlp(*args, False, interp)
            return shortcut + drop_path(branch, dp_rate, rng, train), \
                {"lk": lk_state}
        return fused_mlp(*args, True, interp), {"lk": lk_state}

    if lk_bias is not None:
        y = y + lk_bias.astype(y.dtype)
    y = layer_norm(y, p["norm"]["scale"], p["norm"]["bias"])
    y = jnp.dot(y, p["pwconv1"]["w"].astype(y.dtype),
                preferred_element_type=jnp.float32).astype(y.dtype)
    y = y + p["pwconv1"]["b"].astype(y.dtype)
    y = gelu(y)
    y = jnp.dot(y, p["pwconv2"]["w"].astype(y.dtype),
                preferred_element_type=jnp.float32).astype(y.dtype)
    y = y + p["pwconv2"]["b"].astype(y.dtype)
    if "gamma" in p:
        y = y * p["gamma"].astype(y.dtype)
    y = drop_path(y, dp_rate, rng, train)
    return shortcut + y, {"lk": lk_state}


def _downsample_forward(x, p, idx):
    if idx == 0:
        w = p["conv"]["w"]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(4, 4), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p["conv"]["b"].astype(x.dtype)
        x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    else:
        x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
        w = p["conv"]["w"]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p["conv"]["b"].astype(x.dtype)
    return x


def _dp_rates(cfg: SLaKConfig) -> List[float]:
    total = sum(cfg.depths)
    if total == 1:
        return [0.0]
    return [cfg.drop_path_rate * i / (total - 1) for i in range(total)]


def forward_features(params, state, x, *, cfg: SLaKConfig, train=False,
                     rng=None, return_stages=False):
    """Backbone forward. Returns (pooled_features | stage list, new_state)."""
    dp = _dp_rates(cfg)

    def _nhwc_block(bx, bp, bs, block_rng, dp_rate):
        return _block_forward(bx, bp, bs, train=train, dp_rate=dp_rate,
                              rng=block_rng, cfg=cfg)

    def _res_train_block(bxc, bp, bs, block_rng, dp_rate):
        return _block_forward_resident_train(bxc, bp, bs, dp_rate=dp_rate,
                                             rng=block_rng, cfg=cfg)

    if train and cfg.remat:
        # dp_rate is static (python float); rng/arrays stay traced so the
        # checkpointed block keeps a single residual per block boundary.
        _nhwc_block = jax.checkpoint(_nhwc_block, static_argnums=(4,))
        _res_train_block = jax.checkpoint(_res_train_block,
                                          static_argnums=(4,))
    new_stages_state = []
    stage_outputs = []
    cur = 0
    for i in range(4):
        x = _downsample_forward(x, params["downsample"][i], i)
        blocks = params["stages"][i]
        if not train and _stage_resident_ok(cfg, blocks, x.shape[0],
                                            x.dtype):
            # C-major resident stage; eval leaves BN running stats
            # untouched, so state passes through.
            if cfg.eval_layout == "dual":
                x = _stage_forward_dual(x, blocks, state["stages"][i], cfg)
            else:                                   # 'auto'/'cmajor'
                from slak_tpu.ops.pallas_banded import _pad_batch
                xp, n0 = _pad_batch(x, cfg.pallas_interpret)
                xc = jnp.transpose(xp, (3, 1, 2, 0))
                for j, bp in enumerate(blocks):
                    xc = _block_forward_resident(
                        xc, bp, state["stages"][i][j], cfg=cfg)
                x = jnp.transpose(xc, (3, 1, 2, 0))
                if x.shape[0] != n0:
                    x = x[:n0]
            new_stages_state.append(list(state["stages"][i]))
            stage_outputs.append(x)
            cur += cfg.depths[i]
            continue
        if train and _stage_resident_train_ok(cfg, blocks, x, i):
            # C-major resident TRAIN stage: one transpose in, one out;
            # rng splits mirror the NHWC loop so drop-path masks match.
            xc = jnp.transpose(x, (3, 1, 2, 0))
            blocks_state = []
            for j, bp in enumerate(blocks):
                block_rng = None
                if rng is not None:
                    rng, block_rng = jax.random.split(rng)
                xc, bs = _res_train_block(
                    xc, bp, state["stages"][i][j], block_rng, dp[cur + j])
                blocks_state.append(bs)
            x = jnp.transpose(xc, (3, 1, 2, 0))
            new_stages_state.append(blocks_state)
            stage_outputs.append(x)
            cur += cfg.depths[i]
            continue
        blocks_state = []
        for j, bp in enumerate(blocks):
            block_rng = None
            if rng is not None and train:
                rng, block_rng = jax.random.split(rng)
            x, bs = _nhwc_block(
                x, bp, state["stages"][i][j], block_rng, dp[cur + j])
            blocks_state.append(bs)
        new_stages_state.append(blocks_state)
        stage_outputs.append(x)
        cur += cfg.depths[i]
    new_state = {"stages": new_stages_state}
    if return_stages:
        return stage_outputs, new_state
    pooled = jnp.mean(x, axis=(1, 2))  # GAP over H, W
    pooled = layer_norm(pooled, params["norm"]["scale"], params["norm"]["bias"])
    return pooled, new_state


def apply(params, state, x, *, cfg: SLaKConfig, train: bool = False,
          rng: Optional[jax.Array] = None):
    """Full classifier forward: (N,H,W,C) images -> (N, num_classes) logits.

    Returns (logits, new_state).
    """
    feats, new_state = forward_features(params, state, x, cfg=cfg,
                                        train=train, rng=rng)
    logits = jnp.dot(feats, params["head"]["w"].astype(feats.dtype),
                     preferred_element_type=jnp.float32)
    logits = logits + params["head"]["b"]
    return logits.astype(jnp.float32), new_state


# ---------------------------------------------------------------------------
# reparameterization (deployment merge, reference models/SLaK.py:102-122)
# ---------------------------------------------------------------------------


def _pad_center_2d(w: Array, kh: int, kw: int) -> Array:
    """Zero-pad a (h, w, C) kernel to (kh, kw, C) at the center."""
    h, wd, _ = w.shape
    ph, pw = (kh - h) // 2, (kw - wd) // 2
    return jnp.pad(w, ((ph, kh - h - ph), (pw, kw - wd - pw), (0, 0)))


def merge_lk(p, s, stage_kernel: int):
    """Fold BN and merge branches into a single (K, K, C) conv + bias.

    The reference only merges the non-Decom path (models/SLaK.py:111-122);
    we additionally support merging the decomposed rectangular branches by
    zero-padding them into the full K x K kernel — mathematically exact for
    stride-1 same-padded convs.
    """
    k = stage_kernel
    eq_w = None
    eq_b = None
    for name in ("LoRA1", "LoRA2", "origin", "small"):
        if name not in p:
            continue
        w = p[name]["w"]
        if "bn" in p[name]:
            mult, add = fold_bn(p[name]["bn"]["scale"], p[name]["bn"]["bias"],
                                s[name]["bn"]["mean"], s[name]["bn"]["var"])
            w = w * mult
            b = add
        else:
            b = p[name].get("b", jnp.zeros((w.shape[-1],), jnp.float32))
        w = _pad_center_2d(w, k, k)
        eq_w = w if eq_w is None else eq_w + w
        eq_b = b if eq_b is None else eq_b + b
    return {"reparam": {"w": eq_w, "b": eq_b}}


def merge_model(params, state, cfg: SLaKConfig):
    """Return params with every block's large-kernel conv reparameterized."""
    new_stages = []
    for i, blocks in enumerate(params["stages"]):
        nb = []
        for j, bp in enumerate(blocks):
            bp = dict(bp)
            bp["lk"] = merge_lk(bp["lk"], state["stages"][i][j]["lk"],
                                cfg.stage_kernel(i))
            nb.append(bp)
        new_stages.append(nb)
    out = dict(params)
    out["stages"] = new_stages
    return out


# ---------------------------------------------------------------------------
# model registry (reference models/SLaK.py:264-286, convnext.py:164-201)
# ---------------------------------------------------------------------------


class SLaK:
    """Thin OO wrapper bundling a config with init/apply."""

    def __init__(self, cfg: SLaKConfig):
        self.cfg = cfg

    def init(self, rng):
        return init(rng, self.cfg)

    def apply(self, params, state, x, **kw):
        return apply(params, state, x, cfg=self.cfg, **kw)

    def forward_features(self, params, state, x, **kw):
        return forward_features(params, state, x, cfg=self.cfg, **kw)

    def merge(self, params, state):
        return merge_model(params, state, self.cfg)


def _make(depths, dims, **kw) -> SLaK:
    return SLaK(SLaKConfig(depths=tuple(depths), dims=tuple(dims), **kw))


def slak_tiny(**kw):
    return _make([3, 3, 9, 3], [96, 192, 384, 768], **kw)


def slak_small(**kw):
    return _make([3, 3, 27, 3], [96, 192, 384, 768], **kw)


def slak_base(**kw):
    return _make([3, 3, 27, 3], [128, 256, 512, 1024], **kw)


def slak_large(**kw):
    return _make([3, 3, 27, 3], [192, 384, 768, 1536], **kw)


def _convnext_kw(kw):
    # ConvNeXt = SLaK with 7x7 kernels, no decomposition, no small branch
    # (reference README.md:137: kernel_size [7,7,7,7,100], Decom False).
    kw.setdefault("kernel_size", (7, 7, 7, 7, 100))
    kw.setdefault("decom", False)
    kw.setdefault("branch_bn", False)
    return kw


def convnext_tiny(**kw):
    return _make([3, 3, 9, 3], [96, 192, 384, 768], **_convnext_kw(kw))


def convnext_small(**kw):
    return _make([3, 3, 27, 3], [96, 192, 384, 768], **_convnext_kw(kw))


def convnext_base(**kw):
    return _make([3, 3, 27, 3], [128, 256, 512, 1024], **_convnext_kw(kw))


def convnext_large(**kw):
    return _make([3, 3, 27, 3], [192, 384, 768, 1536], **_convnext_kw(kw))


def convnext_xlarge(**kw):
    return _make([3, 3, 27, 3], [256, 512, 1024, 2048], **_convnext_kw(kw))


def slak_debug(**kw):
    """Tiny config for tests/CI smoke runs (not in the reference)."""
    kw.setdefault("kernel_size", (13, 11, 9, 7, 5))
    return _make([1, 1, 2, 1], [8, 16, 24, 32], **kw)


MODEL_REGISTRY = {
    "SLaK_debug": slak_debug,
    "SLaK_tiny": slak_tiny,
    "SLaK_small": slak_small,
    "SLaK_base": slak_base,
    "SLaK_large": slak_large,
    "convnext_tiny": convnext_tiny,
    "convnext_small": convnext_small,
    "convnext_base": convnext_base,
    "convnext_large": convnext_large,
    "convnext_xlarge": convnext_xlarge,
}


def create_model(name: str, **kw) -> SLaK:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kw)
