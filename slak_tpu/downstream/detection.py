"""Cascade Mask R-CNN on the SLaK backbone — the TPU-native rebuild of the
reference's mmdet stack (``detection/configs/_base_/models/
cascade_mask_rcnn_slak_fpn.py`` + the SLaK override config
``cascade_mask_rcnn_slak_tiny_..._3x_coco_in1k.py:15-27,135-141``).

Components (all functional, fixed-shape, jit-friendly):
  * FPN neck: lateral 1x1 + top-down nearest-2x + 3x3 smoothing, 5 outputs
    (P6 = stride-2 max pool of P5) — ``..._slak_fpn.py`` neck block.
  * RPN head: shared 3x3 conv + sigmoid cls + 4-delta reg over 3 anchors
    (scales [8], ratios [0.5, 1, 2], strides [4..64]).
  * MaxIoU assigner + random sampler, rank-based with static shapes
    (the TPU rule: counts become masks, never shapes).
  * RoIAlign: aligned bilinear (offset -0.5), 2x2 samples per bin
    (mmdet ``sampling_ratio=0`` adapts the sample count per RoI — a
    data-dependent shape; the fixed 2x2 grid is mmdet's common
    ``sampling_ratio=2`` setting, documented divergence).
  * 3-stage cascade of ConvFCBBoxHeads (4conv+1fc, BN, GIoU x10,
    ``reg_decoded_bbox``, class-specific regression, per-stage target stds
    [.1/.05/.033], IoU thresholds [.5/.6/.7], stage weights [1, .5, .25]).
  * FCN mask head: 4 convs + 2x deconv + per-class logits, BCE on 28x28
    RoI-cropped targets, trained at every cascade stage like mmdet's
    CascadeRoIHead.
  * Greedy NMS as a fixed-iteration suppression scan.

Training entry: :func:`cascade_loss` -> scalar + loss dict. Inference
entry: :func:`cascade_predict` -> fixed-size (boxes, scores, labels, masks).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from slak_tpu.models.layers import trunc_normal
from slak_tpu.ops.batchnorm import batch_norm

Array = jax.Array

EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class DetHeadConfig:
    """Cascade R-CNN head hyper-parameters (reference config values)."""
    in_channels: Tuple[int, ...] = (124, 249, 499, 998)
    fpn_channels: int = 256
    num_classes: int = 80
    anchor_scales: Tuple[int, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    # per-stage cascade settings
    stage_stds: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067))
    stage_iou_thr: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    num_shared_convs: int = 4         # ConvFCBBoxHead 4conv1fc
    fc_out: int = 1024
    roi_size: int = 7
    mask_roi_size: int = 14
    mask_size: int = 28
    mask_convs: int = 4
    # sampling
    rpn_sample: int = 256
    rpn_pos_fraction: float = 0.5
    rcnn_sample: int = 512
    rcnn_pos_fraction: float = 0.25
    # proposals
    num_proposals: int = 512          # post-NMS proposals kept (train+test)
    rpn_nms_iou: float = 0.7
    finest_scale: int = 56            # SingleRoIExtractor level mapping
    # losses
    giou_weight: float = 10.0
    rpn_smoothl1_beta: float = 1.0 / 9.0


# ---------------------------------------------------------------------------
# box utilities
# ---------------------------------------------------------------------------


def box_area(b: Array) -> Array:
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0)


def box_iou(a: Array, b: Array) -> Array:
    """a: (..., Na, 4), b: (..., Nb, 4) -> (..., Na, Nb)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, EPS)


def box_giou_pairwise(a: Array, b: Array) -> Array:
    """Matched pairs: a, b (..., 4) -> GIoU (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, EPS)
    # smallest enclosing box
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.maximum(erb - elt, 0)
    enc = ewh[..., 0] * ewh[..., 1]
    return iou - (enc - union) / jnp.maximum(enc, EPS)


def delta_encode(rois: Array, gts: Array, stds: Sequence[float]) -> Array:
    """DeltaXYWHBBoxCoder.encode (means 0)."""
    pw = jnp.maximum(rois[..., 2] - rois[..., 0], EPS)
    ph = jnp.maximum(rois[..., 3] - rois[..., 1], EPS)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    gw = jnp.maximum(gts[..., 2] - gts[..., 0], EPS)
    gh = jnp.maximum(gts[..., 3] - gts[..., 1], EPS)
    gx = (gts[..., 0] + gts[..., 2]) * 0.5
    gy = (gts[..., 1] + gts[..., 3]) * 0.5
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(gw / pw), jnp.log(gh / ph)], -1)
    return d / jnp.asarray(stds, d.dtype)


def delta_decode(rois: Array, deltas: Array, stds: Sequence[float],
                 max_hw: Optional[Tuple[int, int]] = None) -> Array:
    """DeltaXYWHBBoxCoder.decode (wh ratio clipped at 16/1000)."""
    import math
    d = deltas * jnp.asarray(stds, deltas.dtype)
    max_ratio = abs(math.log(16.0 / 1000.0))
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    gx = px + pw * d[..., 0]
    gy = py + ph * d[..., 1]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    out = jnp.stack([gx - gw * 0.5, gy - gh * 0.5,
                     gx + gw * 0.5, gy + gh * 0.5], -1)
    if max_hw is not None:
        h, w = max_hw
        out = jnp.stack([jnp.clip(out[..., 0], 0, w),
                         jnp.clip(out[..., 1], 0, h),
                         jnp.clip(out[..., 2], 0, w),
                         jnp.clip(out[..., 3], 0, h)], -1)
    return out


def make_anchors(feat_hw: Sequence[Tuple[int, int]],
                 cfg: DetHeadConfig) -> List[Array]:
    """Per-level anchors (Hi*Wi*A, 4), centered at (x+0.5)*stride."""
    out = []
    for (h, w), stride in zip(feat_hw, cfg.strides):
        base = []
        for r in cfg.anchor_ratios:
            for s in cfg.anchor_scales:
                bw = stride * s / (r ** 0.5)
                bh = stride * s * (r ** 0.5)
                base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = jnp.asarray(base, jnp.float32)              # (A, 4)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        cx, cy = jnp.meshgrid(xs, ys)                      # (h, w)
        ctr = jnp.stack([cx, cy, cx, cy], -1).reshape(-1, 1, 4)
        out.append((ctr + base[None]).reshape(-1, 4))
    return out


def nms_fixed(boxes: Array, scores: Array, iou_thr: float,
              k_out: int) -> Tuple[Array, Array]:
    """Greedy NMS with static shapes. boxes (K, 4) MUST be sorted by
    descending score already. Returns (keep_idx (k_out,), valid (k_out,))
    — indices into the input, score-ordered."""
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    live = scores > -jnp.inf  # all true; invalid boxes carry -inf scores

    def body(i, supp):
        alive_i = jnp.logical_not(supp[i]) & live[i]
        kill = alive_i & (iou[i] > iou_thr) & (jnp.arange(k) > i)
        return supp | kill

    supp = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep = jnp.logical_not(supp) & live
    # first k_out kept, in score order: rank kept entries by position
    pos = jnp.where(keep, jnp.arange(k), k)
    order = jnp.argsort(pos)[:k_out]
    valid = jnp.take(keep, order)
    return order, valid


# ---------------------------------------------------------------------------
# RoIAlign
# ---------------------------------------------------------------------------


def roi_align(feat: Array, rois: Array, out_size: int, stride: int,
              samples: int = 2) -> Array:
    """Aligned bilinear RoIAlign for one level. feat: (N, H, W, C);
    rois: (R, 5) as (batch_idx, x1, y1, x2, y2) in image coords.
    Returns (R, out_size, out_size, C)."""
    n, h, w, c = feat.shape
    bidx = rois[:, 0].astype(jnp.int32)
    b = rois[:, 1:] / float(stride)
    bw = jnp.maximum(b[:, 2] - b[:, 0], EPS)
    bh = jnp.maximum(b[:, 3] - b[:, 1], EPS)
    g = out_size * samples
    # sample-point centers, aligned convention (-0.5 offset)
    fx = b[:, 0, None] + (jnp.arange(g) + 0.5)[None] * (bw[:, None] / g) - 0.5
    fy = b[:, 1, None] + (jnp.arange(g) + 0.5)[None] * (bh[:, None] / g) - 0.5

    def bilinear(ff, yy, xx):
        """ff: (H, W, C); yy, xx: (g,) each -> (g, g, C) over the grid."""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy1 = (yy - y0)[:, None]
        wx1 = (xx - x0)[None, :]
        oky = ((yy > -1) & (yy < h))[:, None]
        okx = ((xx > -1) & (xx < w))[None, :]
        ok = (oky & okx)[..., None]
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        f00 = ff[y0i][:, x0i]
        f01 = ff[y0i][:, x1i]
        f10 = ff[y1i][:, x0i]
        f11 = ff[y1i][:, x1i]
        wy1e = wy1[..., None]
        wx1e = wx1[..., None]
        val = (f00 * (1 - wy1e) * (1 - wx1e) + f01 * (1 - wy1e) * wx1e
               + f10 * wy1e * (1 - wx1e) + f11 * wy1e * wx1e)
        return jnp.where(ok, val, 0.0)

    def per_roi(bi, yy, xx):
        ff = feat[bi]
        v = bilinear(ff, yy, xx)                     # (g, g, C)
        v = v.reshape(out_size, samples, out_size, samples, c)
        return v.mean((1, 3))

    return jax.vmap(per_roi)(bidx, fy, fx)


def map_roi_levels(rois: Array, num_levels: int, finest: int) -> Array:
    """SingleRoIExtractor level mapping: floor(log2(sqrt(area)/finest))."""
    scale = jnp.sqrt(jnp.maximum(box_area(rois[:, 1:]), EPS))
    lvl = jnp.floor(jnp.log2(scale / finest + EPS))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def extract_roi_features(feats: Sequence[Array], rois: Array,
                         out_size: int, cfg: DetHeadConfig) -> Array:
    """Multi-level RoIAlign: align on every level, select by mapped level
    (fixed shapes; the per-level gather is a masked sum)."""
    lvls = map_roi_levels(rois, len(feats), cfg.finest_scale)
    out = None
    for i, f in enumerate(feats):
        v = roi_align(f, rois, out_size, cfg.strides[i])
        sel = (lvls == i).astype(v.dtype)[:, None, None, None]
        out = v * sel if out is None else out + v * sel
    return out


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _conv_init(rng, kh, kw, cin, cout):
    return {"w": trunc_normal(rng, (kh, kw, cin, cout), std=0.01),
            "b": jnp.zeros((cout,), jnp.float32)}


def _dense_init(rng, cin, cout, std=0.01):
    return {"w": trunc_normal(rng, (cin, cout), std=std),
            "b": jnp.zeros((cout,), jnp.float32)}


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def init_cascade(rng: Array, cfg: DetHeadConfig) -> Tuple[Dict, Dict]:
    """Returns (params, state) for neck + rpn + cascade + mask heads."""
    keys = iter(jax.random.split(rng, 64))
    fc = cfg.fpn_channels
    params: Dict[str, Any] = {
        "fpn": {
            "lateral": [_conv_init(next(keys), 1, 1, cin, fc)
                        for cin in cfg.in_channels],
            "out": [_conv_init(next(keys), 3, 3, fc, fc)
                    for _ in cfg.in_channels],
        },
        "rpn": {
            "conv": _conv_init(next(keys), 3, 3, fc, fc),
            "cls": _conv_init(next(keys), 1, 1, fc,
                              len(cfg.anchor_ratios)),
            "reg": _conv_init(next(keys), 1, 1, fc,
                              4 * len(cfg.anchor_ratios)),
        },
        "stages": [],
        "mask": {"convs": [_conv_init(next(keys), 3, 3, fc, fc)
                           for _ in range(cfg.mask_convs)],
                 "deconv": _conv_init(next(keys), 2, 2, fc, fc),
                 "logits": _conv_init(next(keys), 1, 1, fc,
                                      cfg.num_classes)},
    }
    state: Dict[str, Any] = {"stages": []}
    flat = fc * cfg.roi_size * cfg.roi_size
    for _ in cfg.stage_stds:
        convs, bns, bns_s = [], [], []
        for _ in range(cfg.num_shared_convs):
            convs.append(_conv_init(next(keys), 3, 3, fc, fc))
            p, s = _bn_init(fc)
            bns.append(p)
            bns_s.append(s)
        params["stages"].append({
            "convs": convs, "bn": bns,
            "fc": _dense_init(next(keys), flat, cfg.fc_out),
            "cls": _dense_init(next(keys), cfg.fc_out, cfg.num_classes + 1),
            "reg": _dense_init(next(keys), cfg.fc_out,
                               4 * cfg.num_classes, std=0.001),
        })
        state["stages"].append({"bn": bns_s})
    return params, state


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1, pad="SAME"):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"].astype(y.dtype)


def fpn_forward(params, feats: Sequence[Array],
                cfg: DetHeadConfig) -> List[Array]:
    """4 backbone stages -> P2..P6 at cfg.fpn_channels."""
    lat = [_conv(f, p) for f, p in zip(feats, params["lateral"])]
    for i in range(len(lat) - 1, 0, -1):
        up = jnp.repeat(jnp.repeat(lat[i], 2, axis=1), 2, axis=2)
        lat[i - 1] = lat[i - 1] + up[:, :lat[i - 1].shape[1],
                                     :lat[i - 1].shape[2]]
    outs = [_conv(l, p) for l, p in zip(lat, params["out"])]
    # P6: stride-2 max pool of P5 (mmdet FPN extra level)
    p6 = lax.reduce_window(outs[-1], -jnp.inf, lax.max, (1, 1, 1, 1),
                           (1, 2, 2, 1), "SAME")
    outs.append(p6)
    return outs


def rpn_forward(params, feats: Sequence[Array]):
    """Shared RPN tower over levels -> (cls (N, sumA), reg (N, sumA, 4))."""
    cls_all, reg_all = [], []
    for f in feats:
        h = jax.nn.relu(_conv(f, params["conv"]))
        c = _conv(h, params["cls"])                  # (N, H, W, A)
        r = _conv(h, params["reg"])                  # (N, H, W, 4A)
        n = c.shape[0]
        cls_all.append(c.reshape(n, -1))
        reg_all.append(r.reshape(n, -1, 4))
    return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1)


def bbox_head_forward(params, bn_state, roi_feat: Array, train: bool,
                      cfg: DetHeadConfig):
    """ConvFCBBoxHead (4conv + 1fc): returns (cls_logits, deltas, new_bn)."""
    y = roi_feat
    new_bn = []
    for conv_p, bn_p, bn_s in zip(params["convs"], params["bn"],
                                  bn_state["bn"]):
        y = _conv(y, conv_p)
        y, m, v = batch_norm(y, bn_p["scale"], bn_p["bias"],
                             bn_s["mean"], bn_s["var"], train=train)
        new_bn.append({"mean": m, "var": v})
        y = jax.nn.relu(y)
    y = y.reshape(y.shape[0], -1)
    y = jax.nn.relu(jnp.dot(y, params["fc"]["w"].astype(y.dtype))
                    + params["fc"]["b"])
    cls = jnp.dot(y, params["cls"]["w"].astype(y.dtype)) + params["cls"]["b"]
    reg = jnp.dot(y, params["reg"]["w"].astype(y.dtype)) + params["reg"]["b"]
    return cls, reg.reshape(-1, cfg.num_classes, 4), {"bn": new_bn}


def mask_head_forward(params, roi_feat: Array) -> Array:
    """FCNMaskHead: (R, 14, 14, C) -> (R, 28, 28, num_classes) logits."""
    y = roi_feat
    for p in params["convs"]:
        y = jax.nn.relu(_conv(y, p))
    y = lax.conv_transpose(y, params["deconv"]["w"].astype(y.dtype),
                           (2, 2), "VALID",
                           dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y + params["deconv"]["b"].astype(y.dtype))
    return _conv(y, params["logits"])


# ---------------------------------------------------------------------------
# assignment + sampling (MaxIoUAssigner / RandomSampler, fixed shapes)
# ---------------------------------------------------------------------------


def assign_max_iou(boxes: Array, gt_boxes: Array, gt_valid: Array,
                   pos_thr: float, neg_thr: float,
                   match_low_quality: bool, min_pos_iou: float):
    """Returns (pos (B,), neg (B,), matched_gt (B,) int32)."""
    iou = box_iou(boxes, gt_boxes)                  # (B, G)
    iou = iou * gt_valid[None, :]
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    pos = best >= pos_thr
    neg = best < neg_thr
    if match_low_quality:
        # each gt's best box becomes positive (if IoU >= min_pos_iou)
        gt_best = jnp.max(iou, axis=0)              # (G,)
        is_gt_best = (iou == gt_best[None, :]) & (iou >= min_pos_iou) \
            & gt_valid[None, :].astype(bool)
        lq = jnp.any(is_gt_best, axis=1)
        arg = jnp.where(lq & ~pos, jnp.argmax(is_gt_best, axis=1), arg)
        pos = pos | lq
        neg = neg & ~pos
    return pos, neg & ~pos, arg


def random_sample(rng: Array, pos: Array, neg: Array, num: int,
                  pos_fraction: float):
    """RandomSampler with static shapes: returns (pos_sel, neg_sel) bool
    masks with at most num total and num*pos_fraction positives."""
    k1, k2 = jax.random.split(rng)
    max_pos = int(num * pos_fraction)
    r1 = jax.random.uniform(k1, pos.shape)
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(pos, r1, 2.0)))
    pos_sel = pos & (pos_rank < max_pos)
    n_pos = jnp.sum(pos_sel)
    r2 = jax.random.uniform(k2, neg.shape)
    neg_rank = jnp.argsort(jnp.argsort(jnp.where(neg, r2, 2.0)))
    neg_sel = neg & (neg_rank < num - n_pos)
    return pos_sel, neg_sel


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def _smooth_l1(x: Array, beta: float) -> Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_loss(cls: Array, reg: Array, anchors: Array, gt_boxes: Array,
             gt_valid: Array, rng: Array, cfg: DetHeadConfig):
    """Per-image RPN loss (BCE + SmoothL1 beta 1/9)."""
    pos, neg, arg = assign_max_iou(anchors, gt_boxes, gt_valid,
                                   pos_thr=0.7, neg_thr=0.3,
                                   match_low_quality=True, min_pos_iou=0.3)
    pos_s, neg_s = random_sample(rng, pos, neg, cfg.rpn_sample,
                                 cfg.rpn_pos_fraction)
    sampled = pos_s | neg_s
    n = jnp.maximum(jnp.sum(sampled), 1.0)
    labels = pos_s.astype(jnp.float32)
    ce = jnp.maximum(cls, 0) - cls * labels + jnp.log1p(jnp.exp(-jnp.abs(cls)))
    loss_cls = jnp.sum(ce * sampled) / n
    target = delta_encode(anchors, gt_boxes[arg], (1.0, 1.0, 1.0, 1.0))
    l1 = _smooth_l1(reg - target, cfg.rpn_smoothl1_beta).sum(-1)
    loss_reg = jnp.sum(l1 * pos_s) / n
    return loss_cls, loss_reg


def _softmax_ce(logits: Array, labels: Array) -> Array:
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    return lse - picked


# ---------------------------------------------------------------------------
# proposals
# ---------------------------------------------------------------------------


def rpn_proposals(cls: Array, reg: Array, anchors: Array,
                  img_hw: Tuple[int, int], cfg: DetHeadConfig) -> Array:
    """Per-image: decode + top-k + NMS -> (num_proposals, 4). Invalid slots
    decay to the best box (harmless duplicates, fixed shape)."""
    k_pre = min(cls.shape[0], 2 * cfg.num_proposals)
    score, idx = lax.top_k(cls, k_pre)
    boxes = delta_decode(anchors[idx], reg[idx], (1, 1, 1, 1), img_hw)
    keep, valid = nms_fixed(boxes, score, cfg.rpn_nms_iou,
                            cfg.num_proposals)
    out = boxes[keep]
    return jnp.where(valid[:, None], out, out[0])


# ---------------------------------------------------------------------------
# full training loss
# ---------------------------------------------------------------------------


def cascade_loss(params: Dict, state: Dict, feats: Sequence[Array],
                 gt_boxes: Array, gt_labels: Array, gt_valid: Array,
                 gt_masks: Array, img_hw: Tuple[int, int], rng: Array,
                 cfg: DetHeadConfig, train: bool = True):
    """End-to-end Cascade Mask R-CNN loss.

    feats: 4 backbone stage outputs (NHWC). gt_boxes (N, G, 4) xyxy,
    gt_labels (N, G) int32 in [0, num_classes), gt_valid (N, G) {0,1},
    gt_masks (N, G, Hm, Wm) binary at image resolution (any fixed Hm, Wm).
    Returns (total, dict_of_losses, new_state).
    """
    n = gt_boxes.shape[0]
    fpn = fpn_forward(params["fpn"], feats, cfg)
    rpn_cls, rpn_reg = rpn_forward(params["rpn"], fpn)
    anchors = jnp.concatenate(
        make_anchors([f.shape[1:3] for f in fpn], cfg), 0)

    rngs = jax.random.split(rng, n * 8).reshape(n, 8, -1)
    l_cls, l_reg = jax.vmap(
        lambda c, r, gb, gv, k: rpn_loss(c, r, anchors, gb, gv, k, cfg)
    )(rpn_cls, rpn_reg, gt_boxes, gt_valid, rngs[:, 0])
    losses = {"rpn_cls": jnp.mean(l_cls), "rpn_reg": jnp.mean(l_reg)}

    proposals = jax.vmap(
        lambda c, r: rpn_proposals(c, r, anchors, img_hw, cfg)
    )(lax.stop_gradient(rpn_cls), lax.stop_gradient(rpn_reg))  # (N, P, 4)

    new_state = {"stages": []}
    total = losses["rpn_cls"] + losses["rpn_reg"]
    nc = cfg.num_classes
    for si in range(len(cfg.stage_stds)):
        sw = cfg.stage_loss_weights[si]
        stds = cfg.stage_stds[si]
        thr = cfg.stage_iou_thr[si]
        # append gts to proposals (add_gt_as_proposals)
        boxes_all = jnp.concatenate([proposals, gt_boxes], axis=1)

        def assign_one(bx, gb, gv, k):
            pos, neg, arg = assign_max_iou(bx, gb, gv, thr, thr, False, thr)
            pos_s, neg_s = random_sample(k, pos, neg, cfg.rcnn_sample,
                                         cfg.rcnn_pos_fraction)
            return pos_s, neg_s, arg

        pos_s, neg_s, arg = jax.vmap(assign_one)(
            boxes_all, gt_boxes, gt_valid, rngs[:, 1 + si])

        # flatten across the batch into (N*B, 5) rois
        bidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[:, None],
                                boxes_all.shape[:2])
        rois = jnp.concatenate([bidx.reshape(-1, 1),
                                boxes_all.reshape(-1, 4)], 1)
        roi_feat = extract_roi_features(fpn[:4], rois, cfg.roi_size, cfg)
        cls, reg, bn = bbox_head_forward(
            params["stages"][si], state["stages"][si], roi_feat, train, cfg)
        new_state["stages"].append(bn)

        sampled = (pos_s | neg_s).reshape(-1)
        posf = pos_s.reshape(-1)
        n_s = jnp.maximum(jnp.sum(sampled), 1.0)
        labels = jnp.where(pos_s, gt_labels[jnp.arange(n)[:, None], arg],
                           nc).reshape(-1)
        ce = _softmax_ce(cls, labels)
        loss_cls = jnp.sum(ce * sampled) / n_s
        # class-specific regression, reg_decoded_bbox => GIoU on boxes
        reg_sel = jnp.take_along_axis(
            reg, jnp.clip(labels, 0, nc - 1)[:, None, None].repeat(4, -1),
            axis=1)[:, 0]
        decoded = delta_decode(rois[:, 1:], reg_sel, stds, img_hw)
        tgt = gt_boxes[jnp.arange(n)[:, None], arg].reshape(-1, 4)
        giou = 1.0 - box_giou_pairwise(decoded, tgt)
        loss_reg = cfg.giou_weight * jnp.sum(giou * posf) / n_s
        losses[f"s{si}_cls"] = loss_cls
        losses[f"s{si}_reg"] = loss_reg
        total = total + sw * (loss_cls + loss_reg)

        # mask loss on this stage's positives (CascadeRoIHead trains the
        # shared mask head at every stage)
        mask_feat = extract_roi_features(fpn[:4], rois, cfg.mask_roi_size,
                                         cfg)
        mlogits = mask_head_forward(params["mask"], mask_feat)
        mlabels = jnp.clip(labels, 0, nc - 1)
        msel = jnp.take_along_axis(
            mlogits, mlabels[:, None, None, None], axis=-1)[..., 0]
        # targets: RoIAlign the matched gt mask to mask_size
        gm = gt_masks[jnp.arange(n)[:, None], arg].reshape(
            -1, *gt_masks.shape[2:])[..., None]                  # (NB,Hm,Wm,1)
        scale_y = gt_masks.shape[2] / img_hw[0]
        mrois = jnp.concatenate(
            [jnp.arange(gm.shape[0], dtype=jnp.float32)[:, None],
             rois[:, 1:] * scale_y], 1)
        mt = roi_align(gm, mrois, cfg.mask_size, 1)[..., 0] >= 0.5
        mt = mt.astype(jnp.float32)
        bce = jnp.maximum(msel, 0) - msel * mt + \
            jnp.log1p(jnp.exp(-jnp.abs(msel)))
        n_pos = jnp.maximum(jnp.sum(posf), 1.0)
        loss_mask = jnp.sum(bce.mean((1, 2)) * posf) / n_pos
        losses[f"s{si}_mask"] = loss_mask
        total = total + sw * loss_mask

        # refine proposals for the next stage with this stage's boxes
        if si < len(cfg.stage_stds) - 1:
            pred_cls = jnp.argmax(cls[:, :nc], axis=-1)
            reg_ref = jnp.take_along_axis(
                reg, pred_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
            refined = delta_decode(rois[:, 1:], reg_ref, stds, img_hw)
            refined = lax.stop_gradient(
                refined.reshape(n, -1, 4)[:, :proposals.shape[1]])
            proposals = refined

    return total, losses, new_state


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def cascade_predict(params: Dict, state: Dict, feats: Sequence[Array],
                    img_hw: Tuple[int, int], cfg: DetHeadConfig,
                    max_dets: int = 100, score_thr: float = 0.05,
                    nms_iou: float = 0.5):
    """Fixed-shape inference: returns per image (boxes (D, 4),
    scores (D,), labels (D,), masks (D, 28, 28)) with D = max_dets;
    empty slots have score 0. Cascade test protocol: stage scores are
    averaged, boxes come from the last stage."""
    n = feats[0].shape[0]
    fpn = fpn_forward(params["fpn"], feats, cfg)
    rpn_cls, rpn_reg = rpn_forward(params["rpn"], fpn)
    anchors = jnp.concatenate(
        make_anchors([f.shape[1:3] for f in fpn], cfg), 0)
    proposals = jax.vmap(
        lambda c, r: rpn_proposals(c, r, anchors, img_hw, cfg)
    )(rpn_cls, rpn_reg)                              # (N, P, 4)

    nc = cfg.num_classes
    scores_sum = 0.0
    boxes = proposals
    for si in range(len(cfg.stage_stds)):
        bidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32)[:, None],
                                boxes.shape[:2])
        rois = jnp.concatenate([bidx.reshape(-1, 1), boxes.reshape(-1, 4)],
                               1)
        roi_feat = extract_roi_features(fpn[:4], rois, cfg.roi_size, cfg)
        cls, reg, _ = bbox_head_forward(
            params["stages"][si], state["stages"][si], roi_feat, False, cfg)
        scores_sum = scores_sum + jax.nn.softmax(cls, -1)
        pred_cls = jnp.argmax(cls[:, :nc], axis=-1)
        reg_sel = jnp.take_along_axis(
            reg, pred_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
        boxes = delta_decode(rois[:, 1:], reg_sel,
                             cfg.stage_stds[si], img_hw).reshape(n, -1, 4)

    scores = (scores_sum / len(cfg.stage_stds)).reshape(n, -1, nc + 1)

    def per_image(bx, sc, fpn_i):
        # best class per box (mmdet does per-class NMS over all classes;
        # argmax-class + class-offset NMS is the fixed-shape equivalent for
        # the dominant detections)
        cls_score = sc[:, :nc]
        best = jnp.max(cls_score, -1)
        lbl = jnp.argmax(cls_score, -1)
        best = jnp.where(best > score_thr, best, 0.0)
        order = jnp.argsort(-best)
        bx, best, lbl = bx[order], best[order], lbl[order]
        off = lbl.astype(bx.dtype)[:, None] * float(max(img_hw))
        keep, valid = nms_fixed(bx + off, jnp.where(best > 0, best, -jnp.inf),
                                nms_iou, max_dets)
        fb = bx[keep]
        fs = jnp.where(valid, best[keep], 0.0)
        fl = lbl[keep]
        rois = jnp.concatenate(
            [jnp.zeros((max_dets, 1), bx.dtype), fb], 1)
        mf = extract_roi_features([f[None] for f in fpn_i], rois,
                                  cfg.mask_roi_size, cfg)
        ml = mask_head_forward(params["mask"], mf)
        masks = jax.nn.sigmoid(jnp.take_along_axis(
            ml, fl[:, None, None, None], axis=-1)[..., 0])
        return fb, fs, fl, masks

    return jax.vmap(per_image)(boxes, scores,
                               [f for f in fpn[:4]])
