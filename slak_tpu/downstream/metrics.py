"""Downstream quality metrics: ADE20K mIoU and COCO-style AP.

These are the numbers the reference's README tables are denominated in —
47.6/49.4/50.0 mIoU (`/root/reference/README.md:188-193`, produced by
mmseg's ``IoUMetric``) and 48.4/41.8 box/mask AP
(`/root/reference/README.md:200`, produced by mmdet's ``CocoMetric`` /
pycocotools). The reference delegates both to the mm frameworks; here
they are first-class:

* segmentation: a **jit-able fixed-shape confusion matrix** accumulator
  (one ``(num_classes**2,)`` bincount per batch, ignore-index masked) +
  host-side reductions matching mmseg's IoUMetric semantics — per-class
  IoU = diag / (gt + pred - diag), mIoU/mAcc = NaN-mean over classes
  that appear, aAcc = diag.sum / total (mmseg
  ``mmseg/evaluation/metrics/iou_metric.py`` semantics).

* detection: COCO AP over :func:`cascade_predict`'s fixed-shape padded
  outputs (score==0 slots dropped). Protocol matches pycocotools
  ``COCOeval`` for the no-crowd case: per image+class greedy matching
  in det-score order to the highest-IoU unmatched GT at each IoU
  threshold in 0.50:0.05:0.95, global score-ordered PR curve,
  right-max precision interpolation sampled at 101 recall points,
  AP averaged over classes with ground truth. Mask AP uses the same
  machinery with pasted-mask IoU (the 28x28 box-relative sigmoid mask
  bilinearly resized into the box on the GT mask grid, 0.5-binarized —
  mmdet's paste_masks_in_image semantics at the evaluation grid).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)


# ---------------------------------------------------------------------------
# semantic segmentation: confusion-matrix mIoU
# ---------------------------------------------------------------------------


def confusion_matrix(pred: Array, label: Array, num_classes: int,
                     ignore_index: int = 255) -> Array:
    """Fixed-shape (num_classes, num_classes) confusion counts, rows = GT,
    cols = prediction. jit-able: one flat bincount of gt*C + pred with
    ignore pixels routed to a scratch bin that is dropped."""
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    valid = label != ignore_index
    idx = jnp.where(valid, label * num_classes + pred, num_classes ** 2)
    counts = jnp.bincount(idx, length=num_classes ** 2 + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def seg_scores(cm: np.ndarray) -> Dict[str, float]:
    """mmseg IoUMetric reductions from an accumulated confusion matrix."""
    cm = np.asarray(cm, np.float64)
    diag = np.diag(cm)
    gt = cm.sum(1)
    pr = cm.sum(0)
    union = gt + pr - diag
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, diag / union, np.nan)
        acc = np.where(gt > 0, diag / gt, np.nan)
    return {
        "mIoU": float(np.nanmean(iou)) if np.isfinite(iou).any() else 0.0,
        "mAcc": float(np.nanmean(acc)) if np.isfinite(acc).any() else 0.0,
        "aAcc": float(diag.sum() / max(cm.sum(), 1.0)),
        "per_class_iou": iou,
    }


# ---------------------------------------------------------------------------
# detection: COCO-style AP
# ---------------------------------------------------------------------------


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), -1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), -1)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _resize_bilinear(m: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Half-pixel-centers bilinear resize of a 2-D array (numpy; matches
    jax.image.resize(..., 'bilinear') up to edge clamping)."""
    ih, iw = m.shape
    ys = (np.arange(oh) + 0.5) * ih / oh - 0.5
    xs = (np.arange(ow) + 0.5) * iw / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, ih - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, iw - 1)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = m[y0][:, x0] * (1 - fx) + m[y0][:, x1] * fx
    bot = m[y1][:, x0] * (1 - fx) + m[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def paste_mask(mask: np.ndarray, box: np.ndarray, grid_hw: Tuple[int, int],
               img_hw: Tuple[int, int], thr: float = 0.5) -> np.ndarray:
    """Paste a box-relative (m, m) soft mask into a binary (Gh, Gw) grid
    covering the full image extent (the GT-mask grid)."""
    gh, gw = grid_hw
    sy = gh / img_hw[0]
    sx = gw / img_hw[1]
    x1, y1, x2, y2 = box
    gx1 = int(np.floor(x1 * sx))
    gy1 = int(np.floor(y1 * sy))
    gx2 = int(np.ceil(x2 * sx))
    gy2 = int(np.ceil(y2 * sy))
    gx1, gy1 = max(gx1, 0), max(gy1, 0)
    gx2, gy2 = min(gx2, gw), min(gy2, gh)
    out = np.zeros((gh, gw), bool)
    if gx2 <= gx1 or gy2 <= gy1:
        return out
    out[gy1:gy2, gx1:gx2] = (
        _resize_bilinear(np.asarray(mask, np.float64),
                         gy2 - gy1, gx2 - gx1) >= thr)
    return out


def mask_iou(pred: Sequence[np.ndarray], gt: Sequence[np.ndarray]
             ) -> np.ndarray:
    """(N binary grids) x (M binary grids) -> (N, M) IoU."""
    n, m = len(pred), len(gt)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            inter = np.logical_and(pred[i], gt[j]).sum()
            union = np.logical_or(pred[i], gt[j]).sum()
            out[i, j] = inter / union if union else 0.0
    return out


def _greedy_match(iou: np.ndarray, thr: float) -> np.ndarray:
    """pycocotools matching: dets in score order (rows already sorted)
    each take the highest-IoU still-unmatched GT with IoU >= thr.
    Returns a bool TP flag per det row."""
    nd, ng = iou.shape
    taken = np.zeros(ng, bool)
    tp = np.zeros(nd, bool)
    for d in range(nd):
        best, bi = thr - 1e-10, -1
        for g in range(ng):
            if taken[g] or iou[d, g] <= best:
                continue
            best, bi = iou[d, g], g
        if bi >= 0:
            taken[bi] = True
            tp[d] = True
    return tp


def _ap_from_matches(scores: np.ndarray, tp: np.ndarray, n_gt: int
                     ) -> float:
    """COCO 101-point AP from globally pooled (score, tp) pairs."""
    if n_gt == 0:
        return float("nan")
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    tp = tp[order]
    tps = np.cumsum(tp)
    fps = np.cumsum(~tp)
    rec = tps / n_gt
    prec = tps / np.maximum(tps + fps, 1e-12)
    # right-max interpolation (monotone non-increasing precision)
    for i in range(len(prec) - 1, 0, -1):
        prec[i - 1] = max(prec[i - 1], prec[i])
    inds = np.searchsorted(rec, REC_THRS, side="left")
    q = np.zeros(len(REC_THRS))
    ok = inds < len(prec)
    q[ok] = prec[inds[ok]]
    return float(q.mean())


def coco_ap(detections: List[Dict[str, np.ndarray]],
            ground_truths: List[Dict[str, np.ndarray]],
            num_classes: int,
            iou_type: str = "bbox",
            img_hw: Optional[Tuple[int, int]] = None) -> Dict[str, float]:
    """COCO AP over per-image prediction/GT dicts.

    detections[i]: ``boxes (D,4)``, ``scores (D,)``, ``labels (D,)``
      [+ ``masks (D,m,m)`` box-relative soft masks for iou_type='segm'];
      padded slots carry score 0 and are dropped.
    ground_truths[i]: ``boxes (G,4)``, ``labels (G,)``, ``valid (G,)``
      [+ ``masks (G,Gh,Gw)`` full-image binary grids for 'segm'].

    Returns ``{"AP": .., "AP50": .., "AP75": ..}`` (fractions in [0,1]).
    """
    assert len(detections) == len(ground_truths)
    # per class, per iou-thr: pooled scores + tp flags, and gt counts
    per_cls_scores: List[List[np.ndarray]] = [[] for _ in range(num_classes)]
    per_cls_tp: List[List[List[np.ndarray]]] = [
        [[] for _ in IOU_THRS] for _ in range(num_classes)]
    n_gt = np.zeros(num_classes, np.int64)

    for det, gt in zip(detections, ground_truths):
        keep = np.asarray(det["scores"]) > 0
        d_boxes = np.asarray(det["boxes"])[keep]
        d_scores = np.asarray(det["scores"])[keep]
        d_labels = np.asarray(det["labels"])[keep].astype(int)
        gv = np.asarray(gt["valid"]).astype(bool)
        g_boxes = np.asarray(gt["boxes"])[gv]
        g_labels = np.asarray(gt["labels"])[gv].astype(int)

        if iou_type == "segm":
            assert img_hw is not None, "segm AP needs img_hw"
            g_masks = np.asarray(gt["masks"])[gv] >= 0.5
            grid_hw = g_masks.shape[-2:] if g_masks.size else (1, 1)
            d_masks = [paste_mask(m, b, grid_hw, img_hw)
                       for m, b in zip(np.asarray(det["masks"])[keep],
                                       d_boxes)]

        for c in np.unique(np.concatenate([d_labels, g_labels])
                           if (d_labels.size or g_labels.size)
                           else np.zeros(0, int)):
            dsel = d_labels == c
            gsel = g_labels == c
            n_gt[c] += int(gsel.sum())
            if not dsel.any():
                continue
            order = np.argsort(-d_scores[dsel], kind="mergesort")
            if iou_type == "segm":
                pm = [m for m, s in zip(d_masks, dsel) if s]
                pm = [pm[i] for i in order]
                gm = [m for m in g_masks[gsel]]
                iou = mask_iou(pm, gm)
            else:
                iou = box_iou(d_boxes[dsel][order], g_boxes[gsel])
            per_cls_scores[c].append(d_scores[dsel][order])
            for ti, thr in enumerate(IOU_THRS):
                per_cls_tp[c][ti].append(_greedy_match(iou, thr))

    ap = np.full((num_classes, len(IOU_THRS)), np.nan)
    for c in range(num_classes):
        if n_gt[c] == 0:
            continue
        scores = (np.concatenate(per_cls_scores[c])
                  if per_cls_scores[c] else np.zeros(0))
        for ti in range(len(IOU_THRS)):
            tp = (np.concatenate(per_cls_tp[c][ti])
                  if per_cls_tp[c][ti] else np.zeros(0, bool))
            ap[c, ti] = _ap_from_matches(scores, tp, int(n_gt[c]))

    def _mean(x):
        return float(np.nanmean(x)) if np.isfinite(x).any() else 0.0

    return {"AP": _mean(ap), "AP50": _mean(ap[:, 0]),
            "AP75": _mean(ap[:, 5])}
