"""Downstream metric evaluators (downstream/metrics.py) against
hand-computed toy cases: mmseg-style confusion-matrix mIoU and
pycocotools-style COCO AP (box + mask)."""

import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.downstream.metrics import (box_iou, coco_ap, confusion_matrix,
                                         paste_mask, seg_scores)


def test_confusion_matrix_and_miou():
    # labels [0,0,1,1,ign], preds [0,1,1,1,0]
    label = jnp.asarray([[0, 0, 1, 1, 255]])
    pred = jnp.asarray([[0, 1, 1, 1, 0]])
    cm = np.asarray(confusion_matrix(pred, label, num_classes=3))
    want = np.zeros((3, 3))
    want[0, 0] = 1
    want[0, 1] = 1
    want[1, 1] = 2
    np.testing.assert_array_equal(cm, want)
    s = seg_scores(cm)
    # IoU0 = 1/(2+1-1) = 0.5 ; IoU1 = 2/(2+3-2) = 2/3 ; class 2 absent
    assert s["mIoU"] == pytest.approx((0.5 + 2 / 3) / 2)
    assert s["aAcc"] == pytest.approx(3 / 4)
    assert s["mAcc"] == pytest.approx((0.5 + 1.0) / 2)
    assert np.isnan(s["per_class_iou"][2])


def test_confusion_matrix_accumulates_batches():
    rng = np.random.default_rng(0)
    label = rng.integers(0, 5, (4, 16, 16))
    label[rng.random(label.shape) < 0.1] = 255
    pred = rng.integers(0, 5, (4, 16, 16))
    whole = np.asarray(confusion_matrix(jnp.asarray(pred),
                                        jnp.asarray(label), 5))
    parts = sum(np.asarray(confusion_matrix(jnp.asarray(pred[i]),
                                            jnp.asarray(label[i]), 5))
                for i in range(4))
    np.testing.assert_array_equal(whole, parts)
    assert whole.sum() == (label != 255).sum()


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0])


def test_coco_ap_hand_computed():
    """1 class, 2 GT; det1 = exact match (IoU 1), det2 IoU 0.6807, det3 FP.

    thr <= 0.65 (4 thrs): TP,TP,FP -> precision 1 at all recall points
    -> AP 1. thr >= 0.70 (6 thrs): TP,FP,FP -> recall caps at 0.5 with
    precision 1 -> AP = 51/101 (recall grid points 0.00..0.50)."""
    gts = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
            "labels": np.zeros(2, int), "valid": np.ones(2)}]
    dets = [{"boxes": np.array([[0, 0, 10, 10], [21, 21, 31, 31],
                                [50, 50, 60, 60]], float),
             "scores": np.array([0.9, 0.8, 0.7]),
             "labels": np.zeros(3, int)}]
    # sanity on the middle IoU: 81 / (100 + 100 - 81)
    assert box_iou(dets[0]["boxes"][1:2], gts[0]["boxes"][1:2])[0, 0] == \
        pytest.approx(81 / 119)
    r = coco_ap(dets, gts, num_classes=1)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(51 / 101)
    assert r["AP"] == pytest.approx((4 * 1.0 + 6 * 51 / 101) / 10)


def test_coco_ap_padded_slots_and_empty_class():
    """Score-0 padded det slots are dropped; classes without GT don't
    dilute the mean; a det on a GT-less class contributes nothing."""
    gts = [{"boxes": np.array([[0, 0, 10, 10]], float),
            "labels": np.zeros(1, int), "valid": np.ones(1)}]
    dets = [{"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10],
                                [2, 2, 8, 8]], float),
             "scores": np.array([0.9, 0.0, 0.5]),
             "labels": np.array([0, 0, 1])}]
    r = coco_ap(dets, gts, num_classes=3)
    assert r["AP"] == pytest.approx(1.0)       # pad slot ignored, cls1 no GT


def test_coco_ap_greedy_prefers_highest_iou():
    """Two GTs; one det overlapping both must take the higher-IoU GT,
    leaving the other unmatched (recall 0.5)."""
    gts = [{"boxes": np.array([[0, 0, 10, 10], [0, 0, 12, 12]], float),
            "labels": np.zeros(2, int), "valid": np.ones(2)}]
    dets = [{"boxes": np.array([[0, 0, 12, 12]], float),
             "scores": np.array([0.9]), "labels": np.zeros(1, int)}]
    r = coco_ap(dets, gts, num_classes=1)
    assert r["AP50"] == pytest.approx(51 / 101)


def test_paste_mask_and_mask_ap():
    img_hw = (64, 64)
    grid = (32, 32)
    box = np.array([0, 0, 32, 32], float)
    pasted = paste_mask(np.ones((28, 28)), box, grid, img_hw)
    want = np.zeros(grid, bool)
    want[:16, :16] = True
    np.testing.assert_array_equal(pasted, want)

    gm = np.zeros((1,) + grid, np.float32)
    gm[0, :16, :16] = 1.0
    gts = [{"boxes": box[None], "labels": np.zeros(1, int),
            "valid": np.ones(1), "masks": gm}]
    dets = [{"boxes": box[None], "scores": np.array([0.9]),
             "labels": np.zeros(1, int),
             "masks": np.ones((1, 28, 28), np.float32)}]
    r = coco_ap(dets, gts, num_classes=1, iou_type="segm", img_hw=img_hw)
    assert r["AP"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Protocol cross-validation: an INDEPENDENT literal transcription of the
# published pycocotools COCOeval algorithm (cocoeval.py evaluateImg +
# accumulate, plain triple loops) as the oracle — pycocotools itself is
# not installable in this environment. The production evaluator's
# threshold-vectorized matcher and cumsum accumulate must agree to 1e-9
# on randomized inputs exercising crowds, area ranges, maxDets caps and
# score ties.
# ---------------------------------------------------------------------------

from slak_tpu.downstream import metrics as MM


def _oracle_match(iou, g_ig, g_crowd, thrs):
    """Literal cocoeval.evaluateImg matching walk (gts pre-sorted
    ignore-last by the caller is NOT assumed — sorts here)."""
    D, G = iou.shape
    gtind = np.argsort(g_ig, kind="mergesort")
    iou = iou[:, gtind]
    gig = np.asarray(g_ig, float)[gtind]
    crowd = np.asarray(g_crowd, bool)[gtind]
    T = len(thrs)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(thrs):
        for dind in range(D):
            best = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                if gtm[tind, gind] > 0 and not crowd[gind]:
                    continue
                if m > -1 and gig[m] == 0 and gig[gind] == 1:
                    break
                if iou[dind, gind] < best:
                    continue
                best = iou[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gig[m]
            dtm[tind, dind] = 1
            gtm[tind, m] = 1
    return dtm, dt_ig


def _oracle_coco_ap(dets, gts, num_classes, iou_type="bbox", img_hw=None,
                    max_dets=(1, 10, 100)):
    thrs = np.asarray(MM.IOU_THRS)
    T, R = len(thrs), len(MM.REC_THRS)
    A, M = len(MM.AREA_RANGES), len(max_dets)
    md_max = max(max_dets)
    per = {}
    for img, (det, gt) in enumerate(zip(dets, gts)):
        keep = np.asarray(det["scores"]) > 0
        d_boxes = np.asarray(det["boxes"])[keep]
        d_scores = np.asarray(det["scores"])[keep]
        d_labels = np.asarray(det["labels"])[keep].astype(int)
        gv = np.asarray(gt["valid"]).astype(bool)
        g_boxes = np.asarray(gt["boxes"])[gv]
        g_labels = np.asarray(gt["labels"])[gv].astype(int)
        g_crowd = (np.asarray(gt["iscrowd"])[gv].astype(bool)
                   if "iscrowd" in gt else np.zeros(gv.sum(), bool))
        if iou_type == "segm":
            g_masks = np.asarray(gt["masks"])[gv] >= 0.5
            grid_hw = g_masks.shape[-2:] if g_masks.size else (1, 1)
            a_scale = (img_hw[0] * img_hw[1]) / max(
                grid_hw[0] * grid_hw[1], 1)
            d_masks = np.asarray(
                [MM.paste_mask(m, b, grid_hw, img_hw) for m, b in
                 zip(np.asarray(det["masks"])[keep], d_boxes)]
                if keep.any() else np.zeros((0,) + tuple(grid_hw), bool))
            d_areas = d_masks.sum((1, 2)) * a_scale
            g_areas = (np.asarray(gt["areas"])[gv] if "areas" in gt else
                       (g_masks.sum((1, 2)) * a_scale if g_masks.size
                        else np.zeros(len(g_masks))))
        else:
            d_areas = np.prod(np.clip(d_boxes[:, 2:] - d_boxes[:, :2],
                                      0, None), -1) if len(d_boxes) \
                else np.zeros(0)
            g_areas = (np.asarray(gt["areas"])[gv] if "areas" in gt else
                       (np.prod(np.clip(g_boxes[:, 2:] - g_boxes[:, :2],
                                        0, None), -1) if len(g_boxes)
                        else np.zeros(0)))
        for c in range(num_classes):
            dsel = np.flatnonzero(d_labels == c)
            gsel = np.flatnonzero(g_labels == c)
            if dsel.size == 0 and gsel.size == 0:
                continue
            order = dsel[np.argsort(-d_scores[dsel],
                                    kind="mergesort")][:md_max]
            if iou_type == "segm":
                iou = MM.mask_iou(d_masks[order], g_masks[gsel],
                                  crowd=g_crowd[gsel])
            else:
                iou = MM.box_iou(d_boxes[order], g_boxes[gsel],
                                 crowd=g_crowd[gsel])
            per.setdefault(c, []).append(
                dict(scores=d_scores[order], d_areas=d_areas[order],
                     iou=iou, g_areas=g_areas[gsel],
                     g_crowd=g_crowd[gsel]))

    precision = np.full((T, R, num_classes, A, M), -1.0)
    recall = np.full((T, num_classes, A, M), -1.0)
    for c, recs in per.items():
        for ai, (lo, hi) in enumerate(MM.AREA_RANGES):
            results = []
            npig = 0
            for r in recs:
                g_ig = (r["g_crowd"] | (r["g_areas"] < lo)
                        | (r["g_areas"] > hi)).astype(float)
                npig += int((g_ig == 0).sum())
                dtm, dt_ig = _oracle_match(r["iou"], g_ig, r["g_crowd"],
                                           thrs)
                out = (r["d_areas"] < lo) | (r["d_areas"] > hi)
                dt_ig = np.logical_or(
                    dt_ig, np.logical_and(dtm == 0, out[None, :]))
                results.append((r["scores"], dtm, dt_ig))
            if npig == 0:
                continue
            for mi, md in enumerate(max_dets):
                scores = np.concatenate([s[:md] for s, _, _ in results])
                inds = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate([m[:, :md] for _, m, _ in results],
                                     axis=1)[:, inds]
                dt_ig = np.concatenate([g[:, :md] for _, _, g in results],
                                       axis=1)[:, inds]
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(float)
                fp_sum = np.cumsum(fps, axis=1).astype(float)
                for ti in range(T):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    nd = len(tp)
                    rc = tp / npig
                    pr = (tp / (fp + tp + np.spacing(1))).tolist()
                    recall[ti, c, ai, mi] = rc[-1] if nd else 0
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    q = np.zeros(R)
                    inds2 = np.searchsorted(rc, MM.REC_THRS, side="left")
                    for ri, pi in enumerate(inds2):
                        try:
                            q[ri] = pr[pi]
                        except IndexError:
                            pass
                    precision[ti, :, c, ai, mi] = q

    def _mean(x):
        x = x[x > -1]
        return float(np.mean(x)) if x.size else 0.0

    mi100 = max_dets.index(100) if 100 in max_dets else M - 1
    out = {"AP": _mean(precision[:, :, :, 0, mi100]),
           "AP50": _mean(precision[0, :, :, 0, mi100]),
           "AP75": _mean(precision[5, :, :, 0, mi100]),
           "APs": _mean(precision[:, :, :, 1, mi100]),
           "APm": _mean(precision[:, :, :, 2, mi100]),
           "APl": _mean(precision[:, :, :, 3, mi100]),
           "ARs": _mean(recall[:, :, 1, mi100]),
           "ARm": _mean(recall[:, :, 2, mi100]),
           "ARl": _mean(recall[:, :, 3, mi100])}
    for mi, md in enumerate(max_dets):
        out[f"AR{md}"] = _mean(recall[:, :, 0, mi])
    return out


def _random_det_gt(rng, n_img, num_classes, img=384, with_ties=True):
    dets, gts = [], []
    for _ in range(n_img):
        G = int(rng.integers(0, 8))
        # mix of tiny / medium / large boxes to populate all area ranges
        sizes = rng.choice([8, 24, 60, 150], size=G)
        x1 = rng.uniform(0, img - 160, (G,))
        y1 = rng.uniform(0, img - 160, (G,))
        g_boxes = np.stack([x1, y1, x1 + sizes, y1 + sizes], -1)
        g_labels = rng.integers(0, num_classes, G)
        iscrowd = rng.random(G) < 0.25
        D = int(rng.integers(0, 9))
        take = rng.integers(0, max(G, 1), D) if G else np.zeros(D, int)
        jit = rng.uniform(-12, 12, (D, 4))
        if G:
            d_boxes = g_boxes[take] + jit
        else:
            d_boxes = rng.uniform(0, img - 60, (D, 4))
            d_boxes[:, 2:] = d_boxes[:, :2] + rng.uniform(5, 80, (D, 2))
        d_boxes = np.clip(d_boxes, 0, img)
        d_boxes[:, 2:] = np.maximum(d_boxes[:, 2:], d_boxes[:, :2] + 1)
        scores = rng.uniform(0.05, 1.0, D)
        if with_ties and D >= 2:
            scores[1] = scores[0]        # exercise the mergesort tie rule
        d_labels = rng.integers(0, num_classes, D)
        dets.append({"boxes": d_boxes, "scores": scores,
                     "labels": d_labels})
        gts.append({"boxes": g_boxes, "labels": g_labels,
                    "valid": np.ones(G, bool), "iscrowd": iscrowd})
    return dets, gts


def test_coco_ap_matches_oracle_bbox():
    rng = np.random.default_rng(42)
    dets, gts = _random_det_gt(rng, 100, 5)
    got = coco_ap(dets, gts, num_classes=5)
    want = _oracle_coco_ap(dets, gts, num_classes=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_coco_ap_matches_oracle_segm():
    rng = np.random.default_rng(7)
    grid, img_hw = (48, 48), (96, 96)
    dets, gts = [], []
    for _ in range(25):
        G = int(rng.integers(0, 5))
        gm = np.zeros((G,) + grid, np.float32)
        g_boxes = np.zeros((G, 4))
        for j in range(G):
            s = int(rng.integers(4, 20))
            y = int(rng.integers(0, grid[0] - s))
            x = int(rng.integers(0, grid[1] - s))
            gm[j, y:y + s, x:x + s] = 1.0
            g_boxes[j] = (x * 2, y * 2, (x + s) * 2, (y + s) * 2)
        D = int(rng.integers(0, 6))
        d_boxes = np.zeros((D, 4))
        d_masks = rng.random((D, 12, 12)).astype(np.float32)
        for j in range(D):
            if G and rng.random() < 0.7:
                d_boxes[j] = g_boxes[rng.integers(0, G)] \
                    + rng.uniform(-6, 6, 4)
            else:
                x1, y1 = rng.uniform(0, 60, 2)
                d_boxes[j] = (x1, y1, x1 + rng.uniform(8, 30),
                              y1 + rng.uniform(8, 30))
            d_masks[j] += 0.3            # mostly-on masks
        d_boxes = np.clip(d_boxes, 0, 96)
        d_boxes[:, 2:] = np.maximum(d_boxes[:, 2:], d_boxes[:, :2] + 1)
        dets.append({"boxes": d_boxes,
                     "scores": rng.uniform(0.1, 1, D),
                     "labels": rng.integers(0, 3, D), "masks": d_masks})
        gts.append({"boxes": g_boxes,
                    "labels": rng.integers(0, 3, G),
                    "valid": np.ones(G, bool), "masks": gm,
                    "iscrowd": rng.random(G) < 0.2})
    got = coco_ap(dets, gts, num_classes=3, iou_type="segm",
                  img_hw=img_hw)
    want = _oracle_coco_ap(dets, gts, num_classes=3, iou_type="segm",
                           img_hw=img_hw)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_coco_ap_crowd_absorbs_dets():
    """Dets matching only a crowd GT are ignored (neither TP nor FP), and
    a crowd region can absorb several dets; the remaining real GT decides
    recall."""
    crowd_box = np.array([0, 0, 50, 50], float)
    real_box = np.array([100, 100, 120, 120], float)
    gts = [{"boxes": np.stack([crowd_box, real_box]),
            "labels": np.zeros(2, int), "valid": np.ones(2),
            "iscrowd": np.array([True, False])}]
    dets = [{"boxes": np.array([[5, 5, 20, 20], [25, 25, 45, 45],
                                [100, 100, 120, 120]], float),
             "scores": np.array([0.9, 0.8, 0.7]),
             "labels": np.zeros(3, int)}]
    # both in-crowd dets are fully inside -> intersection/det-area = 1
    r = coco_ap(dets, gts, num_classes=1)
    assert r["AP"] == pytest.approx(1.0)       # the real GT is found; no FPs
    # without the crowd flag the two dets are FPs ahead of the TP
    gts[0]["iscrowd"][:] = False
    r2 = coco_ap(dets, gts, num_classes=1)
    assert r2["AP50"] == pytest.approx(1 / 3 * 51 / 101, abs=1e-9)


def test_coco_ap_maxdets_cap():
    """With 11 FPs ahead of the single TP, AR10 misses it but AR100 finds
    it (the per-image-per-class cap)."""
    gt_box = np.array([[0, 0, 20, 20]], float)
    fp = np.stack([np.array([100 + 30 * i, 100, 120 + 30 * i, 120])
                   for i in range(11)]).astype(float)
    boxes = np.concatenate([fp, gt_box])
    scores = np.concatenate([np.linspace(0.9, 0.8, 11), [0.1]])
    gts = [{"boxes": gt_box, "labels": np.zeros(1, int),
            "valid": np.ones(1)}]
    dets = [{"boxes": boxes, "scores": scores,
             "labels": np.zeros(12, int)}]
    r = coco_ap(dets, gts, num_classes=1)
    assert r["AR10"] == pytest.approx(0.0)
    assert r["AR100"] == pytest.approx(1.0)


def test_coco_ap_area_ranges():
    """A 16x16 GT is 'small', a 200x200 GT is 'large'; APs/APl see only
    their own, AP sees both."""
    small = np.array([[0, 0, 16, 16]], float)
    large = np.array([[50, 50, 250, 250]], float)
    gts = [{"boxes": np.concatenate([small, large]),
            "labels": np.zeros(2, int), "valid": np.ones(2)}]
    dets = [{"boxes": small.copy(), "scores": np.array([0.9]),
             "labels": np.zeros(1, int)}]
    r = coco_ap(dets, gts, num_classes=1)
    assert r["APs"] == pytest.approx(1.0)      # the small GT is matched
    assert r["APl"] == pytest.approx(0.0)      # the large GT is missed
    assert r["ARl"] == pytest.approx(0.0)
    assert r["AP50"] == pytest.approx(51 / 101)  # recall caps at 0.5
