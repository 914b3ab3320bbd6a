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
