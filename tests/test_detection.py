"""Cascade Mask R-CNN tests: box/coder/NMS/RoIAlign unit checks against
numpy references + an end-to-end jitted smoke step on a tiny config
(same standard as tests/test_downstream.py for segmentation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.downstream.detection import (
    DetHeadConfig, assign_max_iou, box_giou_pairwise, box_iou, cascade_loss,
    cascade_predict, delta_decode, delta_encode, init_cascade,
    map_roi_levels, nms_fixed, random_sample, roi_align)


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])  # noqa: E731
    return inter / (area(a)[:, None] + area(b)[None] - inter + 1e-9)


def rand_boxes(rng, n, size=64):
    xy = rng.uniform(0, size - 8, (n, 2))
    wh = rng.uniform(4, size / 2, (n, 2))
    return np.concatenate([xy, np.minimum(xy + wh, size)], 1).astype(
        np.float32)


def test_box_iou_matches_numpy(rng):
    a, b = rand_boxes(rng, 12), rand_boxes(rng, 7)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-5)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    assert float(box_giou_pairwise(a[0], a[0])) == pytest.approx(1.0)
    b = jnp.asarray([20.0, 20, 30, 30])
    g = float(box_giou_pairwise(a[0], b))
    assert g < 0  # disjoint boxes have negative GIoU


def test_delta_coder_roundtrip(rng):
    rois = jnp.asarray(rand_boxes(rng, 20))
    gts = jnp.asarray(rand_boxes(rng, 20))
    stds = (0.1, 0.1, 0.2, 0.2)
    dec = delta_decode(rois, delta_encode(rois, gts, stds), stds)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts),
                               rtol=1e-4, atol=1e-3)


def test_nms_matches_numpy_greedy(rng):
    boxes = rand_boxes(rng, 30)
    scores = -np.sort(-rng.random(30).astype(np.float32))  # descending
    keep_idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                0.5, 10)
    # numpy greedy
    iou = np_iou(boxes, boxes)
    supp = np.zeros(30, bool)
    want = []
    for i in range(30):
        if supp[i]:
            continue
        want.append(i)
        supp |= iou[i] > 0.5
        supp[i] = False if i in want else supp[i]
    want = np.asarray(want[:10])
    got = np.asarray(keep_idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got[:len(want)], want)


def test_roi_align_constant_and_ramp():
    # constant feature: every bin averages to the constant
    feat = jnp.full((1, 8, 8, 3), 5.0)
    rois = jnp.asarray([[0.0, 4, 4, 28, 28]])  # image coords, stride 4
    out = roi_align(feat, rois, 2, 4)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-6)
    # linear ramp f(x) = x: bilinear is exact, bin average = center value
    xs = jnp.broadcast_to(jnp.arange(8.0)[None, :, None], (8, 8, 1))
    out = roi_align(xs[None], jnp.asarray([[0.0, 8, 8, 24, 24]]), 2, 4)
    # roi spans x in [2, 6] of feature grid; sample centers offset -0.5
    # bins at x = {2.5, 4.5}, samples +-0.5 -> averages {2.5, 4.5}
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], [2.5, 4.5],
                               rtol=1e-5)


def test_map_roi_levels():
    rois = jnp.asarray([
        [0.0, 0, 0, 32, 32],      # scale 32 -> level 0
        [0.0, 0, 0, 112, 112],    # scale 112 -> level 1
        [0.0, 0, 0, 250, 250],    # -> level 2
        [0.0, 0, 0, 500, 500],    # -> level 3
    ])
    got = np.asarray(map_roi_levels(rois, 4, 56))
    np.testing.assert_array_equal(got, [0, 1, 2, 3])


def test_assign_and_sample(rng):
    gt = jnp.asarray([[10.0, 10, 30, 30], [40.0, 40, 60, 60]])
    gt_valid = jnp.asarray([1.0, 1.0])
    boxes = jnp.concatenate([
        gt + 1.0,                                    # near-perfect overlaps
        jnp.asarray(rand_boxes(rng, 40, size=64))], 0)
    pos, neg, arg = assign_max_iou(boxes, gt, gt_valid, 0.5, 0.5, False, 0.5)
    assert bool(pos[0]) and bool(pos[1])
    assert int(arg[0]) == 0 and int(arg[1]) == 1
    pos_s, neg_s = random_sample(jax.random.PRNGKey(0), pos, neg, 16, 0.25)
    assert int(jnp.sum(pos_s)) <= 4
    assert int(jnp.sum(pos_s | neg_s)) <= 16
    assert not bool(jnp.any(pos_s & neg_s))


def _tiny_cfg():
    return DetHeadConfig(
        in_channels=(8, 16, 24, 32), fpn_channels=16, num_classes=5,
        fc_out=32, rpn_sample=16, rcnn_sample=32, num_proposals=16,
        mask_convs=2, num_shared_convs=2)


def _tiny_inputs(rng, n=2, size=64, g=3):
    feats = [jnp.asarray(rng.standard_normal(
        (n, size // s, size // s, c)).astype(np.float32))
        for s, c in zip((4, 8, 16, 32), (8, 16, 24, 32))]
    gt_boxes = jnp.asarray(np.stack([rand_boxes(rng, g, size)
                                     for _ in range(n)]))
    gt_labels = jnp.asarray(rng.integers(0, 5, (n, g)), jnp.int32)
    gt_valid = jnp.asarray(np.stack([[1, 1, 0]] * n), jnp.float32)
    gt_masks = jnp.asarray(
        (rng.random((n, g, size // 2, size // 2)) > 0.5).astype(np.float32))
    return feats, gt_boxes, gt_labels, gt_valid, gt_masks


def test_cascade_loss_end_to_end(rng):
    """Full detector loss: finite, positive, jittable, grads flow."""
    cfg = _tiny_cfg()
    params, state = init_cascade(jax.random.PRNGKey(0), cfg)
    feats, gb, gl, gv, gm = _tiny_inputs(rng)

    @jax.jit
    def step(params, state, key):
        def loss_fn(p):
            total, losses, new_state = cascade_loss(
                p, state, feats, gb, gl, gv, gm, (64, 64), key, cfg)
            return total, (losses, new_state)
        (total, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return total, losses, grads

    total, losses, grads = step(params, state, jax.random.PRNGKey(1))
    assert np.isfinite(float(total)) and float(total) > 0
    for k in ("rpn_cls", "rpn_reg", "s0_cls", "s0_reg", "s0_mask",
              "s1_cls", "s2_cls", "s2_mask"):
        assert np.isfinite(float(losses[k])), k
    # grads reach the FPN laterals, all three stages, and the mask head
    gnorm = lambda t: float(sum(  # noqa: E731
        jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(t)))
    assert gnorm(grads["fpn"]) > 0
    for si in range(3):
        assert gnorm(grads["stages"][si]) > 0, si
    assert gnorm(grads["mask"]) > 0


def test_cascade_predict_shapes(rng):
    cfg = _tiny_cfg()
    params, state = init_cascade(jax.random.PRNGKey(0), cfg)
    feats, *_ = _tiny_inputs(rng)
    boxes, scores, labels, masks = jax.jit(
        lambda p, s: cascade_predict(p, s, feats, (64, 64), cfg,
                                     max_dets=8))(params, state)
    assert boxes.shape == (2, 8, 4)
    assert scores.shape == (2, 8)
    assert labels.shape == (2, 8)
    assert masks.shape == (2, 8, cfg.mask_size, cfg.mask_size)
    assert np.all(np.asarray(scores) >= 0)
    assert np.all(np.isfinite(np.asarray(boxes)))
