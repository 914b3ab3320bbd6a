"""Input-pipeline tests: transform shapes/stats, RandAugment ops, mixup /
cutmix semantics vs the timm spec, random erasing statistics, loader
sharding/shuffling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from slak_tpu.data import (
    BatchLoader, EvalTransform, ImageFolderDataset, MixupConfig,
    RandomErasingConfig, SyntheticDataset, TrainTransform, build_dataset,
    device_prefetch, mixup_cutmix, mixup_target, random_erasing,
)
from slak_tpu.data.auto_augment import RAND_INCREASING_OPS, RandAugment
from slak_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _img(rng, w=64, h=48):
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8))


def test_train_transform_shape_and_range(rng):
    t = TrainTransform(size=32)
    out = t(_img(rng))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # normalized: roughly zero-mean-ish for uniform noise input
    assert abs(out.mean()) < 3.0


def test_eval_transform_center_crop(rng):
    t = EvalTransform(size=32)  # resize short side to 36, crop 32
    out = t(_img(rng, w=100, h=60))
    assert out.shape == (32, 32, 3)
    t384 = EvalTransform(size=384)  # warp path
    out = t384(_img(rng, w=100, h=60))
    assert out.shape == (384, 384, 3)


def test_randaugment_ops_run(rng):
    img = _img(rng, 32, 32)
    for op in RAND_INCREASING_OPS:
        out = op(img, 9.0)
        assert out.size == img.size
    ra = RandAugment()
    out = ra(img)
    assert out.size == img.size


def test_mixup_soft_targets():
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0, switch_prob=0.0,
                      label_smoothing=0.1, num_classes=10)
    x = jnp.ones((4, 8, 8, 3)) * jnp.arange(4).reshape(4, 1, 1, 1)
    y = jnp.asarray([0, 1, 2, 3])
    xm, tm = mixup_cutmix(jax.random.PRNGKey(0), x, y, cfg)
    # soft targets sum to 1
    np.testing.assert_allclose(np.asarray(tm.sum(-1)), np.ones(4), rtol=1e-5)
    # target mass only on own + flipped label (+ smoothing floor)
    floor = 0.1 / 10
    t0 = np.asarray(tm[0])
    assert t0[0] > floor and t0[3] > floor
    for j in (1, 2, 4, 9):
        assert t0[j] == pytest.approx(floor, rel=1e-4)
    # mixed image 0 is a convex combination of images 0 and 3
    lam = (t0[0] - floor) / (1 - 0.1)
    np.testing.assert_allclose(np.asarray(xm[0, 0, 0, 0]),
                               lam * 0 + (1 - lam) * 3, rtol=1e-3, atol=1e-3)


def test_cutmix_box_and_lambda():
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, switch_prob=1.0,
                      label_smoothing=0.0, num_classes=4)
    x = jnp.zeros((2, 16, 16, 1)).at[1].set(1.0)
    y = jnp.asarray([0, 1])
    xm, tm = mixup_cutmix(jax.random.PRNGKey(3), x, y, cfg)
    # image 0 got a box of 1s pasted from flipped (image 1)
    pasted = float(jnp.mean(xm[0]))
    lam0 = float(tm[0, 0])
    # lam is corrected to the true pasted-area fraction
    assert lam0 == pytest.approx(1.0 - pasted, abs=1e-5)


def test_mixup_target_matches_timm_formula():
    y = jnp.asarray([1, 2])
    t = mixup_target(y, 4, jnp.float32(0.7), 0.1)
    on, off = 1 - 0.1 + 0.025, 0.025
    want0 = np.full(4, off)
    want0[1] += (on - off) * 0.7
    want0[2] += (on - off) * 0.3
    np.testing.assert_allclose(np.asarray(t[0]), want0, rtol=1e-5)


def test_random_erasing_stats():
    cfg = RandomErasingConfig(prob=1.0)
    x = jnp.zeros((32, 64, 64, 3))
    out = random_erasing(jax.random.PRNGKey(0), x, cfg)
    frac = np.asarray((out != 0).any(-1).mean((1, 2)))
    # erased fraction within the configured area range (after clipping)
    assert (frac > 0.005).all() and (frac < 0.5).all()
    assert 0.02 < frac.mean() < 0.25
    # prob=0 -> no-op
    out0 = random_erasing(jax.random.PRNGKey(0), x,
                          RandomErasingConfig(prob=0.0))
    assert float(jnp.abs(out0).sum()) == 0.0


def test_random_erasing_modes():
    """--remode variants: 'const' fills zeros (invisible on a zero image
    but visible on ones), 'rand' fills one normal draw per channel."""
    cfg_c = RandomErasingConfig(prob=1.0, mode="const")
    x = jnp.ones((8, 32, 32, 3))
    out = random_erasing(jax.random.PRNGKey(0), x, cfg_c)
    erased = np.asarray(out == 0)
    assert erased.any()
    # const: erased pixels are exactly 0 across all channels
    assert np.logical_or(np.asarray(out) == 0, np.asarray(out) == 1).all()

    cfg_r = RandomErasingConfig(prob=1.0, mode="rand")
    out_r = np.asarray(random_erasing(jax.random.PRNGKey(0), x, cfg_r))
    for i in range(out_r.shape[0]):
        box = (out_r[i] != 1).any(-1)
        if box.any():
            vals = out_r[i][box]          # (n_px, 3)
            # per-channel constant inside the region
            assert np.allclose(vals, vals[0], atol=1e-6)

    with pytest.raises(ValueError):
        random_erasing(jax.random.PRNGKey(0), x,
                       RandomErasingConfig(prob=1.0, mode="bogus"))


def test_cutmix_minmax_box_fractions():
    """--cutmix_minmax (0.2, 0.8): box sides are per-axis fractions in the
    range, box fully inside, lam = 1 - exact box area."""
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                      cutmix_minmax=(0.2, 0.8), prob=1.0, switch_prob=1.0,
                      label_smoothing=0.0, num_classes=4)
    assert cfg.enabled and cfg.cutmix_enabled
    h = w = 40
    x = jnp.stack([jnp.zeros((h, w, 3)), jnp.ones((h, w, 3))])
    y = jnp.asarray([0, 1])
    for s in range(8):
        mixed, tgt = mixup_cutmix(jax.random.PRNGKey(s), x, y, cfg)
        m0 = np.asarray(mixed[0, :, :, 0])
        box = m0 == 1.0                       # pasted from the ones image
        rows = box.any(1).sum()
        cols = box.any(0).sum()
        assert int(h * 0.2) <= rows < max(int(h * 0.8), int(h * 0.2) + 1)
        assert int(w * 0.2) <= cols < max(int(w * 0.8), int(w * 0.2) + 1)
        lam = 1.0 - rows * cols / (h * w)
        np.testing.assert_allclose(float(tgt[0, 0]), lam, atol=1e-6)


def test_transform_inception_mean_std(rng):
    """--imagenet_default_mean_and_std false -> (0.5, 0.5, 0.5) stats in
    both transforms (timm inception normalization)."""
    img = _img(rng)
    e_in = EvalTransform(size=32)(img)
    e_05 = EvalTransform(size=32, imagenet_mean_and_std=False)(img)
    # invert both normalizations: must recover identical pixels
    a = e_in * IMAGENET_STD + IMAGENET_MEAN
    b = e_05 * 0.5 + 0.5
    np.testing.assert_allclose(a, b, atol=1e-6)
    t = TrainTransform(size=32, imagenet_mean_and_std=False,
                       auto_augment=None, color_jitter_amount=None)
    out = t(img)
    assert np.abs(out).max() <= 1.0 + 1e-6   # (x/255 - .5)/.5 in [-1, 1]


def test_train_interpolation_modes(rng):
    """--train_interpolation random/bilinear run (and differ from bicubic
    for a detailed image at fixed RNG)."""
    import random as pyrandom
    img = _img(rng, 64, 64)
    outs = {}
    for interp in ("bicubic", "bilinear"):
        pyrandom.seed(7)
        outs[interp] = TrainTransform(
            size=32, auto_augment=None, color_jitter_amount=None,
            use_native=False, interpolation=interp)(img)
    assert not np.allclose(outs["bicubic"], outs["bilinear"])
    pyrandom.seed(7)
    out_r = TrainTransform(size=32, auto_augment=None,
                           color_jitter_amount=None, use_native=False,
                           interpolation="random")(img)
    assert out_r.shape == (32, 32, 3)


def _folder(tmp_path, rng, classes=3, per=4):
    for c in range(classes):
        d = tmp_path / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(per):
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)) \
                .save(d / f"{i}.png")
    return str(tmp_path)


def test_image_folder_and_build(tmp_path, rng):
    root = _folder(tmp_path / "train", rng)
    ds, nb = build_dataset(True, "image_folder", root,
                           transform=TrainTransform(size=32))
    assert nb == 3 and len(ds) == 12
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and y == 0


def test_batch_loader_sharding(tmp_path, rng):
    root = _folder(tmp_path / "train", rng, classes=2, per=8)
    ds = ImageFolderDataset(root, EvalTransform(size=32))
    all_seen = []
    for rank in range(2):
        dl = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                         rank=rank, world_size=2, seed=7)
        dl.set_epoch(1)
        batches = list(dl)
        assert len(batches) == len(dl) == 2
        for x, y in batches:
            assert x.shape == (4, 32, 32, 3) and y.shape == (4,)
        all_seen.append(batches)
    # epoch reshuffle changes order
    dl = BatchLoader(ds, batch_size=4, rank=0, world_size=2, seed=7)
    dl.set_epoch(2)
    b2 = list(dl)
    assert not np.array_equal(b2[0][0], all_seen[0][0][0])


def test_device_prefetch_synthetic():
    ds = SyntheticDataset(n=16, size=24, nb_classes=5,
                          transform=EvalTransform(size=24))
    dl = BatchLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    n = 0
    for xb, yb in device_prefetch(iter(dl)):
        assert xb.shape == (8, 24, 24, 3)
        n += 1
    assert n == 2


def test_native_host_pipeline(rng):
    """C++ fused crop+resize+flip+normalize vs the PIL reference path."""
    from slak_tpu.data import native
    from slak_tpu.data.transforms import normalize as np_normalize
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain")
    img = rng.integers(0, 256, (120, 160, 3), np.uint8)
    box = (10, 20, 100, 80)
    got = native.rrc_normalize(img, box, 64, False,
                               np.asarray(IMAGENET_MEAN),
                               np.asarray(IMAGENET_STD))
    pil = Image.fromarray(img).resize(
        (64, 64), Image.BICUBIC,
        box=(box[0], box[1], box[0] + box[2], box[1] + box[3]))
    want = np_normalize(np.asarray(pil))
    # different bicubic boundary conventions -> close, not identical
    assert np.abs(got - want).mean() < 0.05
    # flip is an exact mirror
    gf = native.rrc_normalize(img, box, 64, True,
                              np.asarray(IMAGENET_MEAN),
                              np.asarray(IMAGENET_STD))
    np.testing.assert_allclose(gf, got[:, ::-1], rtol=1e-5, atol=1e-5)
    # TrainTransform native path produces the right shape/dtype
    t = TrainTransform(size=32, auto_augment=None, color_jitter_amount=None,
                       use_native=True)
    out = t(Image.fromarray(img))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


def _recover_lam(t, smoothing, num_classes, own, other):
    floor = smoothing / num_classes
    return float((t[own] - floor) / (1 - smoothing))


def test_mixup_elem_mode_per_sample_lams():
    """'elem': each sample has its own lam; mixed[i] is the convex combo of
    x[i] and x[N-1-i] at exactly the lam encoded in its target."""
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0, switch_prob=0.0,
                      label_smoothing=0.0, num_classes=8, mode="elem")
    n = 6
    x = jnp.ones((n, 4, 4, 1)) * jnp.arange(n, dtype=jnp.float32
                                            ).reshape(n, 1, 1, 1)
    y = jnp.arange(n)
    xm, tm = mixup_cutmix(jax.random.PRNGKey(7), x, y, cfg)
    lams = [_recover_lam(np.asarray(tm[i]), 0.0, 8, i, n - 1 - i)
            for i in range(n)]
    assert len({round(l, 4) for l in lams}) > 1  # per-sample, not shared
    for i in range(n):
        want = lams[i] * i + (1 - lams[i]) * (n - 1 - i)
        np.testing.assert_allclose(float(xm[i, 0, 0, 0]), want, atol=1e-4)


def test_mixup_pair_mode_symmetric():
    """'pair': partners (i, N-1-i) share one lam and one cutmix box."""
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, switch_prob=1.0,
                      label_smoothing=0.0, num_classes=8, mode="pair")
    n = 6
    x = jnp.ones((n, 16, 16, 1)) * jnp.arange(n, dtype=jnp.float32
                                              ).reshape(n, 1, 1, 1)
    y = jnp.arange(n)
    xm, tm = mixup_cutmix(jax.random.PRNGKey(5), x, y, cfg)
    xm = np.asarray(xm)
    for i in range(n // 2):
        j = n - 1 - i
        li = _recover_lam(np.asarray(tm[i]), 0.0, 8, i, j)
        lj = _recover_lam(np.asarray(tm[j]), 0.0, 8, j, i)
        assert li == pytest.approx(lj, abs=1e-5)  # shared lam
        # mirrored boxes: i's pasted region holds value j, j's holds i
        box_i = xm[i] == j
        box_j = xm[j] == i
        np.testing.assert_array_equal(box_i, box_j)
        assert box_i.mean() == pytest.approx(1 - li, abs=1e-5)


def test_mixup_pair_odd_batch_middle_untouched():
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0, switch_prob=0.0,
                      label_smoothing=0.0, num_classes=8, mode="pair")
    n = 5
    x = jnp.ones((n, 4, 4, 1)) * jnp.arange(n, dtype=jnp.float32
                                            ).reshape(n, 1, 1, 1)
    xm, tm = mixup_cutmix(jax.random.PRNGKey(1), x, jnp.arange(n), cfg)
    assert float(xm[2, 0, 0, 0]) == 2.0
    assert float(tm[2, 2]) == pytest.approx(1.0)


class _FailAt13(SyntheticDataset):
    """Picklable failing dataset for the process-loader error test."""

    def __getitem__(self, idx):
        if idx == 13:
            raise ValueError("boom at 13")
        return super().__getitem__(idx)


class _DieAt13(SyntheticDataset):
    """Hard worker death (no exception path, no message — the segfault
    analog): the child exits mid-task."""

    def __getitem__(self, idx):
        if idx == 13:
            import os
            os._exit(3)
        return super().__getitem__(idx)


def test_process_loader_matches_thread_mode():
    """The spawned-worker loader (reference main.py:268-276 uses torch
    DataLoader worker processes) yields the same ordered label stream and
    shapes as the thread mode, including the partial last batch."""
    tf = EvalTransform(size=24)
    ds = SyntheticDataset(n=42, size=32, nb_classes=7, transform=tf)
    lt = BatchLoader(ds, 8, num_workers=2, seed=3, drop_last=False,
                     mode="thread")
    lp = BatchLoader(ds, 8, num_workers=2, seed=3, drop_last=False,
                     mode="process")
    lt.set_epoch(1)
    lp.set_epoch(1)
    bt, bp = list(lt), list(lp)
    assert len(bt) == len(bp) == 6
    for (xt, yt), (xp, yp) in zip(bt, bp):
        assert xp.shape == xt.shape and xp.dtype == np.float32
        np.testing.assert_array_equal(yt, yp)
        np.testing.assert_allclose(xt, xp, atol=1e-6)
    assert bp[-1][0].shape[0] == 2  # 42 = 5*8 + 2

    # epoch reseed reshuffles
    lp.set_epoch(2)
    y2 = np.concatenate([y for _, y in lp])
    y1 = np.concatenate([y for _, y in bp])
    assert (y1 != y2).any() and sorted(y1) == sorted(y2)


def test_process_loader_propagates_worker_errors():
    ds = _FailAt13(n=40, size=32, nb_classes=7, transform=EvalTransform(24))
    dl = BatchLoader(ds, 8, shuffle=False, num_workers=2, mode="process")
    with pytest.raises(RuntimeError, match="boom at 13"):
        list(dl)


def test_process_loader_detects_hard_worker_death():
    """A worker that dies WITHOUT reporting (os._exit mid-task — the
    segfault analog) must not hang the epoch: the parent's poll loop
    notices the dead child and fails fast (fail-don't-respawn policy;
    recovery belongs to the auto-resume layer, train/main.py)."""
    import time
    ds = _DieAt13(n=40, size=32, nb_classes=7, transform=EvalTransform(24))
    dl = BatchLoader(ds, 8, shuffle=False, num_workers=2, mode="process")
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="died unexpectedly"):
        list(dl)
    # one 5 s poll window + spawn/teardown slack, not a hang
    assert time.monotonic() - t0 < 60.0


def test_process_loader_train_transform_randomness():
    """Augmentation streams differ across workers/batches (per-worker
    seeding) while labels stay deterministic."""
    tf = TrainTransform(size=24, auto_augment=None, color_jitter_amount=None)
    ds = SyntheticDataset(n=32, size=32, nb_classes=7, transform=tf)
    dl = BatchLoader(ds, 8, num_workers=2, seed=0, mode="process")
    e1 = list(dl)
    dl2 = BatchLoader(ds, 8, num_workers=2, seed=0, mode="process")
    e2 = list(dl2)
    for (x1, y1), (x2, y2) in zip(e1, e2):
        np.testing.assert_array_equal(y1, y2)
