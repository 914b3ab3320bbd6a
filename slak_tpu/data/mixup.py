"""Device-side Mixup/CutMix producing soft targets — vectorized JAX clone of
timm's batch-mode ``Mixup`` (``timm1/data/mixup.py:90-218``), which is what
the reference applies in the engine (``engine.py:49-50``; recipe:
mixup 0.8, cutmix 1.0, switch_prob 0.5, label smoothing 0.1).

TPU-first: mixing runs inside jit on the device batch (the reference mixes
on-GPU too, but per-batch in Python). All three timm modes:
  * 'batch': one (lam, use_cutmix) for the whole batch (mixup.py:140-157).
  * 'elem': per-sample params, partner = flipped batch (mixup.py:158-175).
  * 'pair': per-pair params shared by (i, N-1-i), boxes mirrored so both
    partners swap the same region (mixup.py:176-194).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    # timm --cutmix_minmax: when set, cutmix boxes are sampled by side
    # fraction ~ U(minmax) per axis (rand_bbox_minmax, mixup.py:48-74)
    # instead of from lam; cutmix is then always enabled (timm sets
    # cutmix_alpha aside) and lam comes from the exact box area.
    cutmix_minmax: Tuple[float, float] | None = None
    prob: float = 1.0              # mixup_prob: apply mixing at all
    switch_prob: float = 0.5       # choose cutmix over mixup
    mode: str = "batch"
    label_smoothing: float = 0.1
    num_classes: int = 1000

    @property
    def enabled(self) -> bool:
        return (self.mixup_alpha > 0 or self.cutmix_alpha > 0
                or self.cutmix_minmax is not None)

    @property
    def cutmix_enabled(self) -> bool:
        return self.cutmix_alpha > 0 or self.cutmix_minmax is not None


def one_hot(labels: Array, num_classes: int, on: float, off: float) -> Array:
    """timm mixup.py:14-19."""
    oh = jax.nn.one_hot(labels, num_classes)
    return oh * on + (1.0 - oh) * off


def mixup_target(labels: Array, num_classes: int, lam: Array,
                 smoothing: float) -> Array:
    """timm mixup.py:22-27: lam * y + (1-lam) * y_flipped, smoothed.
    ``lam`` is a scalar (batch mode) or per-sample (N,) (elem/pair)."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = one_hot(labels, num_classes, on, off)
    y2 = one_hot(jnp.flip(labels, 0), num_classes, on, off)
    lam = jnp.reshape(lam, (-1, 1)) if jnp.ndim(lam) else lam
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox(rng: Array, h: int, w: int, lam: Array
               ) -> Tuple[Array, Array, Array, Array]:
    """timm cutmix_bbox_and_lam (mixup.py:77-87): box with side ratio
    sqrt(1-lam), center uniform, clipped to the image."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def _rand_bbox_minmax(rng: Array, h: int, w: int, minmax
                      ) -> Tuple[Array, Array, Array, Array]:
    """timm rand_bbox_minmax (mixup.py:48-74): per-axis side fraction
    ~ U(minmax), box placed fully inside the image; lam is then taken
    from the exact box area by the caller."""
    kh, kw, ky, kx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(kh, (), int(h * minmax[0]),
                               max(int(h * minmax[1]), int(h * minmax[0]) + 1))
    cut_w = jax.random.randint(kw, (), int(w * minmax[0]),
                               max(int(w * minmax[1]), int(w * minmax[0]) + 1))
    y1 = jax.random.randint(ky, (), 0, jnp.maximum(h - cut_h, 1))
    x1 = jax.random.randint(kx, (), 0, jnp.maximum(w - cut_w, 1))
    return y1, y1 + cut_h, x1, x1 + cut_w


def _cut_box(rng: Array, h: int, w: int, lam: Array, cfg: "MixupConfig"):
    if cfg.cutmix_minmax is not None:
        return _rand_bbox_minmax(rng, h, w, cfg.cutmix_minmax)
    return _rand_bbox(rng, h, w, lam)


def _beta(rng: Array, alpha: float, shape=()) -> Array:
    return jax.random.beta(rng, alpha, alpha, shape)


def _mix_elem_or_pair(rng: Array, images: Array, labels: Array,
                      cfg: MixupConfig) -> Tuple[Array, Array]:
    """'elem' (timm mixup.py:158-175) and 'pair' (:176-194), vectorized:
    per-sample (lam, use_cutmix, box) with partner j = N-1-i; 'pair' draws
    params for the first half and mirrors them so both partners share one
    lam and one box."""
    n, h, w, _ = images.shape
    half = n // 2
    m = half if cfg.mode == "pair" else n
    k_lam_m, k_lam_c, k_sw, k_ap, k_box = jax.random.split(rng, 5)

    use_cutmix = jnp.logical_and(
        cfg.cutmix_enabled,
        jnp.logical_or(cfg.mixup_alpha <= 0,
                       jax.random.uniform(k_sw, (m,)) < cfg.switch_prob))
    lam_m = _beta(k_lam_m, cfg.mixup_alpha, (m,)) if cfg.mixup_alpha > 0 \
        else jnp.ones((m,))
    lam_c = _beta(k_lam_c, cfg.cutmix_alpha, (m,)) if cfg.cutmix_alpha > 0 \
        else jnp.ones((m,))
    apply = jax.random.uniform(k_ap, (m,)) < cfg.prob

    boxes = jax.vmap(lambda k, l: jnp.stack(_cut_box(k, h, w, l, cfg)))(
        jax.random.split(k_box, m), lam_c)              # (m, 4)

    if cfg.mode == "pair":
        # mirror the first half's params onto the second half; odd tail
        # (if any) keeps lam 1 (timm asserts even batches; we mask instead)
        def full(v):
            pad = n - 2 * half
            return jnp.concatenate(
                [v, jnp.zeros((pad,) + v.shape[1:], v.dtype),
                 jnp.flip(v, 0)], 0)
        use_cutmix, lam_m, lam_c = map(full, (use_cutmix, lam_m, lam_c))
        apply = full(apply)
        boxes = full(boxes)

    flipped = jnp.flip(images, 0)
    lamv = jnp.where(use_cutmix, 1.0, lam_m)
    mixed_m = images * lamv[:, None, None, None] \
        + flipped * (1.0 - lamv)[:, None, None, None]

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    y1, y2 = boxes[:, 0, None, None], boxes[:, 1, None, None]
    x1, x2 = boxes[:, 2, None, None], boxes[:, 3, None, None]
    in_box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
              & use_cutmix[:, None, None])
    mixed = jnp.where(in_box[..., None], flipped, mixed_m)
    lam_corr = 1.0 - ((boxes[:, 1] - boxes[:, 0])
                      * (boxes[:, 3] - boxes[:, 2])).astype(jnp.float32) \
        / (h * w)
    lam = jnp.where(use_cutmix, lam_corr, lam_m)
    lam = jnp.where(apply, lam, 1.0)
    mixed = jnp.where(apply[:, None, None, None], mixed, images)
    targets = mixup_target(labels, cfg.num_classes, lam, cfg.label_smoothing)
    return mixed.astype(images.dtype), targets


def mixup_cutmix(rng: Array, images: Array, labels: Array,
                 cfg: MixupConfig) -> Tuple[Array, Array]:
    """Mixup/CutMix per cfg.mode. images (N,H,W,C) float; labels (N,) int.

    Returns (mixed_images, soft_targets (N, num_classes))."""
    if cfg.mode in ("elem", "pair"):
        return _mix_elem_or_pair(rng, images, labels, cfg)
    if cfg.mode != "batch":
        raise ValueError(f"unknown mixup mode {cfg.mode!r}")
    n, h, w, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)

    use_cutmix = jnp.logical_and(
        cfg.cutmix_enabled,
        jnp.logical_or(cfg.mixup_alpha <= 0,
                       jax.random.uniform(k_switch) < cfg.switch_prob))
    lam_mix = _beta(k_lam_m, cfg.mixup_alpha) if cfg.mixup_alpha > 0 else \
        jnp.float32(1.0)
    lam_cut = _beta(k_lam_c, cfg.cutmix_alpha) if cfg.cutmix_alpha > 0 else \
        jnp.float32(1.0)

    # apply at all? (mixup_prob; reference uses 1.0)
    apply = jax.random.uniform(k_apply) < cfg.prob

    flipped = jnp.flip(images, 0)

    # mixup branch
    mixed_m = images * lam_mix + flipped * (1.0 - lam_mix)

    # cutmix branch: paste flipped box, correct lam by true box area
    y1, y2, x1, x2 = _cut_box(k_box, h, w, lam_cut, cfg)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    mixed_c = jnp.where(in_box[None, :, :, None], flipped, images)
    lam_corrected = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)

    lam = jnp.where(use_cutmix, lam_corrected, lam_mix)
    mixed = jnp.where(use_cutmix, mixed_c, mixed_m)

    lam = jnp.where(apply, lam, 1.0)
    mixed = jnp.where(apply, mixed, images)

    targets = mixup_target(labels, cfg.num_classes, lam, cfg.label_smoothing)
    return mixed.astype(images.dtype), targets
