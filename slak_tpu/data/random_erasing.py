"""Device-side RandomErasing, 'pixel' mode — vectorized JAX clone of timm's
``RandomErasing`` (``timm1/data/random_erasing.py:26-110``; recipe: p=0.25,
mode 'pixel', count 1, applied after normalization).

Semantics:
  * per image, with prob p, erase a rectangle whose area fraction ~
    U(0.02, 1/3) and log-aspect ~ U(log 0.3, log 10/3);
  * fill with per-pixel standard normal noise (the 'pixel' mode);
  * timm retries up to 10 times until the box fits; at 224² with these
    ranges a single draw fits after clipping, so we sample once and clip —
    the box-size distribution is indistinguishable in practice (documented
    divergence, exercised in tests).

Runs inside jit via ``vmap`` over the batch — the reference erases per-image
on the host loader workers; on TPU this is a handful of fused VPU ops.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class RandomErasingConfig:
    prob: float = 0.25
    min_area: float = 0.02
    max_area: float = 1.0 / 3.0
    min_aspect: float = 0.3
    max_aspect: float = 1.0 / 0.3
    count: int = 1
    # timm --remode: 'pixel' = per-pixel normal noise, 'rand' = one
    # normal draw per channel, 'const' = zeros
    # (timm1/data/random_erasing.py:10-23 _get_pixels)
    mode: str = "pixel"


def _erase_one(rng: Array, img: Array, cfg: RandomErasingConfig) -> Array:
    h, w, c = img.shape
    keys = jax.random.split(rng, 6)
    apply = jax.random.uniform(keys[0]) < cfg.prob

    area = h * w
    target = area * jax.random.uniform(keys[1], minval=cfg.min_area,
                                       maxval=cfg.max_area)
    log_ar = jax.random.uniform(
        keys[2], minval=jnp.log(cfg.min_aspect), maxval=jnp.log(cfg.max_aspect))
    ar = jnp.exp(log_ar)
    eh = jnp.clip(jnp.sqrt(target * ar).astype(jnp.int32), 1, h)
    ew = jnp.clip(jnp.sqrt(target / ar).astype(jnp.int32), 1, w)
    top = jax.random.randint(keys[3], (), 0, jnp.maximum(h - eh, 1))
    left = jax.random.randint(keys[4], (), 0, jnp.maximum(w - ew, 1))

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((rows >= top) & (rows < top + eh)
           & (cols >= left) & (cols < left + ew)) & apply

    if cfg.mode == "pixel":
        fill = jax.random.normal(keys[5], img.shape, jnp.float32)
    elif cfg.mode == "rand":
        fill = jnp.broadcast_to(
            jax.random.normal(keys[5], (1, 1, c), jnp.float32), img.shape)
    elif cfg.mode == "const":
        fill = jnp.zeros(img.shape, jnp.float32)
    else:
        raise ValueError(f"unknown random-erasing mode {cfg.mode!r}")
    return jnp.where(box[:, :, None], fill.astype(img.dtype), img)


def random_erasing(rng: Array, images: Array,
                   cfg: RandomErasingConfig = RandomErasingConfig()) -> Array:
    """images (N, H, W, C), already normalized. Returns erased batch."""
    n = images.shape[0]
    out = images
    for i in range(cfg.count):
        keys = jax.random.split(jax.random.fold_in(rng, i), n)
        out = jax.vmap(lambda k, im: _erase_one(k, im, cfg))(keys, out)
    return out
