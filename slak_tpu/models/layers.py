"""Shared model layers: LayerNorm, DropPath, initializers.

Parity notes vs the reference:
  * LayerNorm eps 1e-6 (reference models/SLaK.py:145,212,237-261). In NHWC the
    "channels_first" / "channels_last" duality of the reference collapses —
    every LN normalizes the trailing channel axis.
  * GELU is the exact erf formulation (PyTorch ``nn.GELU()`` default).
  * trunc_normal_(std=.02) with timm's default bounds (+-2.0 absolute) is
    numerically indistinguishable from N(0, 0.02) at std 0.02; we use the
    true truncated normal anyway.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

LN_EPS = 1e-6


def layer_norm(x: Array, scale: Array, bias: Array, eps: float = LN_EPS) -> Array:
    """LayerNorm over the trailing axis, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y.astype(x.dtype)


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def drop_path(x: Array, rate: float, rng: Optional[jax.Array],
              train: bool, axis: int = 0) -> Array:
    """Stochastic depth: drop the whole residual branch per sample.
    ``axis`` is the batch axis (3 in the C-major resident train layout);
    the mask draw is layout-invariant — bernoulli over N samples."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    mask = jax.random.bernoulli(rng, keep, tuple(shape))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def trunc_normal(rng: jax.Array, shape, std: float = 0.02,
                 dtype=jnp.float32) -> Array:
    # timm trunc_normal_: absolute bounds [-2, 2]; at std=0.02 that is 100
    # sigma so plain truncation at +-2/std sigma.
    lo, hi = -2.0 / std, 2.0 / std
    return std * jax.random.truncated_normal(rng, lo, hi, shape, dtype)
