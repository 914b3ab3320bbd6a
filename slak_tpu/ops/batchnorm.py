"""Functional BatchNorm matching PyTorch ``nn.BatchNorm2d`` semantics
(momentum 0.1, eps 1e-5, biased variance for normalization, *unbiased*
variance for the running estimate) — required for converted-checkpoint parity
with the reference's per-branch BNs (reference models/SLaK.py:24-28,38-47).

SyncBN fidelity: the reference wraps every branch BN in ``nn.SyncBatchNorm``
(global-batch statistics). Pass ``axis_name`` to compute the batch statistics
with ``lax.pmean`` over the data-parallel mesh axis — the TPU-native
equivalent — or leave it None for per-replica stats (a deliberate divergence;
eval parity is unaffected since eval uses running stats).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def _cvec(v: Array, ndim: int, caxis: int) -> Array:
    """Reshape a per-channel (C,) vector to broadcast against a tensor
    whose channel axis is ``caxis`` (supports the C-major resident
    layout's axis 0; -1 is the channel-last default and a no-op)."""
    if caxis in (-1, ndim - 1):
        return v
    shape = [1] * ndim
    shape[caxis] = -1
    return v.reshape(shape)


def batch_norm(
    x: Array,
    scale: Array,
    bias: Array,
    running_mean: Array,
    running_var: Array,
    *,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
    axis_name: Optional[str] = None,
    caxis: int = -1,
) -> Tuple[Array, Array, Array]:
    """Batch norm over (N, H, W, C) / (N, C) (channel-last default) or any
    other channel axis via ``caxis`` (0 for the C-major resident layout).

    Returns (y, new_running_mean, new_running_var). In eval mode the running
    stats are returned unchanged.
    """
    nd = x.ndim
    if not train:
        inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
        y = ((x.astype(jnp.float32) - _cvec(running_mean, nd, caxis))
             * _cvec(inv * scale, nd, caxis) + _cvec(bias, nd, caxis))
        return y.astype(x.dtype), running_mean, running_var

    caxis_pos = caxis % nd
    reduce_axes = tuple(a for a in range(nd) if a != caxis_pos)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)  # biased, used for normalization

    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - _cvec(mean, nd, caxis)) * _cvec(inv * scale, nd, caxis)
         + _cvec(bias, nd, caxis))

    # PyTorch updates running_var with the *unbiased* batch variance.
    n = 1
    for ax in reduce_axes:
        n *= x.shape[ax]
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return y.astype(x.dtype), new_mean, new_var


def batch_norm_from_sums(
    x: Array,
    s1: Array,
    s2: Array,
    count: int,
    scale: Array,
    bias: Array,
    running_mean: Array,
    running_var: Array,
    *,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
    axis_name: Optional[str] = None,
    caxis: int = -1,
) -> Tuple[Array, Array, Array]:
    """Train-mode :func:`batch_norm` from precomputed per-channel batch
    sums s1 = sum(x) and s2 = sum(x^2) over the `count` reduced elements
    (fp32, e.g. emitted by the banded conv kernel's fused epilogue,
    pallas_banded.dwconv_banded_stats_cmajor) — skips the statistics read
    of x. Semantics identical to ``batch_norm(..., train=True)``; ``caxis``
    picks the channel axis of x (0 for the C-major resident layout)."""
    mean = s1 / count
    mean_sq = s2 / count
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - jnp.square(mean)  # biased, used for normalization

    inv = jax.lax.rsqrt(var + eps)
    nd = x.ndim
    y = ((x.astype(jnp.float32) - _cvec(mean, nd, caxis))
         * _cvec(inv * scale, nd, caxis) + _cvec(bias, nd, caxis))

    n = count
    if axis_name is not None:
        n = n * jax.lax.psum(1, axis_name)
    unbiased = var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return y.astype(x.dtype), new_mean, new_var


def fold_bn(scale: Array, bias: Array, mean: Array, var: Array,
            eps: float = BN_EPS) -> Tuple[Array, Array]:
    """Fold eval-mode BN into a per-channel (mult, add) affine.

    Mirrors the reparam math in reference ``fuse_bn`` (models/SLaK.py:49-58):
    t = gamma/sqrt(var+eps); y = x*t + (beta - mean*t).
    """
    t = scale * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return t, bias - mean * t
