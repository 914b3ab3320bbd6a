"""Classification losses matching the timm pair the reference trains with
(``timm1/loss/cross_entropy.py``): label-smoothing CE for plain labels,
soft-target CE when mixup/cutmix produces soft targets
(reference ``main.py:438-445``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def label_smoothing_cross_entropy(logits: Array, labels: Array,
                                  smoothing: float = 0.1) -> Array:
    """timm LabelSmoothingCrossEntropy: (1-eps)*nll + eps*mean(-logprobs)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_cross_entropy(logits: Array, target: Array) -> Array:
    """timm SoftTargetCrossEntropy: mean over batch of sum(-t * logprobs)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-target.astype(jnp.float32) * logprobs, axis=-1))


def cross_entropy(logits: Array, labels: Array) -> Array:
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None],
                                         axis=-1)[:, 0])


def accuracy_topk(logits: Array, labels: Array, k: int = 1) -> Array:
    """timm1/utils/metrics.py:25 top-k accuracy (fraction in [0,1]).
    k is clamped to the class count (timm does the same via min(topk))."""
    topk = jax.lax.top_k(logits, min(k, logits.shape[-1]))[1]
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
