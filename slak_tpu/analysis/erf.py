"""Effective-receptive-field analysis — JAX rebuild of the reference's
``erf/visualize_erf.py`` + ``erf/analyze_erf.py``:

  * grad of the ReLU'd central output activation (summed over channels) wrt
    the input, ReLU'd, summed over batch+channels -> contribution map
    (``visualize_erf.py:46-55``);
  * log10(1+x) rescale + high-contribution-area ratio at thresholds
    {0.2, 0.3, 0.5, 0.99} (``analyze_erf.py:54-76``).

The torch version needs a special ``SLaKForERF`` head-less model
(``erf/SLaK_for_erf.py``); here any of our models works —
``forward_features(return_stages=True)`` already exposes the final feature
map, and ``jax.grad`` replaces the autograd plumbing.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_input_grad(feature_fn: Callable[[Array], Array], samples: Array
                   ) -> np.ndarray:
    """``feature_fn(x) -> (N, H', W', C)`` final feature map. Returns the
    (H, W) aggregated input-gradient map (visualize_erf.py:46-55)."""

    def central(x):
        out = feature_fn(x)
        h, w = out.shape[1] // 2, out.shape[2] // 2
        return jnp.sum(jax.nn.relu(out[:, h, w, :]))

    grad = jax.grad(central)(samples)
    grad = jax.nn.relu(grad)
    return np.asarray(jnp.sum(grad, axis=(0, 3)))  # sum batch + channels


def erf_contribution(feature_fn, batches, jit: bool = True) -> np.ndarray:
    """Average the contribution map over image batches (the reference uses
    50 single-image batches at 1024x1024, ``visualize_erf.py:58-122``)."""
    fn = lambda s: get_input_grad(feature_fn, s)
    total, n = None, 0
    for samples in batches:
        m = fn(samples)
        if not np.all(np.isfinite(m)):
            continue
        total = m if total is None else total + m
        n += 1
    return total / max(n, 1)


def get_rectangle(data: np.ndarray, thresh: float
                  ) -> Optional[Tuple[int, float]]:
    """Smallest centered square holding > thresh of the total contribution
    (analyze_erf.py:54-62)."""
    h, w = data.shape
    all_sum = np.sum(data)
    for i in range(1, h // 2):
        area = data[h // 2 - i:h // 2 + 1 + i, w // 2 - i:w // 2 + 1 + i]
        if np.sum(area) / all_sum > thresh:
            return i * 2 + 1, ((i * 2 + 1) / h) ** 2
    return None


def analyze_erf(data: np.ndarray,
                thresholds=(0.2, 0.3, 0.5, 0.99)) -> dict:
    """log10(1+x), rescale to [0,1], report area ratios (analyze_erf.py:64-76)."""
    data = np.log10(data + 1)
    data = data / np.max(data)
    out = {}
    for t in thresholds:
        r = get_rectangle(data, t)
        out[t] = {"side": r[0], "area_ratio": r[1]} if r else None
    return {"normalized": data, "ratios": out}
