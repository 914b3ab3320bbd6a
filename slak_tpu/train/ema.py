"""Sparse-aware EMA — the functional clone of the reference's
``ModelEma.update(model, mask)`` (``model_sema.py:67-91``).

Semantics:
  * unmasked leaf:  ema <- decay * ema + (1 - decay) * model
  * masked leaf:    ema <- (decay * ema + (1 - decay) * model) * mask
                           + (mask & (ema == 0)) * decay * model
    i.e. pruned positions are zeroed in the EMA, and freshly-grown positions
    (mask on, EMA still zero) are re-seeded — note the reference adds
    ``decay * model`` on top of the standard term, so a fresh position lands
    at exactly ``model`` ((1-d)*m + d*m).

The EMA tracks the full model state dict (params + BN running stats), like
the reference's deepcopy of the module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from slak_tpu.sparsity.masking import _path_str

Array = jax.Array


def ema_init(tree: Any) -> Any:
    # NB: must materialize fresh buffers — fp32->fp32 astype can alias the
    # input array, and aliased leaves break buffer donation of the train
    # state (XLA: "attempt to donate the same buffer twice").
    return jax.tree_util.tree_map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), tree)


def ema_update(ema: Any, model: Any, decay: float,
               masks: Optional[Dict[str, Array]] = None) -> Any:
    """One EMA update over a pytree (params, or (params, state) tuples)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(ema)
    model_leaves = treedef.flatten_up_to(model)
    out = []
    for (path, e), m in zip(flat, model_leaves):
        name = _path_str(path)
        mf = m.astype(jnp.float32)
        if masks is not None and name in masks:
            mask = masks[name]
            fresh = (e == 0.0) & (mask != 0.0)
            new = (decay * e + (1.0 - decay) * mf) * mask \
                + fresh.astype(jnp.float32) * decay * mf
        else:
            new = decay * e + (1.0 - decay) * mf
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)
