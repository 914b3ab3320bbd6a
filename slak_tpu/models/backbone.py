"""Multi-scale feature backbone — the equivalent of the reference's mmseg /
mmdet SLaK backbones (``segmentation/slak.py:181-350``, ``detection/slak.py``)
for downstream dense-prediction frameworks:

  * ``out_indices`` multi-scale stage outputs, each passed through its own
    LayerNorm (``norm0..3``; channels_first in torch, plain trailing-axis LN
    in NHWC) — ``segmentation/slak.py:333-345``;
  * ``sparse`` mode: masks derived from the nonzero weights of a loaded
    sparse checkpoint at init (``:317-326``) and applied on every forward
    (``:328-335``) — here the params are masked once functionally (pure
    functions can't be perturbed by an optimizer mid-eval, so once is
    exactly equivalent, and we re-expose ``apply_mask`` for fine-tuning
    loops);
  * checkpoint loading strips ``backbone.`` / ``module.`` prefixes — already
    handled by :func:`slak_tpu.utils.convert.convert_state_dict`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.models.layers import layer_norm
from slak_tpu.models.slak import SLaKConfig, forward_features, init as slak_init
from slak_tpu.sparsity.masking import apply_mask_to_tree, select_maskable

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    model: SLaKConfig = SLaKConfig()
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    sparse: bool = False


def init_backbone(rng: Array, cfg: BackboneConfig):
    """Returns (params, state). Adds per-stage norms ``norm{i}`` for each
    out_index on top of the classifier tree (head unused, kept for ckpt
    compatibility)."""
    params, state = slak_init(rng, cfg.model)
    dims = cfg.model.widened_dims
    for i in cfg.out_indices:
        params[f"norm{i}"] = {"scale": jnp.ones((dims[i],), jnp.float32),
                              "bias": jnp.zeros((dims[i],), jnp.float32)}
    return params, state


def load_backbone_norms(params: Dict, sd: Dict[str, Any],
                        out_indices: Sequence[int]) -> Dict:
    """Pull ``norm{i}.weight/bias`` from a (converted) torch state dict into
    the params tree; missing norms stay at identity (mm* init_weights)."""
    import numpy as np
    out = dict(params)
    for i in out_indices:
        wk, bk = f"norm{i}.weight", f"norm{i}.bias"
        if wk in sd:
            out[f"norm{i}"] = {"scale": jnp.asarray(np.asarray(sd[wk])),
                               "bias": jnp.asarray(np.asarray(sd[bk]))}
    return out


def derive_masks(params) -> Dict[str, Array]:
    """Sparse-eval masks from nonzero weights (segmentation/slak.py:317-326)."""
    sel = select_maskable(params)
    return {n: (w != 0.0).astype(jnp.float32) for n, w in sel.items()}


def backbone_forward(params, state, x, cfg: BackboneConfig,
                     masks: Optional[Dict[str, Array]] = None,
                     train: bool = False, rng: Optional[Array] = None):
    """Returns (tuple of NHWC stage features at out_indices, new_state)."""
    if cfg.sparse and masks is not None:
        params = apply_mask_to_tree(params, masks)
    feats, new_state = forward_features(params, state, x, cfg=cfg.model,
                                        train=train, rng=rng,
                                        return_stages=True)
    outs = []
    for i in cfg.out_indices:
        n = params[f"norm{i}"]
        outs.append(layer_norm(feats[i], n["scale"], n["bias"]))
    return tuple(outs), new_state
