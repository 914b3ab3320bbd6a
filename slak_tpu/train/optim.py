"""Optimizer layer: AdamW with timm-style parameter groups (no weight decay
for 1-D params / biases) and the ConvNeXt 12-bucket layer-decay LR scaling.

Reference behavior being replicated:
  * ``get_parameter_groups`` (``optim_factory.py:73-112``): weight decay 0 for
    1-D params and ``.bias``; per-group ``lr_scale`` from the layer map.
  * ``get_num_layer_for_convnext`` (``optim_factory.py:32-60``): downsample 0
    -> 0, 1/2 -> stage+1, 3 -> 12; stages 0/1 -> stage+1, stage 2 ->
    3 + block//3, stage 3 -> 12; everything else (head, final norm) -> 13.
  * ``LayerDecayValueAssigner`` values = decay^(13 - layer_id)
    (``main.py:363-369``).
  * Per-iteration LR/WD written from precomputed cosine arrays
    (``engine.py:39-44``, ``utils.py:428-445``).
  * torch.optim.AdamW semantics: decoupled weight decay applied with the
    group LR; bias-corrected moments; the Adam "momentum" exposed to the
    sparsity engine is exp_avg / (sqrt(exp_avg_sq) + 1e-8)
    (``sparse_core.py:362-370``).

TPU-first: the whole optimizer is a pure pytree transform living inside the
jitted train step; LR/WD for step t are gathered from device-resident
schedule arrays, so no host sync per step.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# schedules (utils.py:428-445)
# ---------------------------------------------------------------------------


def cosine_schedule_array(base_value: float, final_value: float, epochs: int,
                          niter_per_ep: int, warmup_epochs: int = 0,
                          start_warmup_value: float = 0.0,
                          warmup_steps: int = -1) -> np.ndarray:
    """Exact clone of the reference's per-iteration schedule builder."""
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) \
        if warmup_iters > 0 else np.array([])
    n = epochs * niter_per_ep - warmup_iters
    iters = np.arange(n)
    sched = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / max(n, 1)))
    out = np.concatenate([warmup, sched])
    assert len(out) == epochs * niter_per_ep
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# layer decay (optim_factory.py:32-70)
# ---------------------------------------------------------------------------

NUM_LAYERS = 12


def layer_id_for_param(name: str) -> int:
    """ConvNeXt 12-bucket layer id for one of our dotted param paths
    (``downsample.{i}...`` / ``stages.{i}.{j}...``)."""
    m = re.match(r"downsample\.(\d+)", name)
    if m:
        stage = int(m.group(1))
        if stage == 0:
            return 0
        if stage in (1, 2):
            return stage + 1
        return NUM_LAYERS
    m = re.match(r"stages\.(\d+)\.(\d+)", name)
    if m:
        stage, block = int(m.group(1)), int(m.group(2))
        if stage in (0, 1):
            return stage + 1
        if stage == 2:
            return 3 + block // 3
        return NUM_LAYERS
    return NUM_LAYERS + 1


def layer_decay_scales(layer_decay: float) -> Tuple[float, ...]:
    """main.py:363-369: values[i] = layer_decay ** (13 - i), i in [0, 13]."""
    return tuple(layer_decay ** (NUM_LAYERS + 1 - i)
                 for i in range(NUM_LAYERS + 2))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def param_groups(params: Any, layer_decay: Optional[float] = None,
                 skip_list: Tuple[str, ...] = ()) -> Tuple[Any, Any]:
    """Returns (wd_mask, lr_scale) pytrees matching ``params``.

    wd_mask leaf is 1.0 if the param gets weight decay (ndim > 1 and not a
    bias / skip-listed), else 0.0 (optim_factory.py:80-82). lr_scale is the
    layer-decay multiplier (1.0 when layer_decay is None).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    scales = layer_decay_scales(layer_decay) if layer_decay else None
    wd_leaves, scale_leaves = [], []
    for path, leaf in flat:
        name = _path_str(path)
        no_decay = (leaf.ndim <= 1 or name.endswith(".b")
                    or name.endswith("bias") or name in skip_list)
        wd_leaves.append(0.0 if no_decay else 1.0)
        if scales is not None:
            scale_leaves.append(scales[layer_id_for_param(name)])
        else:
            scale_leaves.append(1.0)
    wd_mask = jax.tree_util.tree_unflatten(treedef, wd_leaves)
    lr_scale = jax.tree_util.tree_unflatten(treedef, scale_leaves)
    return wd_mask, lr_scale


def param_groups_from_plan(plan, layer_decay: Optional[float] = None,
                           skip_list: Tuple[str, ...] = ()):
    """(wd_mask, lr_scale) for a PACKED params structure (packing.py):
    same per-leaf rules as :func:`param_groups`, but the packed flat
    leaf's values are per-ELEMENT fp32 vectors (host-built constants) so
    the elementwise AdamW math broadcasts them directly."""
    from slak_tpu.train import packing
    scales = layer_decay_scales(layer_decay) if layer_decay else None
    wd_leaves, scale_leaves = [], []
    for name, shape in zip(plan.names, plan.shapes):
        no_decay = (len(shape) <= 1 or name.endswith(".b")
                    or name.endswith("bias") or name in skip_list)
        wd_leaves.append(0.0 if no_decay else 1.0)
        scale_leaves.append(scales[layer_id_for_param(name)]
                            if scales is not None else 1.0)
    wd_tree = jax.tree_util.tree_unflatten(plan.treedef, wd_leaves)
    sc_tree = jax.tree_util.tree_unflatten(plan.treedef, scale_leaves)
    return (packing.pack_per_leaf_values(wd_tree, plan),
            packing.pack_per_leaf_values(sc_tree, plan))


# ---------------------------------------------------------------------------
# AdamW (torch.optim.AdamW semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AdamWConfig:
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    clip_grad: Optional[float] = None  # global grad-norm clip (utils.py:413-425)


def adamw_init(params: Any) -> Dict[str, Any]:
    zeros = lambda p: jnp.zeros(p.shape, jnp.float32)
    return {
        "mu": jax.tree_util.tree_map(zeros, params),
        "nu": jax.tree_util.tree_map(zeros, params),
        "count": jnp.zeros((), jnp.int32),
    }


def global_grad_norm(grads: Any) -> Array:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))


def adamw_update(
    grads: Any,
    opt_state: Dict[str, Any],
    params: Any,
    lr: Array,
    weight_decay: Array,
    wd_mask: Any,
    lr_scale: Any,
    cfg: AdamWConfig = AdamWConfig(),
) -> Tuple[Any, Dict[str, Any], Array]:
    """One AdamW step. Returns (new_params, new_opt_state, grad_norm).

    Matches torch AdamW: p -= lr_g * wd * p ; p -= lr_g * mhat/(sqrt(vhat)+eps)
    with lr_g = lr * lr_scale and wd applied only where wd_mask == 1.
    """
    b1, b2 = cfg.betas
    gnorm = global_grad_norm(grads)
    if cfg.clip_grad is not None:
        scale = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

    count = opt_state["count"] + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf

    def upd(p, g, mu, nu, wd_on, scale):
        g = g.astype(jnp.float32)
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * jnp.square(g)
        mhat = mu / bc1
        vhat = nu / bc2
        lr_g = lr * scale
        step = lr_g * (mhat / (jnp.sqrt(vhat) + cfg.eps))
        p32 = p.astype(jnp.float32)
        p32 = p32 * (1.0 - lr_g * weight_decay * wd_on) - step
        return p32.astype(p.dtype), mu, nu

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(opt_state["mu"])
    flat_nu = treedef.flatten_up_to(opt_state["nu"])
    flat_wd = treedef.flatten_up_to(wd_mask)
    flat_sc = treedef.flatten_up_to(lr_scale)

    new_p, new_mu, new_nu = [], [], []
    for p, g, mu, nu, wd_on, sc in zip(flat_p, flat_g, flat_mu, flat_nu,
                                       flat_wd, flat_sc):
        a, b, c = upd(p, g, mu, nu, wd_on, sc)
        new_p.append(a)
        new_mu.append(b)
        new_nu.append(c)

    new_params = jax.tree_util.tree_unflatten(treedef, new_p)
    new_state = {
        "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
        "nu": jax.tree_util.tree_unflatten(treedef, new_nu),
        "count": count,
    }
    return new_params, new_state, gnorm


def adam_momentum(opt_state: Dict[str, Any]) -> Any:
    """The 'momentum' the sparsity engine scores growth with
    (sparse_core.py:362-370): exp_avg / (sqrt(exp_avg_sq) + 1e-8).
    Works for both optimizer states (AdamW mu/nu, Adan m/n)."""
    if "mu" in opt_state:
        return jax.tree_util.tree_map(
            lambda m, v: m / (jnp.sqrt(v) + 1e-8),
            opt_state["mu"], opt_state["nu"])
    return jax.tree_util.tree_map(
        lambda m, n: m / (jnp.sqrt(n) + 1e-8),
        opt_state["m"], opt_state["n"])


# ---------------------------------------------------------------------------
# Adan (Adaptive Nesterov) — the fork-added optimizer the vendored timm
# registers (timm1/optim/adan.py, registered at timm1/optim/optim_factory.py
# :290-292). Semantics cloned from that implementation (arXiv 2208.06677).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AdanConfig:
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99)
    eps: float = 1e-8
    no_prox: bool = False
    clip_grad: Optional[float] = None  # global grad-norm clip, as AdamW


def adan_init(params: Any) -> Dict[str, Any]:
    zeros = lambda p: jnp.zeros(p.shape, jnp.float32)
    return {
        "m": jax.tree_util.tree_map(zeros, params),       # exp_avg
        "v": jax.tree_util.tree_map(zeros, params),       # exp_avg_diff
        "n": jax.tree_util.tree_map(zeros, params),       # exp_avg_sq
        "pre_grad": jax.tree_util.tree_map(zeros, params),
        "count": jnp.zeros((), jnp.int32),
    }


def adan_update(grads, opt_state, params, lr, weight_decay, wd_mask,
                lr_scale, cfg: AdanConfig = AdanConfig()):
    """One Adan step (timm1/optim/adan.py:75-124). On the first step
    pre_grad is seeded with the incoming grad (grad_diff = 0)."""
    b1, b2, b3 = cfg.betas
    gnorm = global_grad_norm(grads)
    if cfg.clip_grad is not None:
        clip = jnp.minimum(1.0, cfg.clip_grad / (gnorm + 1e-6))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
    count = opt_state["count"] + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    bc3 = 1.0 - b3 ** cf
    first = (count == 1)

    def upd(p, g, m, v, n, pg, wd_on, scale):
        g = g.astype(jnp.float32)
        pg = jnp.where(first, g, pg)
        gd = g - pg
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * gd
        u = g + b2 * gd
        n = b3 * n + (1 - b3) * jnp.square(u)
        denom = jnp.sqrt(n) / jnp.sqrt(bc3) + cfg.eps
        step = (m / bc1 + b2 * v / bc2) / denom
        lr_g = lr * scale
        p32 = p.astype(jnp.float32)
        if cfg.no_prox:
            p32 = p32 * (1.0 - lr_g * weight_decay * wd_on) - lr_g * step
        else:
            p32 = (p32 - lr_g * step) / (1.0 + lr_g * weight_decay * wd_on)
        return p32.astype(p.dtype), m, v, n, g

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    lists = [treedef.flatten_up_to(t) for t in
             (grads, opt_state["m"], opt_state["v"], opt_state["n"],
              opt_state["pre_grad"], wd_mask, lr_scale)]
    outs = [upd(p, *vals) for p, *vals in zip(flat_p, *lists)]
    unf = lambda i: jax.tree_util.tree_unflatten(treedef,
                                                 [o[i] for o in outs])
    new_state = {"m": unf(1), "v": unf(2), "n": unf(3), "pre_grad": unf(4),
                 "count": count}
    return unf(0), new_state, gnorm
