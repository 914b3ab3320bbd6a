"""Dynamic sparse training (prune-and-grow / DST) — the TPU-native functional
equivalent of the reference's ``Masking`` engine (``sparse_core.py:67-407``)
and its prune/growth registries (``funcs.py:374-392``).

Design (TPU-first, per SURVEY.md §7.3):
  * Masks are *data*: an fp32 {0,1} pytree with the same shapes as the
    selected weights, carried through the jitted train step. Mask refresh is
    a ``lax.cond``-gated branch inside the step — shapes never change, so
    there is **no recompilation** per mask update (the reference re-launches
    CUDA kernels from Python each refresh; we stay on-device).
  * Prune/growth counts depend on runtime mask contents
    (``funcs.py:107-109``), which would be dynamic shapes under XLA. We use
    fixed-shape *rank-based* formulations: a full ``argsort`` of |w| gives
    each element its rank, and ``rank >= k`` reproduces "zero the k smallest"
    exactly (up to tie order) with static shapes.
  * Mask updates are deterministic given the (replicated) weights and an RNG
    key, so the reference's rank-0 mask broadcast
    (``sparse_core.py:404-407``) is unnecessary: every data-parallel replica
    computes the identical masks. No collective.

Semantics cloned from the reference:
  * Maskable params: every weight with ndim >= 2 (torch dims {2,4};
    our NHWC layouts add 3-D depthwise kernels) — ``sparse_core.py:119-132``.
    ``only_L`` restricts to the decomposed large-kernel branches
    (reference matches ``'large_kernel.LoRA' in name``).
  * Init modes uniform / ERK / snip / resume — ``sparse_core.py:141-261``.
    Layers that come out >= 0.99 dense are dropped from the mask set
    (``sparse_core.py:255-259``).
  * ``apply_mask``: weight <- weight * mask after every optimizer step
    (``sparse_core.py:316-333``; the momentum-buffer masking there only
    fires for SGD — AdamW recipes mask weights only, which we replicate).
  * Every ``update_frequency`` optimizer steps: per-layer magnitude prune of
    ``ceil(prune_rate * nnz)`` weights (``funcs.py:56-114``), then regrow the
    same number via random Bernoulli (``funcs.py:170-175``) or top-|grad|
    (``funcs.py:196-205``) / top-|adam momentum| (``funcs.py:227-299``).
  * Prune rate follows a cosine decay prune_rate -> eta_min over T_max steps
    (``sparse_core.py:49-64``).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
MaskTree = Dict[str, Array]


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Sparsity flags, mirroring the reference CLI (``main.py:207-221``)."""
    sparsity: float = 0.4
    sparse_init: str = "snip"        # uniform | ERK | snip | resume
    prune_mode: str = "magnitude"    # magnitude | SET | global_magnitude
    growth_mode: str = "random"      # random | gradient | momentum | mix |
    #                    random_unfired | momentum_neuron |
    #                    global_momentum_growth (funcs.py:374-392 registry)
    redistribution_mode: str = "none"  # parity only; never called in the
    #                                    reference's truncate_weights
    prune_rate: float = 0.5
    eta_min: float = 0.005           # CosineDecay floor (sparse_core.py:54)
    update_frequency: Optional[int] = 100
    fix: bool = False                # static sparsity: no prune/grow updates
    only_L: bool = False             # mask only the LoRA branches
    mix: float = 0.5                 # gradient fraction for 'mix' growth

    @property
    def density(self) -> float:
        return 1.0 - self.sparsity


@dataclasses.dataclass
class MaskState:
    """The functional replacement for ``Masking``'s mutable attributes."""
    masks: MaskTree                  # fp32 {0,1}, keyed by dotted param path
    fired: MaskTree                  # ITOP fired-weights union (fp32 {0,1})
    steps: Array                     # int32 optimizer-step counter
    rng: Array                       # PRNG key for random growth

    def tree_flatten(self):
        return (self.masks, self.fired, self.steps, self.rng), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    MaskState, MaskState.tree_flatten, MaskState.tree_unflatten)


# ---------------------------------------------------------------------------
# param selection
# ---------------------------------------------------------------------------


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


def select_maskable(params: Any, only_L: bool = False) -> Dict[str, Array]:
    """Pick the weights that get masks: ndim >= 2 (the reference's torch
    dims {2,4}, sparse_core.py:123), optionally only the LoRA branches."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        name = _path_str(path)
        if leaf.ndim < 2:
            continue
        if only_L and not re.search(r"\bLoRA", name):
            continue
        out[name] = leaf
    return out


def set_by_path(params: Any, updates: Dict[str, Array]) -> Any:
    """Write updated leaves back into the params pytree by dotted path."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, leaf in flat:
        name = _path_str(path)
        leaves.append(updates.get(name, leaf))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# init modes (sparse_core.py:141-261)
# ---------------------------------------------------------------------------


def erk_densities(shapes: Dict[str, Tuple[int, ...]], density: float,
                  erk_power_scale: float = 1.0) -> Dict[str, float]:
    """Erdos-Renyi-Kernel per-layer densities (sparse_core.py:183-241).

    Host-side numpy: runs once at init, identical math to the reference's
    epsilon search including the dense-layer promotion loop.
    """
    dense_layers = set()
    while True:
        divisor, rhs = 0.0, 0.0
        raw = {}
        for name, shape in shapes.items():
            n_param = float(np.prod(shape))
            if name in dense_layers:
                rhs -= n_param * (1.0 - density)
            else:
                rhs += n_param * density
                raw[name] = (np.sum(shape) / np.prod(shape)) ** erk_power_scale
                divisor += raw[name] * n_param
        epsilon = rhs / divisor
        max_prob = max(raw.values())
        if max_prob * epsilon > 1.0:
            for name, p in raw.items():
                if p == max_prob:
                    dense_layers.add(name)
        else:
            break
    out = {}
    for name, shape in shapes.items():
        out[name] = 1.0 if name in dense_layers else float(epsilon * raw[name])
    return out


def snip_sparsities(
    loss_fn: Callable[[Any], Array],
    params: Any,
    maskable: Dict[str, Array],
    density: float,
) -> Dict[str, float]:
    """SNIP per-layer sparsities (sparse_core.py:11-47): saliency |w * dw|
    on one batch, global top-``keep`` threshold, per-layer survivor counts.

    ``loss_fn(params)`` should evaluate the training loss on a single batch.
    """
    grads = jax.grad(loss_fn)(params)
    grad_map = select_maskable(grads, only_L=False)
    scores = {n: jnp.abs(w * grad_map[n]) for n, w in maskable.items()}
    all_scores = jnp.concatenate([s.ravel() for s in scores.values()])
    keep = int(all_scores.size * density)
    # reference: threshold = smallest of the top-k scores; survivors are
    # strictly greater (sparse_core.py:36-43)
    thr = jax.lax.top_k(all_scores, max(keep, 1))[0][-1]
    out = {}
    for n, s in scores.items():
        surv = jnp.sum((s > thr).astype(jnp.float32))
        out[n] = float(1.0 - surv / s.size)
    return out


def init_masks(
    rng: Array,
    params: Any,
    cfg: MaskConfig,
    loss_fn: Optional[Callable[[Any], Array]] = None,
) -> MaskState:
    """Build the initial MaskState. For ``snip``, pass ``loss_fn`` (closed
    over one training batch). For ``resume``, masks derive from nonzero
    weights (sparse_core.py:158-172)."""
    maskable = select_maskable(params, only_L=cfg.only_L)
    density = cfg.density
    mode = cfg.sparse_init

    masks: MaskTree = {}
    if mode == "uniform":
        for name, w in maskable.items():
            rng, k = jax.random.split(rng)
            masks[name] = (jax.random.uniform(k, w.shape) < density).astype(
                jnp.float32)
    elif mode == "resume":
        for name, w in maskable.items():
            masks[name] = (w != 0.0).astype(jnp.float32)
    elif mode == "ERK":
        dens = erk_densities({n: w.shape for n, w in maskable.items()},
                             density)
        for name, w in maskable.items():
            rng, k = jax.random.split(rng)
            masks[name] = (jax.random.uniform(k, w.shape)
                           < dens[name]).astype(jnp.float32)
    elif mode == "snip":
        if loss_fn is None:
            raise ValueError("snip init requires loss_fn over one batch")
        sp = snip_sparsities(loss_fn, params, maskable, density)
        for name, w in maskable.items():
            rng, k = jax.random.split(rng)
            masks[name] = (jax.random.uniform(k, w.shape)
                           < (1.0 - sp[name])).astype(jnp.float32)
    else:
        raise ValueError(f"unknown sparse_init {mode!r}")

    # drop layers that came out (almost) dense (sparse_core.py:255-259)
    keep = {}
    for name, m in masks.items():
        layer_density = float(jnp.mean(m))
        if layer_density < 0.99:
            keep[name] = m
    masks = keep

    # fresh buffers, not aliases of masks — aliased leaves break buffer
    # donation of the train state under jit
    fired = {n: jnp.array(m, copy=True) for n, m in masks.items()}
    return MaskState(masks=masks, fired=fired,
                     steps=jnp.zeros((), jnp.int32), rng=rng)


# ---------------------------------------------------------------------------
# prune-rate schedule (sparse_core.py:49-64)
# ---------------------------------------------------------------------------


def cosine_prune_rate(step: Array, prune_rate: float, t_max: int,
                      eta_min: float = 0.005) -> Array:
    """Closed form of torch CosineAnnealingLR after ``step`` steps."""
    s = jnp.minimum(step.astype(jnp.float32), float(t_max))
    return eta_min + (prune_rate - eta_min) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * s / float(t_max)))


# ---------------------------------------------------------------------------
# apply / prune / grow
# ---------------------------------------------------------------------------


def apply_mask(weights: Dict[str, Array], masks: MaskTree) -> Dict[str, Array]:
    return {n: (w * masks[n].astype(w.dtype)) if n in masks else w
            for n, w in weights.items()}


def apply_mask_to_tree(params: Any, masks: MaskTree) -> Any:
    """params <- params * mask for every masked leaf (sparse_core.py:316-333)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, leaf in flat:
        name = _path_str(path)
        if name in masks:
            leaf = leaf * masks[name].astype(leaf.dtype)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _ranks_ascending(x: Array) -> Array:
    """rank[i] = position of x[i] in ascending sort order (ties broken by
    index, like torch.sort's stable order on CUDA is not guaranteed; exact
    tie behavior is test-exempt)."""
    flat = x.ravel()
    order = jnp.argsort(flat)
    ranks = jnp.zeros_like(order).at[order].set(
        jnp.arange(flat.size, dtype=order.dtype))
    return ranks.reshape(x.shape)


def magnitude_prune(mask: Array, weight: Array, prune_rate: Array) -> Array:
    """funcs.py:56-114 with fixed shapes: zero the (zeros + ceil(pr*nnz))
    smallest-|w| entries of the mask."""
    nnz = jnp.sum(mask)
    zeros = mask.size - nnz
    num_remove = jnp.ceil(prune_rate * nnz)
    k = zeros + num_remove
    ranks = _ranks_ascending(jnp.abs(weight))
    pruned = jnp.where(ranks.astype(jnp.float32) < k, 0.0, mask)
    # reference early-out: num_remove == 0 -> mask = (w != 0)
    return jnp.where(num_remove == 0,
                     (weight != 0.0).astype(mask.dtype), pruned)


def set_prune(mask: Array, weight: Array, prune_rate: Array) -> Array:
    """funcs.py:149-164 ('SET'): half smallest-|w|, half most-negative."""
    nnz = jnp.sum(mask)
    zeros = mask.size - nnz
    num_remove = jnp.ceil(prune_rate * nnz)
    k_mag = zeros + jnp.ceil(num_remove / 2.0)
    k_neg = jnp.ceil(num_remove / 2.0)
    r_mag = _ranks_ascending(jnp.abs(weight)).astype(jnp.float32)
    r_neg = _ranks_ascending(weight).astype(jnp.float32)
    pruned = jnp.where((r_mag < k_mag) | (r_neg < k_neg), 0.0, mask)
    return jnp.where(num_remove == 0,
                     (weight != 0.0).astype(mask.dtype), pruned)


def random_growth(rng: Array, new_mask: Array, regrowth: Array) -> Array:
    """funcs.py:170-175: Bernoulli(regrowth / zeros) over the whole tensor,
    OR'd in. The regrown count is binomial around ``regrowth``, exactly like
    the reference."""
    n_zeros = jnp.sum(new_mask == 0)
    p = jnp.where(n_zeros > 0, regrowth / jnp.maximum(n_zeros, 1), 0.0)
    coins = jax.random.uniform(rng, new_mask.shape) < p
    return jnp.maximum(new_mask, coins.astype(new_mask.dtype))


def score_growth(new_mask: Array, score: Array, regrowth: Array) -> Array:
    """Top-|score| growth over currently-masked positions — the shared core
    of gradient_growth (funcs.py:196-205) and momentum_growth (:227-299)."""
    masked_score = jnp.abs(score) * (new_mask == 0).astype(score.dtype)
    # descending ranks with fixed shapes
    ranks = _ranks_ascending(-masked_score).astype(jnp.float32)
    grown = (ranks < regrowth).astype(new_mask.dtype)
    return jnp.maximum(new_mask, grown)


def random_unfired_growth(rng: Array, new_mask: Array, fired: Array,
                          regrowth: Array) -> Array:
    """funcs.py:177-194: prefer never-fired positions; overflow randomly.

    Fixed-shape version: give unfired positions random priority keys, grow
    the ``regrowth`` best; if regrowth exceeds the unfired count, turn on all
    unfired and Bernoulli the rest (matching the reference's else-branch)."""
    num_unfired = jnp.sum(fired == 0)

    k1, k2 = jax.random.split(rng)
    # case A: regrowth <= unfired -> sample `regrowth` unfired slots
    pri = jax.random.uniform(k1, new_mask.shape) + (fired != 0) * 2.0
    ranks = _ranks_ascending(pri).astype(jnp.float32)
    grown_a = jnp.maximum(new_mask, (ranks < regrowth).astype(new_mask.dtype))
    # case B: all unfired + Bernoulli over the remaining zeros
    with_unfired = jnp.maximum(new_mask, (fired == 0).astype(new_mask.dtype))
    n = jnp.maximum(jnp.sum(with_unfired == 0), 1)
    p = (regrowth - num_unfired) / n
    coins = jax.random.uniform(k2, new_mask.shape) < p
    grown_b = jnp.maximum(with_unfired, coins.astype(new_mask.dtype))
    return jnp.where(regrowth <= num_unfired, grown_a, grown_b)


def global_magnitude_prune(masks: MaskTree, weights: Dict[str, Array],
                           prune_rate: Array) -> MaskTree:
    """funcs.py:116-148 (``global_magnitude``) with exact counts: kill the
    ``ceil(prune_rate * total_nonzero)`` smallest-|w| weights across ALL
    masked layers at once.

    The reference tunes a global threshold by iterative search within a
    tolerance band; the fixed-shape cross-layer rank (concatenate, rank,
    scatter back) realizes the same semantics exactly — masked positions
    hold w == 0, so they always rank below live weights, mirroring the
    reference's ``mask = |w| > threshold`` rebuild."""
    names = list(masks)
    all_w = jnp.concatenate(
        [jnp.abs(weights[n].astype(jnp.float32)).ravel() for n in names])
    total_nnz = sum(jnp.sum(masks[n]) for n in names)
    zeros = all_w.size - total_nnz
    num_remove = jnp.ceil(prune_rate * total_nnz)
    kill = _ranks_ascending(all_w).astype(jnp.float32) < zeros + num_remove
    out: MaskTree = {}
    off = 0
    for n in names:
        m = masks[n]
        k = kill[off:off + m.size].reshape(m.shape)
        pruned = jnp.where(k, 0.0, m)
        out[n] = jnp.where(num_remove == 0,
                           (weights[n] != 0.0).astype(m.dtype), pruned)
        off += m.size
    return out


def global_momentum_growth(masks: MaskTree, scores: Dict[str, Array],
                           regrowth: Array) -> MaskTree:
    """funcs.py:330-372 (``global_momentum_growth``) with exact counts:
    grow the ``regrowth`` largest-|momentum| currently-masked positions
    across ALL layers (the reference's threshold search, made exact by a
    cross-layer rank)."""
    names = list(masks)
    all_s = jnp.concatenate(
        [(jnp.abs(scores[n].astype(jnp.float32))
          * (masks[n] == 0).astype(jnp.float32)).ravel() for n in names])
    grow = _ranks_ascending(-all_s).astype(jnp.float32) < regrowth
    out: MaskTree = {}
    off = 0
    for n in names:
        m = masks[n]
        g = grow[off:off + m.size].reshape(m.shape)
        out[n] = jnp.maximum(m, g.astype(m.dtype))
        off += m.size
    return out


def mix_growth(rng: Array, new_mask: Array, score: Array, regrowth: Array,
               mix: float) -> Array:
    """funcs.py:207-224: gradient top-k for mix fraction, random the rest."""
    g = jnp.floor(regrowth * mix)
    m1 = score_growth(new_mask, score, g)
    return random_growth(rng, m1, regrowth - g)


def momentum_neuron_growth(new_mask: Array, score: Array,
                           regrowth: Array) -> Array:
    """funcs.py:301-327, vectorized over output neurons (rows of dim 0)."""
    m = jnp.abs(score)
    axes = tuple(range(1, m.ndim))
    v = jnp.mean(m, axis=axes)
    v = v / jnp.maximum(jnp.sum(v), 1e-12)
    slots = jnp.sum(new_mask == 0, axis=axes)
    per_neuron = jnp.minimum(jnp.floor(v * regrowth), slots)
    # threshold per neuron: the per_neuron-th largest masked score
    masked = m * (new_mask == 0).astype(m.dtype)
    flat = masked.reshape(masked.shape[0], -1)
    sorted_desc = -jnp.sort(-flat, axis=1)
    idx = jnp.clip(per_neuron.astype(jnp.int32) - 1, 0, flat.shape[1] - 1)
    thr = jnp.take_along_axis(sorted_desc, idx[:, None], axis=1)
    ok = (per_neuron >= 10) & (thr[:, 0] > 0.0)
    grow = (flat > thr) & ok[:, None]
    return jnp.maximum(new_mask, grow.reshape(new_mask.shape).astype(
        new_mask.dtype))


# ---------------------------------------------------------------------------
# truncate_weights: the every-N-steps prune+grow (sparse_core.py:335-357)
# ---------------------------------------------------------------------------


def truncate_weights(
    state: MaskState,
    params: Any,
    cfg: MaskConfig,
    prune_rate: Array,
    grads: Optional[Any] = None,
    momentum: Optional[Any] = None,
) -> Tuple[MaskState, Any]:
    """One prune-and-grow update. Returns (new_state, masked_params).

    ``grads``/``momentum`` are pytrees matching ``params`` — required for
    gradient/momentum growth modes (the reference reads ``weight.grad`` and
    the Adam moments, sparse_core.py:362-374).
    """
    weights = select_maskable(params, only_L=cfg.only_L)
    grad_map = select_maskable(grads, only_L=cfg.only_L) if grads is not None \
        else None
    mom_map = select_maskable(momentum, only_L=cfg.only_L) \
        if momentum is not None else None

    rng = state.rng

    # prune (per-layer or cross-layer global)
    pruned_map: MaskTree = {}
    if cfg.prune_mode == "global_magnitude":
        pruned_map = global_magnitude_prune(
            state.masks, {n: weights[n] for n in state.masks}, prune_rate)
    else:
        for name, mask in state.masks.items():
            w = weights[name].astype(jnp.float32)
            if cfg.prune_mode == "magnitude":
                pruned_map[name] = magnitude_prune(mask, w, prune_rate)
            elif cfg.prune_mode == "SET":
                pruned_map[name] = set_prune(mask, w, prune_rate)
            else:
                raise ValueError(f"unknown prune_mode {cfg.prune_mode!r}")

    if cfg.growth_mode == "global_momentum_growth":
        total_regrowth = jnp.floor(sum(
            jnp.sum(state.masks[n]) - jnp.sum(pruned_map[n])
            for n in state.masks))
        new_masks = global_momentum_growth(
            pruned_map, {n: mom_map[n] for n in pruned_map}, total_regrowth)
        fired = {n: jnp.maximum(state.fired[n], new_masks[n])
                 for n in new_masks}
        new_state = MaskState(masks=new_masks, fired=fired,
                              steps=state.steps, rng=rng)
        return new_state, apply_mask_to_tree(params, new_masks)

    new_masks: MaskTree = {}
    for name, mask in state.masks.items():
        w = weights[name].astype(jnp.float32)
        nnz_before = jnp.sum(mask)
        pruned = pruned_map[name]
        regrowth = jnp.floor(nnz_before - jnp.sum(pruned))

        if cfg.growth_mode == "random":
            rng, k = jax.random.split(rng)
            grown = random_growth(k, pruned, regrowth)
        elif cfg.growth_mode == "gradient":
            grown = score_growth(pruned, grad_map[name], regrowth)
        elif cfg.growth_mode == "momentum":
            grown = score_growth(pruned, mom_map[name], regrowth)
        elif cfg.growth_mode == "mix":
            rng, k = jax.random.split(rng)
            grown = mix_growth(k, pruned, grad_map[name], regrowth, cfg.mix)
        elif cfg.growth_mode == "random_unfired":
            rng, k = jax.random.split(rng)
            grown = random_unfired_growth(k, pruned, state.fired[name],
                                          regrowth)
        elif cfg.growth_mode == "momentum_neuron":
            grown = momentum_neuron_growth(pruned, mom_map[name], regrowth)
        else:
            raise ValueError(f"unknown growth_mode {cfg.growth_mode!r}")

        new_masks[name] = grown

    fired = {n: jnp.maximum(state.fired[n], new_masks[n])
             for n in new_masks}
    new_state = MaskState(masks=new_masks, fired=fired, steps=state.steps,
                          rng=rng)
    return new_state, apply_mask_to_tree(params, new_masks)


# ---------------------------------------------------------------------------
# observability (sparse_core.py:376-402)
# ---------------------------------------------------------------------------


def sparsity_report(state: MaskState) -> Dict[str, Any]:
    """Per-layer densities + ITOP fired-weights ratio."""
    layers = {}
    total_nnz = total = fired_nnz = 0.0
    for name, m in state.masks.items():
        nnz = float(jnp.sum(m))
        layers[name] = nnz / m.size
        total_nnz += nnz
        total += m.size
        fired_nnz += float(jnp.sum(state.fired[name]))
    return {
        "layers": layers,
        "density": total_nnz / max(total, 1),
        "fired_ratio": fired_nnz / max(total, 1),
    }
