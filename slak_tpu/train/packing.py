"""Packed parameter state — the TPU-native answer to the reference's
per-tensor optimizer loop (torch.optim.AdamW iterating ``param_groups``,
driven from ``optim_factory.py:73-112``).

Why: the SLaK-T parameter tree has ~1000 small leaves (BN/LN scales,
biases, branch scales — all 1-D).  A per-leaf ``tree_map`` optimizer +
EMA emits ~3-4 tiny fusions per leaf per step; the round-3 trace
(tools/parse_xplane.py on /tmp/prof_r3b_train) attributes ~15-19 ms of a
274 ms train step to this op storm — pure per-op fixed cost, not
bandwidth.  torch solves it with ``foreach``/``fused`` CUDA optimizers;
the TPU-native solution is layout, not a kernel: keep every small leaf
packed in ONE flat fp32 vector across the whole training loop, so the
optimizer/EMA touch two big buffers instead of ~1000 tiny ones.

Design:
  * :func:`make_plan` splits leaves by size: ``ndim >= 2`` weights stay
    individual ("big", where DST masks live — masking.py:116-123 masks
    exactly the ndim>=2 set), everything else packs into a flat vector.
  * A packed tree is the pytree ``{"big": [leaf, ...], "flat": vec}`` —
    every existing pytree transform (adamw_update, ema_update,
    adam_momentum, grad accumulation) works on it unchanged; per-leaf
    wd/lr-scale scalars become per-ELEMENT vectors for the flat leaf
    (broadcasting does the rest).
  * ``unpack`` rebuilds the original tree from slices; under jit the
    slices fuse into their consumers (model.apply reads), and its AD
    transpose re-packs the cotangents into one buffer — so gradients
    arrive ALREADY packed.
  * pack/unpack cross the step boundary only at epoch-level call sites
    (checkpoint save, evaluate) — the hot loop never materializes the
    small leaves individually.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


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


@dataclasses.dataclass(frozen=True)
class PackPlan:
    """Static description of the split (never traced; rebuild from the
    concrete params tree after any structural change)."""
    treedef: Any                      # original tree structure
    names: Tuple[str, ...]            # dotted path per original leaf
    is_big: Tuple[bool, ...]          # per original leaf
    shapes: Tuple[Tuple[int, ...], ...]
    dtypes: Tuple[Any, ...]
    offsets: Tuple[int, ...]          # into the flat vec (packed leaves)
    total: int                        # flat vec length

    @property
    def big_names(self) -> Tuple[str, ...]:
        return tuple(n for n, b in zip(self.names, self.is_big) if b)


def make_plan(params: Any) -> PackPlan:
    """Big = ndim >= 2 (the maskable set); everything else packs."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    names, is_big, shapes, dtypes, offsets = [], [], [], [], []
    off = 0
    for path, leaf in flat:
        names.append(_path_str(path))
        shapes.append(tuple(leaf.shape))
        dtypes.append(leaf.dtype)
        big = leaf.ndim >= 2
        is_big.append(big)
        if big:
            offsets.append(-1)
        else:
            offsets.append(off)
            off += int(np.prod(leaf.shape)) if leaf.shape else 1
    return PackPlan(treedef=treedef, names=tuple(names), is_big=tuple(is_big),
                    shapes=tuple(shapes), dtypes=tuple(dtypes),
                    offsets=tuple(offsets), total=off)


def pack(params: Any, plan: PackPlan) -> Dict[str, Any]:
    """Original tree -> ``{"big": [...], "flat": fp32 vec}``.  Big leaves
    pass through by reference (no copy); small leaves are raveled into one
    concatenate (a single HLO)."""
    leaves = jax.tree_util.tree_leaves(params)
    big: List[Array] = []
    small: List[Array] = []
    for leaf, is_big in zip(leaves, plan.is_big):
        if is_big:
            big.append(leaf)
        else:
            small.append(jnp.asarray(leaf, jnp.float32).reshape(-1))
    flat = (jnp.concatenate(small) if small
            else jnp.zeros((0,), jnp.float32))
    return {"big": big, "flat": flat}


def unpack(packed: Dict[str, Any], plan: PackPlan) -> Any:
    """Packed -> original tree.  Under jit the flat-vector slices fuse
    into their consumers; the AD transpose of this function packs the
    small-leaf cotangents back into one buffer."""
    big = list(packed["big"])
    flat = packed["flat"]
    leaves = []
    bi = 0
    for is_big, shape, dtype, off in zip(plan.is_big, plan.shapes,
                                         plan.dtypes, plan.offsets):
        if is_big:
            leaves.append(big[bi])
            bi += 1
        else:
            n = int(np.prod(shape)) if shape else 1
            leaves.append(jax.lax.slice_in_dim(flat, off, off + n)
                          .reshape(shape).astype(dtype))
    return jax.tree_util.tree_unflatten(plan.treedef, leaves)


def pack_per_leaf_values(values: Any, plan: PackPlan) -> Dict[str, Any]:
    """Per-leaf SCALARS (wd_mask / lr_scale trees from param_groups) ->
    packed structure where the flat leaf's value is a per-ELEMENT fp32
    vector (built host-side once; a device constant thereafter)."""
    leaves = jax.tree_util.tree_leaves(values)
    big: List[Any] = []
    segs: List[np.ndarray] = []
    for val, is_big, shape in zip(leaves, plan.is_big, plan.shapes):
        if is_big:
            big.append(val)
        else:
            n = int(np.prod(shape)) if shape else 1
            segs.append(np.full((n,), float(val), np.float32))
    flat = (jnp.asarray(np.concatenate(segs)) if segs
            else jnp.zeros((0,), jnp.float32))
    return {"big": big, "flat": flat}


def remap_masks(masks: Optional[Dict[str, Array]],
                plan: PackPlan) -> Optional[Dict[str, Array]]:
    """Masks keyed by original dotted paths -> keyed by packed paths
    (``big.{i}``), for name-matching consumers (ema_update)."""
    if masks is None:
        return None
    out = {}
    for i, name in enumerate(plan.big_names):
        if name in masks:
            out[f"big.{i}"] = masks[name]
    return out


def apply_mask_packed(packed: Dict[str, Any], masks: Dict[str, Array],
                      plan: PackPlan) -> Dict[str, Any]:
    """apply_mask_to_tree on the packed structure — masks live only on
    big (ndim>=2) leaves, so the flat vector passes through untouched."""
    big = []
    for leaf, name in zip(packed["big"], plan.big_names):
        if name in masks:
            leaf = leaf * masks[name].astype(leaf.dtype)
        big.append(leaf)
    return {"big": big, "flat": packed["flat"]}
