"""Checkpoint / resume — the reference's ``utils.save_model`` /
``auto_load_model`` (``utils.py:447-544``) rebuilt on Orbax.

Improvements over the reference, as planned in SURVEY.md §7.6:
  * masks ARE serialized (the reference drops them and re-derives from zero
    weights via ``--sparse_init resume``, ``sparse_core.py:158-172``; we keep
    that path only for importing torch checkpoints).
  * retention window: keep the last ``save_ckpt_num`` checkpoints saved every
    ``save_ckpt_freq`` epochs, plus ``best`` / ``best-ema`` snapshots
    (``utils.py:465-469``, ``main.py:461-489``).
  * auto-resume picks the latest ``checkpoint-N`` (``utils.py:508-521``).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _ckpt(path: str) -> str:
    return os.path.abspath(path)


def save_pytree(path: str, tree: Any) -> None:
    if not _HAS_ORBAX:
        raise RuntimeError("orbax not available")
    path = _ckpt(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    if not _HAS_ORBAX:
        raise RuntimeError("orbax not available")
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            # construct_restore_args carries the *target's* shardings, so
            # restore is topology-robust: a ckpt saved on an N-device mesh
            # loads on 1 device (and vice versa)
            restore_args = ocp.checkpoint_utils.construct_restore_args(target)
            return ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=target, restore_args=restore_args))
        return ckptr.restore(path)


def save_checkpoint(output_dir: str, train_state: Any, epoch: int,
                    tag: Optional[str] = None,
                    save_ckpt_freq: int = 1, save_ckpt_num: int = 3) -> str:
    """Save ``checkpoint-{epoch|tag}`` and apply the retention window."""
    name = f"checkpoint-{tag if tag is not None else epoch}"
    path = os.path.join(output_dir, name)
    save_pytree(path, train_state)

    if tag is None and epoch >= save_ckpt_freq * save_ckpt_num:
        old = epoch - save_ckpt_freq * save_ckpt_num
        old_path = os.path.join(output_dir, f"checkpoint-{old}")
        if os.path.exists(old_path):
            shutil.rmtree(old_path, ignore_errors=True)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Glob-latest numeric checkpoint (utils.py:512-521)."""
    if not os.path.isdir(output_dir):
        return None
    best_epoch, best = -1, None
    for entry in os.listdir(output_dir):
        m = re.match(r"checkpoint-(\d+)$", entry)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(output_dir, entry)
    return best


def _cast_like(t_kid: Any, r_kid: Any) -> Any:
    """Restore r into t's structure with t's leaf dtypes (same treedef)."""
    import jax.numpy as jnp
    td = jax.tree_util.tree_structure(t_kid)
    leaves = [jnp.asarray(r).astype(t.dtype) if hasattr(t, "dtype") else r
              for r, t in zip(jax.tree_util.tree_leaves(r_kid),
                              jax.tree_util.tree_leaves(t_kid))]
    return jax.tree_util.tree_unflatten(td, leaves)


def _is_packed(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"big", "flat"}


def _adapt_kid(t_kid: Any, r_kid: Any, plans) -> Optional[Any]:
    """Adapt a checkpointed subtree whose pack-format differs from the
    target's: an unpacked (round-2 style) ckpt loads into a packed target
    (re-packed with the target's plan) and vice versa (unpacked with a
    plan rebuilt from the target — make_plan is deterministic in the tree
    structure). Returns None when no adaptation applies."""
    from slak_tpu.train import packing
    ts = jax.tree_util.tree_structure
    if ts(t_kid) == ts(r_kid):
        return _cast_like(t_kid, r_kid)
    if _is_packed(t_kid) and not _is_packed(r_kid):
        for plan in plans:
            if plan is None:
                continue
            unpacked_t = packing.unpack(t_kid, plan)
            if ts(unpacked_t) == ts(r_kid):
                return packing.pack(_cast_like(unpacked_t, r_kid), plan)
        return None
    if _is_packed(r_kid) and not _is_packed(t_kid):
        plan = packing.make_plan(t_kid)
        unpacked_r = packing.unpack(r_kid, plan)
        if ts(t_kid) == ts(unpacked_r):
            return _cast_like(t_kid, unpacked_r)
        return None
    if (isinstance(t_kid, dict) and isinstance(r_kid, dict)
            and set(t_kid) == set(r_kid)):
        out = {}
        for k in t_kid:
            a = _adapt_kid(t_kid[k], r_kid[k], plans)
            if a is None:
                return None
            out[k] = a
        return out
    return None


def auto_load(output_dir: str, target: Any) -> tuple[Any, int]:
    """Resume from the latest checkpoint if present.

    Returns (train_state, start_epoch); (target, 0) when nothing found.
    Tolerates structure drift between the checkpoint and the current run:
    a packed-params state loads from an unpacked (pre-packing) checkpoint
    and vice versa (see :func:`_adapt_kid`); other mismatched subtrees
    (e.g. the ckpt carries EMA / mask state the current flags don't, or
    vice versa) keep the target's fresh value.
    """
    path = latest_checkpoint(output_dir)
    if path is None:
        return target, 0
    epoch = int(path.rsplit("-", 1)[1])
    try:
        return restore_pytree(path, target), epoch + 1
    except ValueError:
        if not hasattr(target, "tree_flatten"):
            raise
        raw = restore_pytree(path)  # saved structure, no target
        raw_children = list(raw) if isinstance(raw, (list, tuple)) else [raw]
        plans = (getattr(target, "plan", None),
                 getattr(target, "ms_plan", None))
        out_kids = []
        for t_kid, r_kid in zip(target.tree_flatten()[0], raw_children):
            restored = t_kid
            if t_kid is not None and r_kid is not None:
                adapted = _adapt_kid(t_kid, r_kid, plans)
                if adapted is not None:
                    restored = adapted
            out_kids.append(restored)
        aux = target.tree_flatten()[1]
        return type(target).tree_unflatten(aux, tuple(out_kids)), epoch + 1
