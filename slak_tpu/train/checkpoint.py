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


def auto_load(output_dir: str, target: Any) -> tuple[Any, int]:
    """Resume from the latest checkpoint if present.

    Returns (train_state, start_epoch); (target, 0) when nothing found.
    Tolerates structure drift between the checkpoint and the current run
    (e.g. the ckpt carries EMA / mask state the current flags don't, or
    vice versa): mismatched subtrees keep the target's fresh value.
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
        import jax.numpy as jnp
        raw = restore_pytree(path)  # saved structure, no target
        raw_children = list(raw) if isinstance(raw, (list, tuple)) else [raw]
        out_kids = []
        for t_kid, r_kid in zip(target.tree_flatten()[0], raw_children):
            restored = t_kid
            if t_kid is not None and r_kid is not None:
                td = jax.tree_util.tree_structure(t_kid)
                if td == jax.tree_util.tree_structure(r_kid):
                    leaves = [
                        jnp.asarray(r).astype(t.dtype)
                        if hasattr(t, "dtype") else r
                        for r, t in zip(jax.tree_util.tree_leaves(r_kid),
                                        jax.tree_util.tree_leaves(t_kid))]
                    restored = jax.tree_util.tree_unflatten(td, leaves)
            out_kids.append(restored)
        aux = target.tree_flatten()[1]
        return type(target).tree_unflatten(aux, tuple(out_kids)), epoch + 1
