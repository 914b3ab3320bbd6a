"""Jitted train/eval engine — the TPU-native equivalent of the reference's
``engine.py`` hot loop (``engine.py:17-178``) plus the ``mask.step()``
integration (``sparse_core.py:300-313``).

One call to :func:`train_step` performs, entirely on device:

  1. gather LR / WD for this iteration from the precomputed cosine arrays
     (reference writes them into param_groups, ``engine.py:39-44``);
  2. forward + backward over ``update_freq`` micro-batches via ``lax.scan``
     (the reference's Python-side grad accumulation, ``engine.py:33,69-88``);
  3. AdamW step with per-param lr_scale / wd masking;
  4. ``apply_mask`` (weights * mask after every step, sparse_core.py:316);
  5. cosine prune-rate decay + ``lax.cond``-gated prune-and-grow every
     ``update_frequency`` steps — no recompile, masks are data;
  6. sparse-aware EMA update (model_sema.py:67-91).

Note the reference's AMP caveat (SURVEY.md §3.2): in its AMP branch
``mask.step()`` is never called, so sparse recipes run fp32. On TPU we train
in bf16 compute with fp32 params/masks and DST *always* runs — a documented
improvement, not a divergence in results (masks see fp32 weights).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from slak_tpu.models import slak as slak_model
from slak_tpu.sparsity import (MaskConfig, MaskState, apply_mask_to_tree,
                               cosine_prune_rate, truncate_weights)
from slak_tpu.train import losses as L
from slak_tpu.train import packing
from slak_tpu.train.ema import ema_init, ema_update
from slak_tpu.train.optim import (AdamWConfig, AdanConfig, adam_momentum,
                                  adamw_init, adamw_update, adan_init,
                                  adan_update, param_groups,
                                  param_groups_from_plan)

Array = jax.Array


@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any            # BN running stats
    opt_state: Dict[str, Any]
    step: Array                 # global optimizer-step counter (int32)
    mask_state: Optional[MaskState] = None
    ema_params: Optional[Any] = None
    ema_model_state: Optional[Any] = None
    # static pack plans (pytree aux, not traced): params / model_state.
    # When set, ``params``/``ema_params`` hold the packed {"big","flat"}
    # structure and ``ema_model_state`` the flat-packed model state; use
    # :meth:`tree_params` / :meth:`tree_ema` at tree-consuming boundaries.
    plan: Optional[packing.PackPlan] = None
    ms_plan: Optional[packing.PackPlan] = None

    def tree_flatten(self):
        children = (self.params, self.model_state, self.opt_state, self.step,
                    self.mask_state, self.ema_params, self.ema_model_state)
        return children, (self.plan, self.ms_plan)

    @classmethod
    def tree_unflatten(cls, aux, children):
        plan, ms_plan = aux if aux is not None else (None, None)
        return cls(*children, plan=plan, ms_plan=ms_plan)

    def tree_params(self) -> Any:
        """Params in the original tree structure (for evaluate/deploy/
        conversion). Identity when packing is off."""
        if self.plan is None:
            return self.params
        return packing.unpack(self.params, self.plan)

    def tree_ema(self) -> Any:
        """(ema_params, ema_model_state) as original-structure trees."""
        ep, es = self.ema_params, self.ema_model_state
        if self.plan is not None and ep is not None:
            ep = packing.unpack(ep, self.plan)
        if self.ms_plan is not None and es is not None:
            es = packing.unpack(es, self.ms_plan)
        return ep, es


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Recipe constants (reference README.md:102-135, main.py:94-221)."""
    weight_decay: float = 0.05
    smoothing: float = 0.1
    update_freq: int = 1
    clip_grad: Optional[float] = None
    ema_decay: Optional[float] = None      # 0.9999 when EMA on
    layer_decay: Optional[float] = None
    compute_dtype: Any = jnp.float32       # jnp.bfloat16 on TPU
    # optimizer selection (reference main.py:78 ``--opt``; the fork's
    # timm registers Adan at timm1/optim/optim_factory.py:290-292)
    opt: str = "adamw"                     # "adamw" | "adan"
    opt_eps: float = 1e-8
    opt_betas: Optional[tuple] = None      # None -> optimizer default
    # DST schedule (sparse_core.py:49-64; T_max = total optimizer steps)
    prune_t_max: int = 0
    # Keep the ~1000 small (1-D) leaves packed in one flat fp32 vector
    # across the training loop (see packing.py) — kills the per-leaf
    # optimizer/EMA op storm (~15-19 ms/step in the round-3 trace).
    pack_params: bool = True


def create_train_state(
    rng: Array,
    model: "slak_model.SLaK",
    train_cfg: TrainConfig,
    mask_cfg: Optional[MaskConfig] = None,
    snip_loss_fn: Optional[Callable[[Any], Array]] = None,
) -> TrainState:
    params, model_state = model.init(rng)
    mask_state = None
    if mask_cfg is not None:
        from slak_tpu.sparsity import init_masks
        mask_state = init_masks(jax.random.fold_in(rng, 1), params, mask_cfg,
                                loss_fn=snip_loss_fn)
        params = apply_mask_to_tree(params, mask_state.masks)
    plan = ms_plan = None
    if train_cfg.pack_params:
        plan = packing.make_plan(params)
        params = packing.pack(params, plan)
        if train_cfg.ema_decay:
            ms_plan = packing.make_plan(model_state)
    opt_state = (adan_init(params) if train_cfg.opt == "adan"
                 else adamw_init(params))
    ema_p = ema_init(params) if train_cfg.ema_decay else None
    ema_s = None
    if train_cfg.ema_decay:
        ema_s = ema_init(packing.pack(model_state, ms_plan)
                         if ms_plan is not None else model_state)
    return TrainState(params=params, model_state=model_state,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                      mask_state=mask_state, ema_params=ema_p,
                      ema_model_state=ema_s, plan=plan, ms_plan=ms_plan)


def make_train_step(
    model: "slak_model.SLaK",
    train_cfg: TrainConfig,
    mask_cfg: Optional[MaskConfig],
    lr_schedule: Array,          # per-iteration LR array (device-resident)
    wd_schedule: Optional[Array],
    adamw_cfg: Optional[AdamWConfig] = None,
    pmean_axis: Optional[str] = None,
):
    """Build the jittable train-step function.

    The returned fn has signature
        (state: TrainState, batch: (images, targets), rng) -> (state, metrics)
    where images is (update_freq * B, H, W, C) — micro-batching happens
    inside via lax.scan — and targets are soft (N, num_classes) when mixup
    is on, else int labels.

    ``pmean_axis``: set when the step runs under ``shard_map`` over a data
    axis (see :func:`slak_tpu.parallel.syncbn.make_syncbn_train_step`) —
    grads/metrics are pmean'd across shards (the DDP all-reduce), and the
    model's BN can use the same axis for SyncBN-faithful batch statistics
    (reference ``models/SLaK.py:24-28``).
    """
    if adamw_cfg is not None:
        acfg = adamw_cfg
        opt_update = adamw_update
    elif train_cfg.opt == "adan":
        acfg = AdanConfig(
            betas=(tuple(train_cfg.opt_betas) if train_cfg.opt_betas
                   else AdanConfig.betas),
            eps=train_cfg.opt_eps, clip_grad=train_cfg.clip_grad)
        opt_update = adan_update
    else:
        acfg = AdamWConfig(
            betas=(tuple(train_cfg.opt_betas) if train_cfg.opt_betas
                   else AdamWConfig.betas),
            eps=train_cfg.opt_eps, clip_grad=train_cfg.clip_grad)
        opt_update = adamw_update

    def loss_fn(params, model_state, images, targets, rng, plan=None):
        if plan is not None:
            params = packing.unpack(params, plan)
        images = images.astype(train_cfg.compute_dtype)
        logits, new_model_state = model.apply(params, model_state, images,
                                              train=True, rng=rng)
        if targets.ndim == 2:
            loss = L.soft_target_cross_entropy(logits, targets)
        elif train_cfg.smoothing > 0:
            loss = L.label_smoothing_cross_entropy(logits, targets,
                                                   train_cfg.smoothing)
        else:
            loss = L.cross_entropy(logits, targets)
        return loss, new_model_state

    def train_step(state: TrainState, batch, rng):
        images, targets = batch
        uf = train_cfg.update_freq
        it = state.step
        plan = state.plan
        lr = lr_schedule[jnp.minimum(it, lr_schedule.shape[0] - 1)]
        wd = train_cfg.weight_decay if wd_schedule is None else \
            wd_schedule[jnp.minimum(it, wd_schedule.shape[0] - 1)]

        if plan is not None:
            wd_mask, lr_scale = param_groups_from_plan(
                plan, train_cfg.layer_decay)
        else:
            wd_mask, lr_scale = param_groups(state.params,
                                             train_cfg.layer_decay)

        # --- grad accumulation over update_freq micro-batches (lax.scan) ---
        if uf > 1:
            mb = images.shape[0] // uf
            images = images[:mb * uf].reshape(uf, mb, *images.shape[1:])
            targets = targets[:mb * uf].reshape(uf, mb, *targets.shape[1:])

            def micro(carry, xt):
                acc, lsum, mstate, k = carry
                k, sub = jax.random.split(k)
                (l, mstate), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, mstate, xt[0],
                                           xt[1], sub, plan)
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (acc, lsum + l, mstate, k), None

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (gsum, lsum, model_state, _), _ = jax.lax.scan(
                micro, (zero, jnp.float32(0.0), state.model_state, rng),
                (images, targets))
            grads = jax.tree_util.tree_map(lambda g: g / uf, gsum)
            loss = lsum / uf  # mean micro-batch loss, no extra forward
        else:
            (loss, model_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.model_state,
                                       images, targets, rng, plan)

        if pmean_axis is not None:
            # DDP grad all-reduce under shard_map (implicit under plain jit)
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)

        # --- optimizer step -------------------------------------------------
        params, opt_state, gnorm = opt_update(
            grads, state.opt_state, state.params, lr, wd, wd_mask, lr_scale,
            acfg)

        # --- sparsity: apply mask + cond-gated prune/grow -------------------
        mask_state = state.mask_state
        if mask_state is not None and mask_cfg is not None:
            if plan is not None:
                params = packing.apply_mask_packed(params, mask_state.masks,
                                                   plan)
            else:
                params = apply_mask_to_tree(params, mask_state.masks)
            new_step = it + 1
            pr = cosine_prune_rate(new_step, mask_cfg.prune_rate,
                                   max(train_cfg.prune_t_max, 1),
                                   mask_cfg.eta_min)
            if mask_cfg.update_frequency and not mask_cfg.fix:
                do = (new_step % mask_cfg.update_frequency) == 0

                def refresh(args):
                    ms, p = args
                    mom = adam_momentum(opt_state)
                    if plan is None:
                        return truncate_weights(ms, p, mask_cfg, pr,
                                                grads=grads, momentum=mom)
                    # masks touch only the big (ndim>=2) leaves; unpack
                    # to trees for the path-based DST core, re-pack after
                    ms2, p2 = truncate_weights(
                        ms, packing.unpack(p, plan), mask_cfg, pr,
                        grads=packing.unpack(grads, plan),
                        momentum=packing.unpack(mom, plan))
                    return ms2, packing.pack(p2, plan)

                mask_state, params = jax.lax.cond(
                    do, refresh, lambda a: a, (mask_state, params))

        # --- EMA -------------------------------------------------------------
        ema_p, ema_s = state.ema_params, state.ema_model_state
        if train_cfg.ema_decay:
            masks = mask_state.masks if mask_state is not None else None
            if plan is not None:
                masks = packing.remap_masks(masks, plan)
            ema_p = ema_update(ema_p, params, train_cfg.ema_decay, masks)
            ms_for_ema = model_state if state.ms_plan is None else \
                packing.pack(model_state, state.ms_plan)
            ema_s = ema_update(ema_s, ms_for_ema, train_cfg.ema_decay)

        new_state = TrainState(
            params=params, model_state=model_state, opt_state=opt_state,
            step=it + 1, mask_state=mask_state, ema_params=ema_p,
            ema_model_state=ema_s, plan=plan, ms_plan=state.ms_plan)
        metrics = {"loss": loss, "lr": lr, "grad_norm": gnorm,
                   "weight_decay": wd}
        return new_state, metrics

    return train_step


def make_eval_step(model: "slak_model.SLaK",
                   compute_dtype=jnp.float32):
    """evaluate() equivalent (engine.py:142-178): CE loss + top-1/5."""

    def eval_step(params, model_state, batch):
        images, labels = batch
        logits, _ = model.apply(params, model_state,
                                images.astype(compute_dtype), train=False)
        return {
            "loss": L.cross_entropy(logits, labels),
            "acc1": L.accuracy_topk(logits, labels, 1),
            "acc5": L.accuracy_topk(logits, labels, 5),
            "n": jnp.float32(labels.shape[0]),
        }

    return eval_step
