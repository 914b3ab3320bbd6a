"""Knowledge-distillation engine — the jitted equivalent of the reference's
``engine_kd.train_one_epoch`` (``engine_kd.py:86-277``) + ``main_KD.py``
wiring: a frozen teacher forward, a student step whose loss is one of
None / KD / NKD / FD(+KD/+NKD) / MGD, with the same optimizer/DST/EMA
machinery as the plain engine.

The teacher's params are closed-over constants, so gradients flow only
through the student — the functional equivalent of the reference stepping
only the student optimizer (backward there also touches the teacher, a
wasted compute the reference pays and we don't).

FD/MGD auxiliary heads (feature projection, MGD generator) are trainable
parameters carried in ``kd_params`` and optimized jointly with the student,
like the reference's ``project_*`` heads (``timm1/models/resnet.py:588-709``)
and MGD ``generation`` convs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.kd import losses as KL
from slak_tpu.sparsity import MaskConfig, apply_mask_to_tree, cosine_prune_rate, truncate_weights
from slak_tpu.train import losses as L
from slak_tpu.train import packing
from slak_tpu.train.ema import ema_update
from slak_tpu.train.engine import TrainConfig, TrainState
from slak_tpu.train.optim import (AdamWConfig, adam_momentum, adamw_init,
                                  adamw_update, param_groups,
                                  param_groups_from_plan)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KDConfig:
    distill_type: str = "NKD"     # None | KD | NKD | FD | FD+KD | FD+NKD | MGD
    temp: float = 1.0             # KD temperature (main_KD flag --T)
    hard: bool = False
    alpha: float = 0.1            # vanilla-KD mixing weight
    nkd_temp: float = 1.0
    nkd_alpha: float = 1.0
    fd_loss_type: str = "smoothL1"  # --FDLoss_type
    lr_fd: float = 1.0              # FD loss weight (--lr_fd)
    mgd: KL.MGDConfig = KL.MGDConfig()


def init_kd_params(rng: Array, kd_cfg: KDConfig, student_channels: int,
                   teacher_channels: int) -> Dict[str, Any]:
    """Trainable aux heads for FD / MGD."""
    p: Dict[str, Any] = {}
    if "FD" in kd_cfg.distill_type and student_channels != teacher_channels:
        k = jax.random.split(rng)[0]
        fan_in = student_channels
        p["fd_proj"] = {
            "w": (jax.random.normal(k, (1, 1, student_channels,
                                        teacher_channels))
                  * jnp.sqrt(2.0 / fan_in)).astype(jnp.float32),
            "b": jnp.zeros((teacher_channels,)),
        }
    if kd_cfg.distill_type == "MGD":
        p["mgd"] = KL.mgd_init(rng, student_channels, teacher_channels)
    return p


def _project(feat, proj):
    out = jax.lax.conv_general_dilated(
        feat, proj["w"].astype(feat.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + proj["b"].astype(out.dtype)


def make_kd_train_step(
    student_model,
    teacher_apply: Callable[[Array], Tuple[Array, Array]],
    kd_cfg: KDConfig,
    train_cfg: TrainConfig,
    mask_cfg: Optional[MaskConfig],
    lr_schedule: Array,
    wd_schedule: Optional[Array],
):
    """``teacher_apply(images) -> (logits_t, feature_t)`` with feature_t the
    final-stage (N,H,W,C) map (None-able when no FD/MGD).

    Returned step signature:
        (state, kd_params, kd_opt_state, batch, rng)
            -> (state, kd_params, kd_opt_state, metrics)
    """
    acfg = AdamWConfig(clip_grad=train_cfg.clip_grad)
    dt = kd_cfg.distill_type

    def loss_fn(params, kd_params, model_state, images, targets, rng,
                logits_t, feat_t, plan=None):
        if plan is not None:
            params = packing.unpack(params, plan)
        images = images.astype(train_cfg.compute_dtype)
        feats, new_model_state = student_model.forward_features(
            params, model_state, images, train=True, rng=rng,
            return_stages=True)
        feat_s = feats[-1]
        pooled = jnp.mean(feat_s, axis=(1, 2))
        from slak_tpu.models.layers import layer_norm
        pooled = layer_norm(pooled, params["norm"]["scale"],
                            params["norm"]["bias"])
        logits = (jnp.dot(pooled, params["head"]["w"].astype(pooled.dtype))
                  + params["head"]["b"]).astype(jnp.float32)

        def ce():
            if targets.ndim == 2:
                return L.soft_target_cross_entropy(logits, targets)
            if train_cfg.smoothing > 0:
                return L.label_smoothing_cross_entropy(logits, targets,
                                                       train_cfg.smoothing)
            return L.cross_entropy(logits, targets)

        if dt == "None":
            loss = ce()
        elif dt == "KD":
            loss = KL.kd_loss(logits, targets, logits_t, kd_cfg.temp,
                              kd_cfg.hard, kd_cfg.alpha)
        elif dt == "NKD":
            loss = KL.nkd_loss(logits, logits_t, targets, kd_cfg.nkd_temp,
                               kd_cfg.nkd_alpha)
        elif dt.startswith("FD"):
            fs = feat_s
            if "fd_proj" in kd_params:
                fs = _project(fs, kd_params["fd_proj"])
            loss_dis = KL.fd_loss(fs, feat_t, kd_cfg.fd_loss_type)
            if "NKD" in dt:
                base = KL.nkd_loss(logits, logits_t, targets,
                                   kd_cfg.nkd_temp, kd_cfg.nkd_alpha)
            elif "KD" in dt:
                base = KL.kd_loss(logits, targets, logits_t, kd_cfg.temp,
                                  kd_cfg.hard, kd_cfg.alpha)
            else:
                base = ce()
            loss = base + loss_dis * kd_cfg.lr_fd
        elif dt == "MGD":
            loss = ce() + KL.mgd_loss(rng, kd_params["mgd"], feat_s, feat_t,
                                      kd_cfg.mgd)
        else:
            raise ValueError(dt)
        return loss, new_model_state

    def train_step(state: TrainState, kd_params, kd_opt_state, batch, rng):
        images, targets = batch
        it = state.step
        lr = lr_schedule[jnp.minimum(it, lr_schedule.shape[0] - 1)]
        wd = train_cfg.weight_decay if wd_schedule is None else \
            wd_schedule[jnp.minimum(it, wd_schedule.shape[0] - 1)]

        logits_t, feat_t = teacher_apply(
            images.astype(train_cfg.compute_dtype))

        plan = state.plan
        (loss, model_state), (grads, kd_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, kd_params, state.model_state, images, targets,
            rng, logits_t, feat_t, plan)

        if plan is not None:
            wd_mask, lr_scale = param_groups_from_plan(
                plan, train_cfg.layer_decay)
        else:
            wd_mask, lr_scale = param_groups(state.params,
                                             train_cfg.layer_decay)
        params, opt_state, gnorm = adamw_update(
            grads, state.opt_state, state.params, lr, wd, wd_mask, lr_scale,
            acfg)

        if kd_params:
            kd_wd, kd_sc = param_groups(kd_params)
            kd_params, kd_opt_state, _ = adamw_update(
                kd_grads, kd_opt_state, kd_params, lr, wd, kd_wd, kd_sc, acfg)

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
                    ms2, p2 = truncate_weights(
                        ms, packing.unpack(p, plan), mask_cfg, pr,
                        grads=packing.unpack(grads, plan),
                        momentum=packing.unpack(mom, plan))
                    return ms2, packing.pack(p2, plan)

                mask_state, params = jax.lax.cond(
                    do, refresh, lambda a: a, (mask_state, params))

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
        metrics = {"loss": loss, "lr": lr, "grad_norm": gnorm}
        return new_state, kd_params, kd_opt_state, metrics

    return train_step


def make_teacher_apply(teacher_model, teacher_params, teacher_state):
    """Wrap one of our models as a frozen teacher exposing (logits, feature)
    — the ``self.feature`` capture the reference's fork adds to its teachers
    (``convnext.py:102-119``)."""
    from slak_tpu.models.layers import layer_norm

    def teacher_apply(images):
        feats, _ = teacher_model.forward_features(
            teacher_params, teacher_state, images, train=False,
            return_stages=True)
        feat = feats[-1]
        pooled = jnp.mean(feat, axis=(1, 2))
        pooled = layer_norm(pooled, teacher_params["norm"]["scale"],
                            teacher_params["norm"]["bias"])
        logits = (jnp.dot(pooled,
                          teacher_params["head"]["w"].astype(pooled.dtype))
                  + teacher_params["head"]["b"]).astype(jnp.float32)
        return jax.lax.stop_gradient(logits), jax.lax.stop_gradient(feat)

    return teacher_apply


def kd_opt_init(kd_params):
    return adamw_init(kd_params) if kd_params else {}
