"""COCO Cascade Mask R-CNN training driver — the counterpart of running the
reference's detection config under mmdet's ``tools/train.py`` (reference
``detection/README.md`` launches
``cascade_mask_rcnn_slak_tiny_mstrain_480-800_adamw_3x_coco_in1k.py`` via
dist_train.sh; that config's optimizer block —
``constructor='LearningRateDecayOptimizerConstructor'``, AdamW lr 1e-4,
wd 0.05, ``decay_rate=0.7, decay_type='layer_wise', num_layers=6`` — is
``:135-141``).

This driver proves the wiring the reference gets from mmdet: recipe ->
SLaK backbone (multi-scale features) -> FPN + RPN + 3-stage cascade +
mask head (:mod:`slak_tpu.downstream.detection`) -> AdamW with layer-decay
parameter groups -> step LR (3x schedule: x0.1 at epochs 27, 33) -> jitted
train step -> checkpoint / resume. ``--data_set synthetic`` generates
COCO-shaped batches (images + padded boxes/labels/valid/masks) so the full
path runs end-to-end without the dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def get_det_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("SLaK COCO detection", add_help=False)
    p.add_argument("--recipe", default="cascade_mask_rcnn_slak_tiny_3x_coco")
    p.add_argument("--data_set", default="synthetic", choices=["synthetic"])
    p.add_argument("--steps", type=int, default=None,
                   help="total optimizer steps (default: epochs * "
                        "steps_per_epoch)")
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--img_size", type=int, default=800)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_gts", type=int, default=8,
                   help="padded ground-truth slots per image")
    p.add_argument("--smoke", action="store_true",
                   help="shrink backbone+heads to CI scale (same optimizer/"
                        "schedule/loss wiring)")
    p.add_argument("--backbone_ckpt", default="")
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true",
                   help="per-block activation remat in the backbone "
                        "(jax.checkpoint) — trades FLOPs for HBM at "
                        "1333x800-class inputs")
    p.add_argument("--eval", action="store_true",
                   help="evaluate COCO-style box+mask AP (the metric the "
                        "reference's 48.4/41.8 AP table is denominated in) "
                        "instead of training; restores the latest "
                        "checkpoint from --output_dir if present")
    p.add_argument("--eval_batches", type=int, default=8)
    p.add_argument("--max_dets", type=int, default=100)
    return p


def _head_cfg(recipe, smoke: bool):
    from slak_tpu.downstream.detection import DetHeadConfig
    if smoke:
        return DetHeadConfig(
            in_channels=(8, 16, 24, 32), fpn_channels=16, num_classes=5,
            fc_out=32, rpn_sample=16, rcnn_sample=32, num_proposals=16,
            mask_convs=2, num_shared_convs=2)
    dims = recipe.backbone.model.widened_dims
    return DetHeadConfig(in_channels=dims, num_classes=recipe.num_classes)


def _smoke_backbone():
    from slak_tpu.models.backbone import BackboneConfig
    from slak_tpu.models.slak import SLaKConfig
    return BackboneConfig(
        model=SLaKConfig(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                         kernel_size=(13, 11, 9, 7, 5), decom=True,
                         branch_bn=True, drop_path_rate=0.0,
                         conv_impl="xla"),
        out_indices=(0, 1, 2, 3), sparse=False)


def _synthetic_det_batch(rng: np.random.Generator, n: int, size: int,
                         g: int, num_classes: int):
    x = rng.standard_normal((n, size, size, 3)).astype(np.float32)
    xy = rng.uniform(0, size * 0.75, (n, g, 2))
    wh = rng.uniform(size * 0.1, size * 0.25, (n, g, 2))
    boxes = np.concatenate([xy, np.minimum(xy + wh, size - 1)], -1)
    labels = rng.integers(0, num_classes, (n, g)).astype(np.int32)
    nv = rng.integers(1, g + 1, n)
    valid = (np.arange(g)[None] < nv[:, None]).astype(np.float32)
    masks = (rng.random((n, g, size // 2, size // 2)) > 0.5
             ).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(boxes, jnp.float32),
            jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(masks))


def step_lr_array(base_lr: float, total_steps: int, epochs: int,
                  steps_per_epoch: int, warmup_iters: int = 500,
                  warmup_ratio: float = 1e-3):
    """mmdet 3x schedule: linear warmup then x0.1 at epochs 27 and 33
    (the lr_config step=[27, 33] of the 3x base config the reference
    inherits)."""
    it = np.arange(total_steps, dtype=np.float32)
    lr = np.full(total_steps, base_lr, np.float32)
    for e in (27, 33):
        lr = np.where(it >= e * steps_per_epoch, lr * 0.1, lr)
    warm = base_lr * (warmup_ratio + (1 - warmup_ratio)
                      * np.minimum(it / max(warmup_iters, 1), 1.0))
    return np.where(it < warmup_iters, warm, lr).astype(np.float32)


def main(args) -> Dict[str, Any]:
    from slak_tpu.downstream.configs import DET_CONFIGS
    from slak_tpu.downstream.detection import cascade_loss, init_cascade
    from slak_tpu.models.backbone import backbone_forward, init_backbone
    from slak_tpu.train.checkpoint import (latest_checkpoint, restore_pytree,
                                           save_pytree)
    from slak_tpu.train.optim import adamw_init, adamw_update, param_groups
    from slak_tpu.utils.logging import MetricLogger

    recipe = DET_CONFIGS[args.recipe]
    bcfg = _smoke_backbone() if args.smoke else recipe.backbone
    if args.remat:
        import dataclasses
        bcfg = dataclasses.replace(
            bcfg, model=dataclasses.replace(bcfg.model, remat=True))
    hcfg = _head_cfg(recipe, args.smoke)
    size = args.img_size
    total = args.steps or recipe.epochs * args.steps_per_epoch

    key = jax.random.PRNGKey(args.seed)
    kb, kh = jax.random.split(key)
    bparams, bstate = init_backbone(kb, bcfg)
    if args.backbone_ckpt:
        from slak_tpu.downstream.seg_main import _load_backbone_params
        bparams = _load_backbone_params(args.backbone_ckpt, bparams)
    hparams, hstate = init_cascade(kh, hcfg)
    params = {"backbone": bparams, "head": hparams}
    state = {"backbone": bstate, "head": hstate}

    # reference det config: layer-wise lr decay 0.7 (:135-141); the decay
    # buckets only apply to backbone params, heads get full lr (mmdet's
    # LearningRateDecayOptimizerConstructor puts non-backbone params in the
    # last = undecayed bucket)
    wd_mask_b, lr_scale_b = param_groups(bparams,
                                         layer_decay=recipe.layer_decay)
    wd_mask_h, lr_scale_h = param_groups(hparams, layer_decay=None)
    wd_mask = {"backbone": wd_mask_b, "head": wd_mask_h}
    lr_scale = {"backbone": lr_scale_b, "head": lr_scale_h}
    opt_state = adamw_init(params)
    lr_arr = jnp.asarray(step_lr_array(recipe.lr, total, recipe.epochs,
                                       args.steps_per_epoch))

    @jax.jit
    def train_step(params, state, opt_state, it, batch, rng):
        x, gb, gl, gv, gm = batch

        def loss_fn(p):
            feats, new_bstate = backbone_forward(
                p["backbone"], state["backbone"], x, bcfg,
                train=True, rng=jax.random.fold_in(rng, 0))
            tot, losses, new_hstate = cascade_loss(
                p["head"], state["head"], feats, gb, gl, gv, gm,
                (size, size), jax.random.fold_in(rng, 1), hcfg, train=True)
            return tot, (losses, {"backbone": new_bstate,
                                  "head": new_hstate})
        (tot, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        lr = lr_arr[jnp.minimum(it, total - 1)]
        params, opt_state, gnorm = adamw_update(
            grads, opt_state, params, lr, recipe.weight_decay,
            wd_mask, lr_scale)
        return params, new_state, opt_state, tot, losses, gnorm, lr

    start_it = 0
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        ck = latest_checkpoint(args.output_dir)
        if ck is not None:
            tree = restore_pytree(ck, {"params": params, "state": state,
                                       "opt_state": opt_state})
            params, state, opt_state = (tree["params"], tree["state"],
                                        tree["opt_state"])
            start_it = int(ck.rsplit("-", 1)[1])

    rng_np = np.random.default_rng(args.seed)

    if args.eval:
        # pycocotools CocoMetric counterpart (the reference's 48.4 box /
        # 41.8 mask AP table, /root/reference/README.md:200): fixed-shape
        # jitted cascade inference, host-side COCO matching/AP.
        from slak_tpu.downstream.detection import cascade_predict
        from slak_tpu.downstream.metrics import coco_ap

        @jax.jit
        def predict_step(params, state, x):
            feats, _ = backbone_forward(
                params["backbone"], state["backbone"], x, bcfg, train=False)
            return cascade_predict(params["head"], state["head"], feats,
                                   (size, size), hcfg,
                                   max_dets=args.max_dets)

        dets, gts = [], []
        for _ in range(args.eval_batches):
            x, gb, gl, gv, gm = _synthetic_det_batch(
                rng_np, args.batch_size, size, args.num_gts,
                hcfg.num_classes)
            boxes, scores, labels, masks = jax.device_get(
                predict_step(params, state, x))
            for i in range(x.shape[0]):
                dets.append({"boxes": boxes[i], "scores": scores[i],
                             "labels": labels[i], "masks": masks[i]})
                gts.append({"boxes": np.asarray(gb[i]),
                            "labels": np.asarray(gl[i]),
                            "valid": np.asarray(gv[i]),
                            "masks": np.asarray(gm[i])})
        box = coco_ap(dets, gts, hcfg.num_classes, "bbox")
        segm = coco_ap(dets, gts, hcfg.num_classes, "segm",
                       img_hw=(size, size))
        stats = {"bbox_AP": box["AP"], "bbox_AP50": box["AP50"],
                 "bbox_AP75": box["AP75"], "segm_AP": segm["AP"],
                 "segm_AP50": segm["AP50"]}
        print("eval: " + "  ".join(f"{k} {v * 100:.2f}"
                                   for k, v in stats.items()), flush=True)
        if args.output_dir:
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(stats) + "\n")
        return stats

    logger = MetricLogger(delimiter="  ")
    t0 = time.time()
    tot = jnp.zeros(())
    for it in range(start_it, total):
        batch = _synthetic_det_batch(rng_np, args.batch_size, size,
                                     args.num_gts, hcfg.num_classes)
        params, state, opt_state, tot, losses, gnorm, lr = train_step(
            params, state, opt_state, jnp.asarray(it), batch,
            jax.random.fold_in(key, it))
        if it % args.log_every == 0 or it == total - 1:
            logger.update(loss=float(tot), rpn_cls=float(losses["rpn_cls"]),
                          s0_cls=float(losses["s0_cls"]),
                          grad_norm=float(gnorm), lr=float(lr))
            print(f"iter {it}/{total}: {logger}", flush=True)
        if args.output_dir and ((it + 1) % args.save_every == 0
                                or it == total - 1):
            save_pytree(os.path.join(args.output_dir, f"checkpoint-{it + 1}"),
                        {"params": params, "state": state,
                         "opt_state": opt_state})
    stats = {"final_loss": float(tot), "iters": total,
             "time_sec": round(time.time() - t0, 1)}
    if args.output_dir:
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(stats) + "\n")
    return stats


if __name__ == "__main__":
    parser = argparse.ArgumentParser(parents=[get_det_args_parser()])
    main(parser.parse_args())
