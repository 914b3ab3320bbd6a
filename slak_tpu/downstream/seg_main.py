"""ADE20K semantic-segmentation training driver — the counterpart of
running the reference's UperNet configs under mmseg's ``tools/train.py``
(reference ``segmentation/README.md:28-46`` launches
``upernet_slak_tiny_512_80k_ade20k_ss.py`` via dist_train.sh; the optimizer
/ schedule / head constants those configs carry live in
:mod:`slak_tpu.downstream.configs`).

This driver proves the full wiring the reference gets from mmseg: recipe ->
SLaK backbone + UperNet/FCN-aux heads -> AdamW with norm/bias no-decay
groups -> poly LR with linear warmup -> jitted train step -> checkpoint /
resume. Real ADE20K data loads from an image/annotation folder pair;
``--data_set synthetic`` generates ADE-shaped random crops (images +
labels with ignore pixels) so the whole path runs end-to-end in CI and on
machines without the dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_seg_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("SLaK ADE20K segmentation", add_help=False)
    p.add_argument("--recipe", default="upernet_slak_tiny_512_80k_ade20k")
    p.add_argument("--data_set", default="synthetic",
                   choices=["synthetic", "ade_folder"])
    p.add_argument("--data_path", default="")
    p.add_argument("--max_iters", type=int, default=None,
                   help="override the recipe's schedule length")
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--smoke", action="store_true",
                   help="shrink backbone+head to CI scale (keeps the "
                        "optimizer/schedule/loss wiring identical)")
    p.add_argument("--backbone_ckpt", default="",
                   help="converted ImageNet-pretrained SLaK params (.npz "
                        "or orbax dir) to initialize the backbone")
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=4000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_bf16", default=False,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    p.add_argument("--remat", action="store_true",
                   help="per-block activation remat in the backbone "
                        "(jax.checkpoint) — trades FLOPs for HBM at "
                        "512^2 crops")
    p.add_argument("--eval", action="store_true",
                   help="evaluate mIoU/mAcc/aAcc (the metric the "
                        "reference's 47.6 mIoU table is denominated in) "
                        "instead of training; restores the latest "
                        "checkpoint from --output_dir if present")
    p.add_argument("--eval_batches", type=int, default=8,
                   help="synthetic eval batches (ade_folder evaluates "
                        "every image once, center-cropped)")
    return p


def _shrink_recipe(recipe):
    """CI-scale twin: tiny dims, small kernels, narrow head — same tree
    structure and same optimizer/schedule code paths."""
    import dataclasses

    from slak_tpu.downstream.segmentation import UperNetConfig
    from slak_tpu.models.backbone import BackboneConfig
    from slak_tpu.models.slak import SLaKConfig

    b = BackboneConfig(
        model=SLaKConfig(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                         kernel_size=(13, 11, 9, 7, 5), decom=True,
                         branch_bn=True, drop_path_rate=0.0,
                         layer_scale_init_value=1.0, conv_impl="xla"),
        out_indices=(0, 1, 2, 3), sparse=False)
    h = UperNetConfig(in_channels=(8, 16, 24, 32), channels=16,
                      aux_channels=8, num_classes=recipe.num_classes)
    return dataclasses.replace(recipe, backbone=b, head=h)


def _synthetic_seg_batch(rng: np.random.Generator, n: int, crop: int,
                         num_classes: int):
    x = rng.standard_normal((n, crop, crop, 3)).astype(np.float32)
    y = rng.integers(0, num_classes, (n, crop, crop)).astype(np.int32)
    # sprinkle ignore pixels, as real ADE labels have
    ign = rng.random((n, crop, crop)) < 0.05
    y = np.where(ign, 255, y)
    return jnp.asarray(x), jnp.asarray(y)


class _AdeFolder:
    """Minimal ADE20K-layout loader: ``{root}/images/*.jpg`` +
    ``{root}/annotations/*.png`` with matching stems (mmseg's
    ADE20KDataset folder convention). Random crops to ``crop``, labels
    shifted by -1 with 0 -> 255 ignore (the ADE convention mmseg applies
    via reduce_zero_label)."""

    def __init__(self, root: str, crop: int):
        import glob
        self.crop = crop
        self.imgs = sorted(glob.glob(os.path.join(root, "images", "*")))
        assert self.imgs, f"no images under {root}/images"
        self.anns = [os.path.join(root, "annotations",
                                  os.path.splitext(os.path.basename(p))[0]
                                  + ".png") for p in self.imgs]

    def _load(self, i: int):
        from PIL import Image
        img = np.asarray(Image.open(self.imgs[i]).convert("RGB"))
        ann = np.asarray(Image.open(self.anns[i]))
        h, w = img.shape[:2]
        c = self.crop
        if h < c or w < c:
            ph, pw = max(0, c - h), max(0, c - w)
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            ann = np.pad(ann, ((0, ph), (0, pw)), constant_values=0)
        return img, ann

    @staticmethod
    def _normalize(img, ann, y0: int, x0: int, c: int):
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (img[y0:y0 + c, x0:x0 + c] / 255.0 - mean) / std
        lab = ann[y0:y0 + c, x0:x0 + c].astype(np.int32) - 1
        return x, np.where(lab < 0, 255, lab)

    def batch(self, rng: np.random.Generator, n: int):
        xs, ys = [], []
        c = self.crop
        for i in rng.integers(0, len(self.imgs), n):
            img, ann = self._load(int(i))
            h, w = img.shape[:2]
            y0 = int(rng.integers(0, h - c + 1))
            x0 = int(rng.integers(0, w - c + 1))
            x, y = self._normalize(img, ann, y0, x0, c)
            xs.append(x)
            ys.append(y)
        return (jnp.asarray(np.stack(xs), jnp.float32),
                jnp.asarray(np.stack(ys), jnp.int32))

    def eval_iter(self):
        """Deterministic pass: every image once, center-cropped (batch 1)."""
        c = self.crop
        for i in range(len(self.imgs)):
            img, ann = self._load(i)
            h, w = img.shape[:2]
            x, y = self._normalize(img, ann, (h - c) // 2, (w - c) // 2, c)
            yield (jnp.asarray(x[None], jnp.float32),
                   jnp.asarray(y[None], jnp.int32))


def _load_backbone_params(path: str, params):
    from slak_tpu.train.checkpoint import restore_pytree
    if path.endswith(".npz"):
        import numpy as _np
        flat = dict(_np.load(path))
        leaves, treedef = jax.tree_util.tree_flatten(params)
        assert len(flat) == len(leaves), "npz/param count mismatch"
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(flat[f"p{i}"]) for i in range(len(leaves))])
    return restore_pytree(path, params)


def main(args) -> Dict[str, Any]:
    from slak_tpu.downstream.configs import SEG_CONFIGS, poly_schedule
    from slak_tpu.downstream.segmentation import (_resize, init_upernet,
                                                  seg_loss, upernet_forward)
    from slak_tpu.models.backbone import backbone_forward, init_backbone
    from slak_tpu.train.checkpoint import (latest_checkpoint, restore_pytree,
                                           save_pytree)
    from slak_tpu.train.optim import adamw_init, adamw_update, param_groups
    from slak_tpu.utils.logging import MetricLogger

    recipe = SEG_CONFIGS[args.recipe]
    if args.smoke:
        recipe = _shrink_recipe(recipe)
    bcfg, hcfg = recipe.backbone, recipe.head
    if args.remat:
        import dataclasses
        bcfg = dataclasses.replace(
            bcfg, model=dataclasses.replace(bcfg.model, remat=True))
    crop = args.crop_size or recipe.crop_size
    batch = args.batch_size or recipe.batch_size
    max_iters = args.max_iters or recipe.max_iters

    key = jax.random.PRNGKey(args.seed)
    kb, kh = jax.random.split(key)
    bparams, bstate = init_backbone(kb, bcfg)
    if args.backbone_ckpt:
        bparams = _load_backbone_params(args.backbone_ckpt, bparams)
    hparams = init_upernet(kh, hcfg)
    params = {"backbone": bparams, "head": hparams}
    # mmseg convention: norms (ndim<=1) and biases get no weight decay
    wd_mask, lr_scale = param_groups(params, layer_decay=None)
    opt_state = adamw_init(params)
    lr_arr = jnp.asarray(poly_schedule(
        recipe.lr, max_iters, recipe.warmup_iters, recipe.warmup_ratio,
        recipe.poly_power, recipe.min_lr))

    @jax.jit
    def train_step(params, bstate, opt_state, it, x, y, rng):
        def loss_fn(p):
            dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
            feats, new_bstate = backbone_forward(
                p["backbone"], bstate, x.astype(dtype), bcfg,
                train=True, rng=jax.random.fold_in(rng, 0))
            lg, aux = upernet_forward(p["head"], feats, hcfg, train=True,
                                      rng=jax.random.fold_in(rng, 1))
            return seg_loss(lg, aux, y, hcfg), new_bstate
        (loss, new_bstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        lr = lr_arr[jnp.minimum(it, max_iters - 1)]
        params, opt_state, gnorm = adamw_update(
            grads, opt_state, params, lr, recipe.weight_decay,
            wd_mask, lr_scale)
        return params, new_bstate, opt_state, loss, gnorm, lr

    start_it = 0
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        ck = latest_checkpoint(args.output_dir)
        if ck is not None:
            tree = restore_pytree(
                ck, {"params": params, "bstate": bstate,
                     "opt_state": opt_state})
            params, bstate, opt_state = (tree["params"], tree["bstate"],
                                         tree["opt_state"])
            start_it = int(ck.rsplit("-", 1)[1])

    rng_np = np.random.default_rng(args.seed)
    folder = (_AdeFolder(args.data_path, crop)
              if args.data_set == "ade_folder" else None)

    if args.eval:
        # mmseg IoUMetric counterpart (the reference's mIoU table,
        # /root/reference/README.md:188-193): jitted fixed-shape
        # confusion-matrix accumulation, host-side reductions.
        from slak_tpu.downstream.metrics import confusion_matrix, seg_scores

        @jax.jit
        def eval_step(params, bstate, cm, x, y):
            dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
            feats, _ = backbone_forward(params["backbone"], bstate,
                                        x.astype(dtype), bcfg, train=False)
            lg, _ = upernet_forward(params["head"], feats, hcfg, train=False)
            lg = _resize(lg, y.shape[1], y.shape[2]).astype(jnp.float32)
            return cm + confusion_matrix(jnp.argmax(lg, -1), y,
                                         hcfg.num_classes)

        cm = jnp.zeros((hcfg.num_classes, hcfg.num_classes), jnp.int32)
        if folder is not None:
            for x, y in folder.eval_iter():
                cm = eval_step(params, bstate, cm, x, y)
        else:
            for _ in range(args.eval_batches):
                x, y = _synthetic_seg_batch(rng_np, batch, crop,
                                            hcfg.num_classes)
                cm = eval_step(params, bstate, cm, x, y)
        s = seg_scores(np.asarray(cm))
        stats = {"mIoU": s["mIoU"], "mAcc": s["mAcc"], "aAcc": s["aAcc"]}
        print("eval: " + "  ".join(f"{k} {v * 100:.2f}"
                                   for k, v in stats.items()), flush=True)
        if args.output_dir:
            with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
                f.write(json.dumps(stats) + "\n")
        return stats

    logger = MetricLogger(delimiter="  ")
    t0 = time.time()
    loss = jnp.zeros(())
    for it in range(start_it, max_iters):
        if folder is not None:
            x, y = folder.batch(rng_np, batch)
        else:
            x, y = _synthetic_seg_batch(rng_np, batch, crop,
                                        hcfg.num_classes)
        params, bstate, opt_state, loss, gnorm, lr = train_step(
            params, bstate, opt_state, jnp.asarray(it), x, y,
            jax.random.fold_in(key, it))
        if it % args.log_every == 0 or it == max_iters - 1:
            logger.update(loss=float(loss), grad_norm=float(gnorm),
                          lr=float(lr))
            print(f"iter {it}/{max_iters}: {logger}", flush=True)
        if args.output_dir and ((it + 1) % args.save_every == 0
                                or it == max_iters - 1):
            save_pytree(os.path.join(args.output_dir, f"checkpoint-{it + 1}"),
                        {"params": params, "bstate": bstate,
                         "opt_state": opt_state})
    stats = {"final_loss": float(loss), "iters": max_iters,
             "time_sec": round(time.time() - t0, 1)}
    if args.output_dir:
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(stats) + "\n")
    return stats


if __name__ == "__main__":
    parser = argparse.ArgumentParser(parents=[get_seg_args_parser()])
    main(parser.parse_args())
