"""Training CLI — the TPU-native rebuild of the reference's ``main.py``
(argparse surface ``main.py:53-224``, driver ``main.py:226-513``).

Usage (mirrors the reference's README commands):

  python -m slak_tpu.train.main --model SLaK_tiny --Decom true \\
      --kernel_size 51 49 47 13 5 --width_factor 1.3 -u 2000 \\
      --sparse --prune_rate 0.5 --sparsity 0.4 \\
      --batch_size 64 --lr 4e-3 --epochs 300 \\
      --data_path /path/to/imagenet --data_set IMNET

Differences from the reference, by design (SURVEY.md §7):
  * one process drives all local TPU chips via a data-parallel mesh (no
    torchrun / per-GPU processes); multi-host via ``jax.distributed``;
  * masks are checkpointed (``--sparse_init resume`` kept for torch import);
  * bf16 compute (``--use_bf16``) works *with* sparsity (the reference's AMP
    path silently disables DST, SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import datetime
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def str2bool(v):
    """Reference main.py:39-51 flag convention."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def get_args_parser():
    p = argparse.ArgumentParser("SLaK-TPU training and evaluation",
                                add_help=False)
    # engine
    p.add_argument("--batch_size", default=64, type=int,
                   help="per-device batch size")
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--update_freq", default=1, type=int,
                   help="gradient accumulation steps")
    p.add_argument("--use_bf16", type=str2bool, default=True)

    # model
    p.add_argument("--model", default="SLaK_tiny", type=str)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--layer_scale_init_value", default=1e-6, type=float)
    p.add_argument("--kernel_size", default=[51, 49, 47, 13, 5], type=int,
                   nargs="*", help="4 stage kernels + small kernel")
    p.add_argument("--width_factor", type=float, default=1.0)
    p.add_argument("--Decom", type=str2bool, default=False)
    p.add_argument("--bn", type=str2bool, default=True,
                   help="BN after each large-kernel branch")
    p.add_argument("--head_init_scale", default=1.0, type=float)

    # sparsity (main.py:207-221)
    p.add_argument("--sparse", action="store_true")
    p.add_argument("--sparsity", type=float, default=0.4)
    p.add_argument("--sparse_init", type=str, default="snip",
                   choices=["uniform", "ERK", "snip", "resume"])
    p.add_argument("--prune", type=str, default="magnitude")
    p.add_argument("--growth", type=str, default="random")
    p.add_argument("--redistribution", type=str, default="none")
    p.add_argument("--prune_rate", type=float, default=0.3)
    p.add_argument("-u", "--update_frequency", type=int, default=100,
                   metavar="N", help="prune/grow every N steps")
    p.add_argument("--fix", action="store_true",
                   help="static sparsity (no DST updates)")
    p.add_argument("--only_L", action="store_true",
                   help="sparsify only the LoRA branches")

    # EMA
    p.add_argument("--model_ema", type=str2bool, default=False)
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    p.add_argument("--model_ema_eval", type=str2bool, default=False)

    # optimizer
    p.add_argument("--opt", default="adamw", type=str,
                   choices=["adamw", "adan"],
                   help="optimizer (reference main.py:78; 'adan' is the "
                        "fork-registered Adaptive Nesterov optimizer)")
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=None, type=float, nargs="+",
                   help="override optimizer betas (2 for adamw, 3 for adan)")
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--weight_decay_end", type=float, default=None)
    p.add_argument("--lr", type=float, default=4e-3)
    p.add_argument("--layer_decay", type=float, default=1.0)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", type=int, default=20)
    p.add_argument("--warmup_steps", type=int, default=-1)

    # augmentation (main.py:117-160)
    p.add_argument("--color_jitter", type=float, default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--train_interpolation", type=str, default="bicubic",
                   choices=["bicubic", "bilinear", "random"])
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--remode", type=str, default="pixel",
                   choices=["pixel", "rand", "const"])
    p.add_argument("--recount", type=int, default=1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--cutmix_minmax", type=float, nargs="+", default=None,
                   help="cutmix min/max box-side fractions; overrides the "
                        "lam-derived box when set")
    p.add_argument("--mixup_prob", type=float, default=1.0)
    p.add_argument("--mixup_switch_prob", type=float, default=0.5)
    p.add_argument("--mixup_mode", type=str, default="batch",
                   choices=["batch", "pair", "elem"])
    p.add_argument("--crop_pct", type=float, default=0.875)

    # dataset
    p.add_argument("--data_path", default=None, type=str)
    p.add_argument("--eval_data_path", default=None, type=str)
    p.add_argument("--imagenet_default_mean_and_std", type=str2bool,
                   default=True,
                   help="False -> inception (0.5, 0.5, 0.5) normalization")
    p.add_argument("--nb_classes", default=1000, type=int)
    p.add_argument("--data_set", default="IMNET", type=str,
                   choices=["CIFAR", "IMNET", "image_folder", "synthetic"])
    p.add_argument("--num_workers", default=16, type=int)
    p.add_argument("--loader_mode", default="thread",
                   choices=["thread", "process"],
                   help="host input pipeline workers: GIL-releasing "
                        "thread pool, or torch-DataLoader-style spawned "
                        "processes + shared-memory batch slots")
    p.add_argument("--synthetic_len", default=1024, type=int,
                   help="synthetic dataset length (smoke/bench runs)")

    # checkpointing / misc
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--resume", default="", help="torch .pth or orbax dir")
    p.add_argument("--auto_resume", type=str2bool, default=True)
    p.add_argument("--save_ckpt", type=str2bool, default=True)
    p.add_argument("--save_ckpt_freq", default=1, type=int)
    p.add_argument("--save_ckpt_num", default=3, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--start_epoch", default=None, type=int,
                   help="override the resume-derived starting epoch")
    p.add_argument("--eval", type=str2bool, default=False)
    p.add_argument("--disable_eval", type=str2bool, default=False,
                   help="skip the per-epoch validation pass")
    p.add_argument("--verbose", action="store_true",
                   help="per-layer sparsity densities each epoch")
    p.add_argument("--tp_eval", type=str2bool, default=False,
                   help="channel/tensor-parallel eval over all devices "
                        "(parallel/tp.py); non-divisible widths (e.g. the "
                        "flagship 124/249/499/998) are zero-padded exactly")
    p.add_argument("--finetune", default="", help="torch ckpt to convert")
    p.add_argument("--model_key", default="model|module", type=str,
                   help="'|'-separated state-dict keys tried when "
                        "unwrapping --finetune checkpoints")
    p.add_argument("--model_prefix", default="", type=str,
                   help="prefix stripped from --finetune state-dict keys")
    p.add_argument("--enable_wandb", type=str2bool, default=False)
    p.add_argument("--project", default="SLaK", type=str,
                   help="wandb project name")
    p.add_argument("--wandb_ckpt", type=str2bool, default=False,
                   help="upload checkpoints as wandb artifacts at the end")
    p.add_argument("--n_devices", default=None, type=int)
    p.add_argument("--multi_host", type=str2bool, default=False)
    p.add_argument("--print_freq", default=200, type=int)
    p.add_argument("--remat", type=str2bool, default=False,
                   help="per-block activation rematerialization "
                        "(jax.checkpoint) in the train forward — trades "
                        "~one extra forward of FLOPs for the activation "
                        "HBM term (lets SLaK-B train at bs128 on a 16G "
                        "chip); no reference analog")
    p.add_argument("--profile_dir", default="", type=str,
                   help="capture a jax.profiler trace of training steps "
                        "into this directory (view with TensorBoard / "
                        "xprof); profiles steps 10..20 of the first epoch")
    return p


def build_model(args):
    from slak_tpu.models import create_model
    return create_model(
        args.model,
        kernel_size=tuple(args.kernel_size),
        width_factor=args.width_factor,
        decom=args.Decom,
        branch_bn=args.bn,
        num_classes=args.nb_classes,
        drop_path_rate=args.drop_path,
        layer_scale_init_value=args.layer_scale_init_value,
        head_init_scale=args.head_init_scale,
        remat=args.remat,
    )


def evaluate(eval_step, params, model_state, loader, mesh=None):
    """evaluate() equivalent incl. the reference's cross-process metric
    sync (``MetricLogger.synchronize_between_processes``, utils.py:43-54):
    weighted sums are all-reduced over hosts before normalizing."""
    from slak_tpu.data.loader import device_prefetch
    tot = {"loss": 0.0, "acc1": 0.0, "acc5": 0.0, "n": 0.0}
    for batch in device_prefetch(iter(loader), mesh):
        m = eval_step(params, model_state, batch)
        n = float(m["n"])
        for k in ("loss", "acc1", "acc5"):
            tot[k] += float(m[k]) * n
        tot["n"] += n
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        sums = multihost_utils.process_allgather(
            np.asarray([tot["loss"], tot["acc1"], tot["acc5"], tot["n"]]))
        s = np.sum(sums, axis=0)
        tot = {"loss": s[0], "acc1": s[1], "acc5": s[2], "n": s[3]}
    n = max(tot.pop("n"), 1.0)
    return {k: v / n for k, v in tot.items()}


def main(args):
    from slak_tpu.data import (BatchLoader, EvalTransform, MixupConfig,
                               RandomErasingConfig, TrainTransform,
                               build_dataset, mixup_cutmix, random_erasing)
    from slak_tpu.data.loader import device_prefetch
    from slak_tpu.models import slak as M
    from slak_tpu.parallel import make_mesh, replicate
    from slak_tpu.sparsity import MaskConfig, sparsity_report
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_eval_step,
                                make_train_step)
    from slak_tpu.train import checkpoint as ckpt
    from slak_tpu.utils import convert_state_dict, load_torch_checkpoint
    from slak_tpu.utils.logging import (EpochLogWriter, MetricLogger,
                                        SmoothedValue, TensorboardLogger)

    if args.multi_host:
        jax.distributed.initialize()
    print(args)
    print(f"devices: {jax.devices()}")

    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size
    global_batch = args.batch_size * n_dev * args.update_freq

    np.random.seed(args.seed)

    model = build_model(args)

    # data ---------------------------------------------------------------
    train_tf = TrainTransform(size=args.input_size, auto_augment=args.aa,
                              color_jitter_amount=args.color_jitter,
                              interpolation=args.train_interpolation,
                              imagenet_mean_and_std=
                              args.imagenet_default_mean_and_std)
    eval_tf = EvalTransform(size=args.input_size, crop_pct=args.crop_pct,
                            imagenet_mean_and_std=
                            args.imagenet_default_mean_and_std)
    ds_train, nb_classes = build_dataset(
        True, args.data_set, args.data_path, train_tf, args.eval_data_path,
        args.nb_classes, synthetic_len=args.synthetic_len,
        synthetic_size=args.input_size)
    ds_val, _ = build_dataset(
        False, args.data_set, args.data_path, eval_tf, args.eval_data_path,
        args.nb_classes, synthetic_len=max(args.synthetic_len // 4, 8),
        synthetic_size=args.input_size)
    rank = jax.process_index()
    world = jax.process_count()
    dl_train = BatchLoader(ds_train, args.batch_size * n_dev
                           * args.update_freq // world,
                           shuffle=True, num_workers=args.num_workers,
                           seed=args.seed, rank=rank, world_size=world,
                           mode=args.loader_mode)
    dl_val = BatchLoader(ds_val, args.batch_size * n_dev, shuffle=False,
                         drop_last=False, num_workers=args.num_workers,
                         mode=args.loader_mode)
    niter_per_ep = len(dl_train)
    total_steps = args.epochs * niter_per_ep
    print(f"{len(ds_train)} train / {len(ds_val)} val images, "
          f"{niter_per_ep} steps/epoch, global batch {global_batch}")
    if niter_per_ep == 0:
        raise ValueError(
            f"dataset ({len(ds_train)} images) is smaller than one global "
            f"batch ({global_batch} = batch_size x devices x update_freq); "
            f"reduce --batch_size / --update_freq or use --n_devices")

    # configs --------------------------------------------------------------
    mask_cfg = None
    if args.sparse:
        mask_cfg = MaskConfig(
            sparsity=args.sparsity, sparse_init=args.sparse_init,
            prune_mode=args.prune, growth_mode=args.growth,
            redistribution_mode=args.redistribution,
            prune_rate=args.prune_rate,
            update_frequency=args.update_frequency, fix=args.fix,
            only_L=args.only_L)
    train_cfg = TrainConfig(
        weight_decay=args.weight_decay, smoothing=args.smoothing,
        update_freq=args.update_freq, clip_grad=args.clip_grad,
        opt=args.opt, opt_eps=args.opt_eps,
        opt_betas=tuple(args.opt_betas) if args.opt_betas else None,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        layer_decay=args.layer_decay if args.layer_decay < 1.0 else None,
        compute_dtype=jnp.bfloat16 if args.use_bf16 else jnp.float32,
        prune_t_max=total_steps)

    # state ------------------------------------------------------------------
    rng = jax.random.PRNGKey(args.seed)
    snip_loss_fn = None
    if args.sparse and args.sparse_init == "snip":
        x0, y0 = next(iter(dl_train))
        x0j, y0j = jnp.asarray(x0), jnp.asarray(y0)

        def snip_loss_fn(p):
            _, mstate0 = model.init(jax.random.PRNGKey(0))
            logits, _ = model.apply(p, mstate0, x0j, train=False)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, y0j[:, None], axis=1))

    state = create_train_state(rng, model, train_cfg, mask_cfg, snip_loss_fn)

    if args.finetune:
        params, model_state = load_torch_checkpoint(
            args.finetune, model_key=args.model_key,
            model_prefix=args.model_prefix)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        model_state = jax.tree_util.tree_map(jnp.asarray, model_state)
        if state.plan is not None:
            from slak_tpu.train import packing
            params = packing.pack(params, state.plan)
        state = state.__class__(
            params=params, model_state=model_state, opt_state=state.opt_state,
            step=state.step, mask_state=state.mask_state,
            ema_params=state.ema_params, ema_model_state=state.ema_model_state,
            plan=state.plan, ms_plan=state.ms_plan)
        print(f"loaded torch checkpoint {args.finetune}")

    start_epoch = 0
    if args.output_dir and args.auto_resume and not args.resume:
        state, start_epoch = ckpt.auto_load(args.output_dir, state)
        if start_epoch:
            print(f"auto-resumed from epoch {start_epoch - 1}")
    elif args.resume:
        state = ckpt.restore_pytree(args.resume, state)
    if args.start_epoch is not None:
        start_epoch = args.start_epoch

    # schedules ---------------------------------------------------------------
    lr_sched = jnp.asarray(cosine_schedule_array(
        args.lr, args.min_lr, args.epochs, niter_per_ep,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps))
    wd_end = args.weight_decay_end if args.weight_decay_end is not None \
        else args.weight_decay
    wd_sched = jnp.asarray(cosine_schedule_array(
        args.weight_decay, wd_end, args.epochs, niter_per_ep))

    train_step = jax.jit(
        make_train_step(model, train_cfg, mask_cfg, lr_sched, wd_sched),
        donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, jnp.bfloat16 if args.use_bf16
                                       else jnp.float32))

    mixup_cfg = MixupConfig(
        mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
        cutmix_minmax=(tuple(args.cutmix_minmax)
                       if args.cutmix_minmax else None),
        prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
        mode=args.mixup_mode,
        label_smoothing=args.smoothing, num_classes=nb_classes)
    re_cfg = RandomErasingConfig(prob=args.reprob, count=args.recount,
                                 mode=args.remode)

    @jax.jit
    def augment(k, x, y):
        k1, k2 = jax.random.split(k)
        if mixup_cfg.enabled:
            x, t = mixup_cutmix(k1, x, y, mixup_cfg)
        else:
            t = y
        if re_cfg.prob > 0:
            x = random_erasing(k2, x, re_cfg)
        return x, t

    state = replicate(state, mesh)

    if args.eval:
        ev_mesh = mesh
        if args.tp_eval:
            # channel-sharded forward: batch replicated, channels split
            # over the mesh (parallel/tp.py) — the TP path of the rebuilt
            # framework (the reference has no model parallelism)
            from slak_tpu.parallel.tp import AXIS, make_tp_apply
            from slak_tpu.train import losses as L
            tp_fwd = make_tp_apply(model, make_mesh(args.n_devices,
                                        axis_name=AXIS))
            cdt = jnp.bfloat16 if args.use_bf16 else jnp.float32

            def eval_step(params, model_state, batch):  # noqa: F811
                images, labels = batch
                logits = tp_fwd(params, model_state, images.astype(cdt))
                return {"loss": L.cross_entropy(logits, labels),
                        "acc1": L.accuracy_topk(logits, labels, 1),
                        "acc5": L.accuracy_topk(logits, labels, 5),
                        "n": jnp.float32(labels.shape[0])}
            ev_mesh = None
        stats = evaluate(eval_step, state.tree_params(), state.model_state,
                         dl_val, ev_mesh)
        print(f"Accuracy of the network: top-1 {stats['acc1']*100:.2f}%, "
              f"top-5 {stats['acc5']*100:.2f}%")
        return stats

    # train loop ---------------------------------------------------------------
    log_writer = TensorboardLogger(args.log_dir) if args.log_dir else None
    wandb_logger = None
    if args.enable_wandb and jax.process_index() == 0:
        from slak_tpu.utils.logging import WandbLogger
        wandb_logger = WandbLogger(args, args.project)
        wandb_logger.set_steps()
    epoch_log = EpochLogWriter(args.output_dir)
    max_acc = max_acc_ema = 0.0
    print(f"Start training for {args.epochs} epochs")
    t_start = time.time()
    for epoch in range(start_epoch, args.epochs):
        dl_train.set_epoch(epoch)
        logger = MetricLogger()
        logger.add_meter("lr", SmoothedValue(1, "{value:.6f}"))
        t_ep = time.time()
        n_img = 0
        profiling = False
        for i, (x, y) in enumerate(logger.log_every(
                device_prefetch(iter(dl_train), mesh), args.print_freq,
                f"Epoch: [{epoch}]")):
            # jax.profiler trace window: steps [10, 20) of the first epoch
            # (past compile + warmup) -> xprof/TensorBoard-viewable dump
            if args.profile_dir and epoch == start_epoch:
                if i == 10:
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                elif i == 20 and profiling:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {args.profile_dir}")
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                   epoch * niter_per_ep + i)
            xa, t = augment(k, x, y)
            state, metrics = train_step(state, (xa, t), k)
            n_img += x.shape[0]
            logger.update(loss=metrics["loss"], lr=metrics["lr"],
                          grad_norm=metrics["grad_norm"])
            if log_writer and i % args.print_freq == 0:
                log_writer.update(head="train", step=int(state.step),
                                  loss=float(metrics["loss"]),
                                  lr=float(metrics["lr"]))
        if profiling:  # epoch shorter than the trace window
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
        ips = n_img / (time.time() - t_ep)
        print(f"epoch {epoch}: {ips:.1f} images/sec "
              f"({ips / n_dev:.1f}/chip)")

        if args.sparse and state.mask_state is not None:
            rep = sparsity_report(state.mask_state)
            print(f"sparsity: density={rep['density']:.4f} "
                  f"fired={rep['fired_ratio']:.4f}")
            if args.verbose:
                for name, dens in rep["layers"].items():
                    print(f"  {name}: density {dens:.4f}")

        save_dir = args.output_dir if (args.output_dir and args.save_ckpt
                                       and jax.process_index() == 0) else None
        if save_dir and ((epoch + 1) % args.save_ckpt_freq == 0
                         or epoch + 1 == args.epochs):
            ckpt.save_checkpoint(save_dir, state, epoch,
                                 save_ckpt_freq=args.save_ckpt_freq,
                                 save_ckpt_num=args.save_ckpt_num)

        stats = {"epoch": epoch,
                 "train_loss": logger.meters["loss"].global_avg,
                 "images_per_sec": ips}
        if not args.disable_eval:
            test_stats = evaluate(eval_step, state.tree_params(),
                                  state.model_state, dl_val, mesh)
            print(f"Accuracy on {len(ds_val)} val images: "
                  f"{test_stats['acc1']*100:.2f}%")
            if test_stats["acc1"] > max_acc:
                max_acc = test_stats["acc1"]
                if save_dir:
                    ckpt.save_checkpoint(save_dir, state, epoch, tag="best")
            print(f"Max accuracy: {max_acc*100:.2f}%")
            stats.update(test_acc1=test_stats["acc1"],
                         test_acc5=test_stats["acc5"],
                         test_loss=test_stats["loss"])

        if args.model_ema and args.model_ema_eval and not args.disable_eval:
            ema_stats = evaluate(eval_step, *state.tree_ema(), dl_val, mesh)
            print(f"EMA accuracy: {ema_stats['acc1']*100:.2f}%")
            if ema_stats["acc1"] > max_acc_ema:
                max_acc_ema = ema_stats["acc1"]
                if save_dir:
                    ckpt.save_checkpoint(save_dir, state, epoch,
                                         tag="best-ema")
            stats["test_acc1_ema"] = ema_stats["acc1"]

        if jax.process_index() == 0:
            epoch_log.write(stats)
            if wandb_logger is not None:
                wandb_logger.log_epoch_metrics(stats)

    if (wandb_logger is not None and args.wandb_ckpt and args.save_ckpt
            and args.output_dir):
        wandb_logger.log_checkpoints(args.output_dir)
    total = time.time() - t_start
    print(f"Training time {datetime.timedelta(seconds=int(total))}")
    return {"max_accuracy": max_acc}


def cli():
    """console_scripts entry (pyproject [project.scripts] slak-train)."""
    parser = argparse.ArgumentParser("SLaK-TPU", parents=[get_args_parser()])
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
