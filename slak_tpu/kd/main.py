"""Distillation CLI — the rebuild of the reference's ``main_KD.py``
(flags ``main_KD.py:137-322``, driver ``:338-761``): teacher-to-student
distillation on ImageNet-style data with NKD / KD / FD / MGD losses.

Teacher zoo: any model in our registry (``SLaK_*`` / ``convnext_*`` — the
L2S headline path: large-kernel SLaK teacher -> small-kernel ConvNeXt
student) plus ``vit_*`` (``slak_tpu.models.vit``). Teachers load converted
torch checkpoints via ``--teacher_ckpt``.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from slak_tpu.train.main import evaluate, get_args_parser, str2bool


def get_kd_args_parser():
    p = argparse.ArgumentParser("SLaK-TPU knowledge distillation",
                                add_help=False, parents=[get_args_parser()],
                                conflict_handler="resolve")
    # teacher (reference: --model is the teacher, --model_s the student)
    p.add_argument("--model", default="SLaK_tiny", type=str,
                   help="teacher model name")
    p.add_argument("--model_s", default="convnext_tiny", type=str,
                   help="student model name")
    p.add_argument("--teacher_ckpt", default="", type=str,
                   help="torch .pth or orbax dir with teacher weights")
    p.add_argument("--teacher_kernel_size", default=[51, 49, 47, 13, 5],
                   type=int, nargs="*")
    p.add_argument("--teacher_width_factor", type=float, default=1.3)
    p.add_argument("--teacher_Decom", type=str2bool, default=True)
    # distillation (main_KD.py:150-190)
    p.add_argument("--distill_type", default="NKD", type=str,
                   choices=["None", "KD", "NKD", "FD", "FD+KD", "FD+NKD",
                            "MGD"])
    p.add_argument("--T", type=float, default=1.0, help="KD temperature")
    p.add_argument("--hard", type=str2bool, default=False)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--FDLoss_type", default="smoothL1",
                   choices=["smoothL1", "MSE"])
    p.add_argument("--lr_fd", type=float, default=1.0)
    return p


def main(args):
    from slak_tpu.data import (BatchLoader, EvalTransform, MixupConfig,
                               RandomErasingConfig, TrainTransform,
                               build_dataset, mixup_cutmix, random_erasing)
    from slak_tpu.data.loader import device_prefetch
    from slak_tpu.kd import (KDConfig, init_kd_params, kd_opt_init,
                             make_kd_train_step, make_teacher_apply)
    from slak_tpu.models import create_model
    from slak_tpu.parallel import make_mesh, replicate
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_eval_step)
    from slak_tpu.train import checkpoint as ckpt
    from slak_tpu.utils import load_torch_checkpoint
    from slak_tpu.utils.logging import EpochLogWriter, MetricLogger

    print(args)
    mesh = make_mesh(args.n_devices)
    n_dev = mesh.devices.size

    # teacher zoo dispatch (main_KD.py:413-509); --teacher_ckpt loads a
    # timm-pretrained torch state_dict via utils/convert_teachers.py
    from slak_tpu.utils.convert_teachers import load_teacher_checkpoint
    if args.model.startswith("vit") or args.model.startswith("deit"):
        from slak_tpu.models import vit as V
        teacher = getattr(V, args.model)(num_classes=args.nb_classes,
                                         img_size=args.input_size)
        tparams = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tparams = jax.tree_util.tree_map(
                jnp.asarray, load_teacher_checkpoint(args.teacher_ckpt,
                                                     args.model))
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = teacher.teacher_apply(tparams)
        teacher_channels = teacher.cfg.embed_dim
    elif args.model.startswith("swin"):
        from slak_tpu.models import swin as SW
        teacher = SW.swin_tiny_patch4_window7_224(
            num_classes=args.nb_classes, img_size=args.input_size)
        tparams = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tparams = jax.tree_util.tree_map(
                jnp.asarray, load_teacher_checkpoint(args.teacher_ckpt,
                                                     args.model))
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = teacher.teacher_apply(tparams)
        teacher_channels = teacher.cfg.embed_dim * 8
    elif args.model.startswith("cswin"):
        from slak_tpu.models import cswin as CW
        teacher = getattr(CW, args.model)(num_classes=args.nb_classes,
                                          img_size=args.input_size)
        tparams = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tparams = jax.tree_util.tree_map(
                jnp.asarray, load_teacher_checkpoint(args.teacher_ckpt,
                                                     args.model))
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = teacher.teacher_apply(tparams)
        teacher_channels = teacher.cfg.embed_dim * 8
    elif args.model.startswith("resnet"):
        from slak_tpu.models import resnet as RN
        teacher = getattr(RN, args.model)(num_classes=args.nb_classes)
        tp_, ts_ = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tp_, ts_ = load_teacher_checkpoint(args.teacher_ckpt, args.model)
            tp_ = jax.tree_util.tree_map(jnp.asarray, tp_)
            ts_ = jax.tree_util.tree_map(jnp.asarray, ts_)
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = teacher.teacher_apply(tp_, ts_)
        teacher_channels = teacher.cfg.width * 8 * teacher.cfg.expansion
    elif args.model.startswith(("mobilenet", "efficientnet",
                                "tf_efficientnet")):
        from slak_tpu.models import mobile as MB
        teacher = getattr(MB, args.model)(num_classes=args.nb_classes)
        tp_, ts_ = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tp_, ts_ = load_teacher_checkpoint(args.teacher_ckpt, args.model)
            tp_ = jax.tree_util.tree_map(jnp.asarray, tp_)
            ts_ = jax.tree_util.tree_map(jnp.asarray, ts_)
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = teacher.teacher_apply(tp_, ts_)
        teacher_channels = teacher.cfg.blocks[-1][1]
    else:
        teacher = create_model(
            args.model, kernel_size=tuple(args.teacher_kernel_size),
            width_factor=args.teacher_width_factor, decom=args.teacher_Decom,
            branch_bn=args.bn, num_classes=args.nb_classes)
        tparams, tstate = teacher.init(jax.random.PRNGKey(0))
        if args.teacher_ckpt:
            tp, ts = load_torch_checkpoint(args.teacher_ckpt)
            tparams = jax.tree_util.tree_map(jnp.asarray, tp)
            tstate = jax.tree_util.tree_map(jnp.asarray, ts)
            print(f"loaded teacher from {args.teacher_ckpt}")
        teacher_apply = make_teacher_apply(teacher, tparams, tstate)
        teacher_channels = teacher.cfg.widened_dims[-1]

    # student ------------------------------------------------------------
    # ConvNeXt student = kernel_size [7,7,7,7,100] (README.md:137)
    student = create_model(args.model_s, num_classes=args.nb_classes,
                           drop_path_rate=args.drop_path,
                           remat=args.remat)
    student_channels = student.cfg.widened_dims[-1]

    # data ----------------------------------------------------------------
    train_tf = TrainTransform(size=args.input_size, auto_augment=args.aa)
    eval_tf = EvalTransform(size=args.input_size, crop_pct=args.crop_pct)
    ds_train, nb_classes = build_dataset(
        True, args.data_set, args.data_path, train_tf, args.eval_data_path,
        args.nb_classes, synthetic_len=args.synthetic_len,
        synthetic_size=args.input_size)
    ds_val, _ = build_dataset(
        False, args.data_set, args.data_path, eval_tf, args.eval_data_path,
        args.nb_classes, synthetic_len=max(args.synthetic_len // 4, 8),
        synthetic_size=args.input_size)
    dl_train = BatchLoader(ds_train, args.batch_size * n_dev, shuffle=True,
                           num_workers=args.num_workers, seed=args.seed,
                           mode=args.loader_mode)
    dl_val = BatchLoader(ds_val, args.batch_size * n_dev, shuffle=False,
                         drop_last=False, num_workers=args.num_workers,
                         mode=args.loader_mode)
    niter_per_ep = len(dl_train)
    total_steps = args.epochs * niter_per_ep

    mask_cfg = None
    if args.sparse:
        mask_cfg = MaskConfig(
            sparsity=args.sparsity, sparse_init=args.sparse_init,
            prune_mode=args.prune, growth_mode=args.growth,
            prune_rate=args.prune_rate,
            update_frequency=args.update_frequency, fix=args.fix,
            only_L=args.only_L)
    train_cfg = TrainConfig(
        weight_decay=args.weight_decay, smoothing=args.smoothing,
        update_freq=args.update_freq, clip_grad=args.clip_grad,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        layer_decay=args.layer_decay if args.layer_decay < 1.0 else None,
        compute_dtype=jnp.bfloat16 if args.use_bf16 else jnp.float32,
        prune_t_max=total_steps)
    kd_cfg = KDConfig(distill_type=args.distill_type, temp=args.T,
                      hard=args.hard, alpha=args.alpha,
                      fd_loss_type=args.FDLoss_type, lr_fd=args.lr_fd)

    state = create_train_state(jax.random.PRNGKey(args.seed), student,
                               train_cfg, mask_cfg)
    kd_params = init_kd_params(jax.random.PRNGKey(args.seed + 1), kd_cfg,
                               student_channels, teacher_channels)
    kd_opt = kd_opt_init(kd_params)

    lr_sched = jnp.asarray(cosine_schedule_array(
        args.lr, args.min_lr, args.epochs, niter_per_ep,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps))
    step = jax.jit(make_kd_train_step(student, teacher_apply, kd_cfg,
                                      train_cfg, mask_cfg, lr_sched, None))
    eval_step = jax.jit(make_eval_step(
        student, jnp.bfloat16 if args.use_bf16 else jnp.float32))

    mixup_cfg = MixupConfig(
        mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
        switch_prob=args.mixup_switch_prob, mode=args.mixup_mode,
        label_smoothing=args.smoothing, num_classes=nb_classes)
    re_cfg = RandomErasingConfig(prob=args.reprob)

    @jax.jit
    def augment(k, x, y):
        k1, k2 = jax.random.split(k)
        if mixup_cfg.enabled:
            x, t = mixup_cutmix(k1, x, y, mixup_cfg)
        else:
            t = y
        return random_erasing(k2, x, re_cfg), t

    state = replicate(state, mesh)
    epoch_log = EpochLogWriter(args.output_dir)
    max_acc = 0.0
    for epoch in range(args.epochs):
        dl_train.set_epoch(epoch)
        logger = MetricLogger()
        t_ep, n_img = time.time(), 0
        for i, (x, y) in enumerate(device_prefetch(iter(dl_train), mesh)):
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                   epoch * niter_per_ep + i)
            xa, t = augment(k, x, y)
            state, kd_params, kd_opt, m = step(state, kd_params, kd_opt,
                                               (xa, t), k)
            n_img += x.shape[0]
            logger.update(loss=m["loss"], lr=m["lr"])
        ips = n_img / (time.time() - t_ep)
        test_stats = evaluate(eval_step, state.tree_params(),
                              state.model_state, dl_val, mesh)
        max_acc = max(max_acc, test_stats["acc1"])
        print(f"epoch {epoch}: loss={logger.meters['loss'].global_avg:.4f} "
              f"acc1={test_stats['acc1']*100:.2f}% ({ips:.0f} img/s)")
        if args.output_dir and args.save_ckpt:
            ckpt.save_checkpoint(args.output_dir, state, epoch,
                                 save_ckpt_freq=args.save_ckpt_freq,
                                 save_ckpt_num=args.save_ckpt_num)
        epoch_log.write({"epoch": epoch, "distill_type": args.distill_type,
                         "train_loss": logger.meters["loss"].global_avg,
                         "test_acc1": test_stats["acc1"],
                         "images_per_sec": ips})
    print(f"Max accuracy: {max_acc*100:.2f}%")
    return {"max_accuracy": max_acc}


def cli():
    """console_scripts entry (pyproject [project.scripts] slak-kd)."""
    parser = argparse.ArgumentParser("SLaK-TPU KD",
                                     parents=[get_kd_args_parser()])
    main(parser.parse_args())


if __name__ == "__main__":
    cli()
