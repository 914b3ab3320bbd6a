"""One-command acceptance eval: released SLaK torch checkpoint -> convert ->
ImageNet val top-1.

The north-star number is the released SLaK-T checkpoint's 82.5% ImageNet
top-1 (reference README.md:45, the 51x51 width-1.3 sparse model). With the
dataset and checkpoint on disk:

    python tools/eval_released.py \
        --ckpt /path/to/SLaK_tiny_checkpoint.pth \
        --data_path /path/to/imagenet --data_set IMNET \
        --model SLaK_tiny --kernel_size 51 49 47 13 5 --width_factor 1.3

Expected: acc1 ~= 0.825. Logit parity of the conversion is already
guaranteed by tests/test_convert.py (torch-twin end-to-end); this script is
the real-data acceptance run the moment data + ckpt are available, and it
is CI-tested end-to-end on an image_folder of synthetic JPEGs
(tests/test_downstream_cli.py::test_eval_released_synthetic_folder).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("eval a released/converted SLaK checkpoint",
                                add_help=False)
    p.add_argument("--ckpt", required=True,
                   help="reference checkpoint-*.pth (torch) or an orbax "
                        "(params, state) dir written by our trainer")
    p.add_argument("--use_ema", action="store_true",
                   help="prefer the EMA weights inside the torch ckpt")
    p.add_argument("--model", default="SLaK_tiny")
    p.add_argument("--kernel_size", type=int, nargs="+",
                   default=[51, 49, 47, 13, 5])
    p.add_argument("--width_factor", type=float, default=1.3)
    p.add_argument("--Decom", default=True,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    p.add_argument("--bn", default=True,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    p.add_argument("--data_path", required=True)
    p.add_argument("--data_set", default="IMNET",
                   choices=["IMNET", "image_folder", "CIFAR"])
    p.add_argument("--nb_classes", type=int, default=1000)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--crop_pct", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--use_bf16", default=True,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    return p


def main(args) -> dict:
    from slak_tpu.data.datasets import build_dataset
    from slak_tpu.data.loader import BatchLoader
    from slak_tpu.data.transforms import DEFAULT_CROP_PCT, EvalTransform
    from slak_tpu.models import create_model
    from slak_tpu.train.engine import make_eval_step
    from slak_tpu.train.main import evaluate

    model = create_model(args.model, kernel_size=tuple(args.kernel_size),
                         decom=args.Decom, branch_bn=args.bn,
                         width_factor=args.width_factor,
                         num_classes=args.nb_classes)

    if args.ckpt.endswith((".pth", ".pt")):
        from slak_tpu.utils.convert import load_torch_checkpoint
        params, state = load_torch_checkpoint(args.ckpt,
                                              prefer_ema=args.use_ema)
    else:
        from slak_tpu.train.checkpoint import restore_pytree
        target_p, target_s = model.init(jax.random.PRNGKey(0))
        tree = restore_pytree(args.ckpt, {"params": target_p,
                                          "state": target_s})
        params, state = tree["params"], tree["state"]

    # eval >= 384: warp-resize, no crop (reference main.py:104 + datasets)
    crop_pct = args.crop_pct
    if crop_pct is None:
        crop_pct = 1.0 if args.input_size >= 384 else DEFAULT_CROP_PCT
    ds, nb = build_dataset(False, args.data_set, args.data_path,
                           transform=EvalTransform(args.input_size, crop_pct),
                           nb_classes=args.nb_classes)
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                         num_workers=args.num_workers)

    dtype = jnp.bfloat16 if args.use_bf16 else jnp.float32
    if args.use_bf16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    eval_step = jax.jit(make_eval_step(model, compute_dtype=dtype))
    stats = evaluate(eval_step, params, state, loader)
    print(json.dumps({"acc1": round(stats["acc1"], 5),
                      "acc5": round(stats["acc5"], 5),
                      "loss": round(stats["loss"], 5),
                      "n_images": len(ds)}))
    return stats


if __name__ == "__main__":
    parser = argparse.ArgumentParser(parents=[get_parser()])
    main(parser.parse_args())
