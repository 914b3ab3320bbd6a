"""Deployment tool: reparameterize a trained SLaK checkpoint (fold BNs,
merge branches into single convs — ``models/SLaK.py:102-122``, extended to
the decomposed rectangular branches which the reference never merges) and
save an inference-ready Orbax checkpoint.

Usage:
  python -m slak_tpu.utils.deploy --ckpt <orbax dir | torch .pth> \\
      --model SLaK_tiny --kernel_size 51 49 47 13 5 --width_factor 1.3 \\
      --Decom true --out <dir>
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    from slak_tpu.models import create_model
    from slak_tpu.train.checkpoint import restore_pytree, save_pytree
    from slak_tpu.train.main import str2bool
    from slak_tpu.utils import load_torch_checkpoint

    p = argparse.ArgumentParser("SLaK-TPU reparam/deploy")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="SLaK_tiny")
    p.add_argument("--kernel_size", default=[51, 49, 47, 13, 5], type=int,
                   nargs="*")
    p.add_argument("--width_factor", type=float, default=1.0)
    p.add_argument("--Decom", type=str2bool, default=True)
    p.add_argument("--bn", type=str2bool, default=True)
    p.add_argument("--nb_classes", type=int, default=1000)
    args = p.parse_args(argv)

    model = create_model(args.model, kernel_size=tuple(args.kernel_size),
                         width_factor=args.width_factor, decom=args.Decom,
                         branch_bn=args.bn, num_classes=args.nb_classes)
    if args.ckpt.endswith((".pth", ".pt")):
        params, state = load_torch_checkpoint(args.ckpt)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
    else:
        template = model.init(jax.random.PRNGKey(0))
        params, state = restore_pytree(args.ckpt, template)

    merged = model.merge(params, state)
    save_pytree(args.out, {"params": merged, "state": state})
    print(f"merged model saved to {args.out}")
    return merged


if __name__ == "__main__":
    main()
