"""ERF visualization CLI — the rebuild of ``erf/visualize_erf.py`` (compute
the contribution matrix over val images at 1024²) and ``erf/analyze_erf.py``
(heatmap + high-contribution area ratios).

Usage:
  python -m slak_tpu.analysis.visualize_erf --model SLaK_tiny \\
      --kernel_size 51 49 47 13 5 --width_factor 1.3 --Decom true \\
      --weights ckpt.pth --data_path /imagenet --num_images 50 \\
      --save erf.npy --heatmap erf.png
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def heatmap(data: np.ndarray, save_path: str) -> None:
    """analyze_erf.py:33-51 equivalent (matplotlib only, no seaborn dep)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    im = ax.imshow(data, cmap="RdYlGn", vmin=0, vmax=1)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def main(argv=None):
    from slak_tpu.analysis.erf import analyze_erf, erf_contribution
    from slak_tpu.data import EvalTransform, ImageFolderDataset
    from slak_tpu.models import create_model
    from slak_tpu.train.main import str2bool
    from slak_tpu.utils import load_torch_checkpoint

    p = argparse.ArgumentParser("SLaK-TPU ERF visualization")
    p.add_argument("--model", default="SLaK_tiny")
    p.add_argument("--kernel_size", default=[51, 49, 47, 13, 5], type=int,
                   nargs="*")
    p.add_argument("--width_factor", type=float, default=1.0)
    p.add_argument("--Decom", type=str2bool, default=True)
    p.add_argument("--weights", default=None,
                   help="torch .pth to convert (random init if omitted)")
    p.add_argument("--data_path", default=None)
    p.add_argument("--num_images", type=int, default=50)
    p.add_argument("--input_size", type=int, default=1024)
    p.add_argument("--save", default="erf.npy")
    p.add_argument("--heatmap", default=None)
    args = p.parse_args(argv)

    model = create_model(args.model, kernel_size=tuple(args.kernel_size),
                         width_factor=args.width_factor, decom=args.Decom)
    if args.weights:
        params, state = load_torch_checkpoint(args.weights)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = jax.tree_util.tree_map(jnp.asarray, state)
    else:
        params, state = model.init(jax.random.PRNGKey(0))

    def feature_fn(x):
        feats, _ = model.forward_features(params, state, x,
                                          return_stages=True)
        return feats[-1]

    # 1024x1024 warp-resized val images, batch 1 (visualize_erf.py:60-74)
    if args.data_path:
        import os
        ds = ImageFolderDataset(os.path.join(args.data_path, "val"),
                                EvalTransform(size=args.input_size))
        batches = (jnp.asarray(ds[i][0])[None]
                   for i in range(min(args.num_images, len(ds))))
    else:
        rng = np.random.default_rng(0)
        batches = (jnp.asarray(rng.standard_normal(
            (1, args.input_size, args.input_size, 3)).astype(np.float32))
            for _ in range(min(args.num_images, 4)))

    data = erf_contribution(feature_fn, batches)
    np.save(args.save, data)
    print(f"contribution matrix saved to {args.save}")

    res = analyze_erf(data + 1e-9)
    for t, r in res["ratios"].items():
        print(f"thresh {t}: side {r['side'] if r else None}, "
              f"area ratio {r['area_ratio'] if r else None}")
    if args.heatmap:
        heatmap(res["normalized"], args.heatmap)
        print(f"heatmap saved to {args.heatmap}")


def compare_panels(sources, titles, save_path):
    """Multi-panel ERF comparison figure — the equivalent of the
    reference's ``erf/erf_slak51_convnext7_convnext31.py`` 3-panel plot.

    ``sources``: paths to .npy contribution matrices (from ``main``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from slak_tpu.analysis.erf import analyze_erf

    n = len(sources)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 6))
    if n == 1:
        axes = [axes]
    for ax, src, title in zip(axes, sources, titles):
        data = analyze_erf(np.load(src) + 1e-9)["normalized"]
        im = ax.imshow(data, cmap="RdYlGn", vmin=0, vmax=1)
        ax.set_title(title, fontsize=16)
        ax.set_xticks([])
        ax.set_yticks([])
    fig.colorbar(im, ax=axes, fraction=0.02, pad=0.02)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    print(f"comparison figure saved to {save_path}")


if __name__ == "__main__":
    main()
