"""Sparsity-aware FLOPs counter — rebuild of ``FLOPs_counter.py:29-141``.

The reference counts multiply-adds via forward hooks, scaling conv/linear
costs by the *nonzero* weight fraction (``(weight != 0).sum()``,
``FLOPs_counter.py:46-59``) so sparse models report their effective FLOPs.
We walk the param tree directly (no hooks needed — shapes are static) and
apply the same nonzero scaling. Reported in multiply-adds like the
reference (its "FLOPs" are MACs: README tables say SLaK-T = 5.0G).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slak_tpu.models.slak import SLaKConfig


def _nnz_frac(w) -> float:
    return float(jnp.mean((w != 0).astype(jnp.float32)))


def count_model_flops(params, cfg: SLaKConfig, input_size: int = 224,
                      multiply_adds: bool = True) -> dict:
    """Walk the SLaK tree and count per-component MACs at ``input_size``.

    Conv cost = H_out*W_out * kh*kw*Cin/groups * Cout * nnz_frac;
    linear cost = N_positions * Cin*Cout * nnz_frac (FLOPs_counter.py:46-75).
    """
    dims = cfg.widened_dims
    total = 0.0
    per_layer = {}
    hw = input_size // 4  # after stem

    def conv_cost(h, w, kh, kw, cin, cout, weight, groups=1):
        return h * w * (kh * kw * (cin // groups)) * cout * _nnz_frac(weight)

    # stem
    c = conv_cost(hw, hw, 4, 4, cfg.in_chans, dims[0],
                  params["downsample"][0]["conv"]["w"])
    per_layer["stem"] = c
    total += c

    for i in range(4):
        if i > 0:
            hw //= 2
            c = conv_cost(hw, hw, 2, 2, dims[i - 1], dims[i],
                          params["downsample"][i]["conv"]["w"])
            per_layer[f"downsample{i}"] = c
            total += c
        stage = 0.0
        for j, bp in enumerate(params["stages"][i]):
            lk = bp["lk"]
            for name, branch in lk.items():
                w = branch["w"]
                kh, kw = w.shape[0], w.shape[1]
                stage += conv_cost(hw, hw, kh, kw, dims[i], dims[i], w,
                                   groups=dims[i])
            n_pos = hw * hw
            stage += n_pos * dims[i] * 4 * dims[i] \
                * _nnz_frac(bp["pwconv1"]["w"])
            stage += n_pos * 4 * dims[i] * dims[i] \
                * _nnz_frac(bp["pwconv2"]["w"])
        per_layer[f"stage{i}"] = stage
        total += stage

    head = dims[-1] * params["head"]["w"].shape[-1] \
        * _nnz_frac(params["head"]["w"])
    per_layer["head"] = head
    total += head

    if not multiply_adds:
        total *= 2
        per_layer = {k: v * 2 for k, v in per_layer.items()}
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    nnz_params = sum(int(jnp.sum(p != 0))
                     for p in jax.tree_util.tree_leaves(params))
    return {"total": total, "per_layer": per_layer, "params": n_params,
            "nonzero_params": nnz_params}
