"""Analysis + backbone tests: ERF map properties (large kernels -> wider
high-contribution area), sparse-aware FLOPs counts, multi-scale backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.analysis import (analyze_erf, count_model_flops,
                               erf_contribution, get_input_grad,
                               get_rectangle)
from slak_tpu.models import slak as M
from slak_tpu.models.backbone import (BackboneConfig, backbone_forward,
                                      derive_masks, init_backbone)


def _feature_fn(model, params, state):
    def fn(x):
        feats, _ = model.forward_features(params, state, x,
                                          return_stages=True)
        return feats[-1]
    return fn


def test_erf_map_properties(rng):
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                       conv_impl="xla")
    model = M.SLaK(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    m = get_input_grad(_feature_fn(model, params, state), x)
    assert m.shape == (64, 64)
    assert np.all(m >= 0)  # ReLU'd grads
    assert m.sum() > 0
    # center pixel should contribute more than the corner
    assert m[32, 32] > m[0, 0]

    res = analyze_erf(m + 1e-9)
    assert res["normalized"].max() == pytest.approx(1.0)
    r = res["ratios"][0.2]
    assert r is not None and r["side"] % 2 == 1


def test_erf_larger_kernel_wider(rng):
    """SLaK's thesis: larger kernels -> larger ERF. Check our pipeline sees it."""
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    sides = {}
    for k in ((7, 7, 7, 7, 100), (31, 29, 27, 13, 5)):
        cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                           kernel_size=k, decom=(k[0] != 7),
                           branch_bn=(k[0] != 7), num_classes=10,
                           conv_impl="xla")
        model = M.SLaK(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        m = erf_contribution(_feature_fn(model, params, state), [x])
        r = analyze_erf(m + 1e-9)["ratios"][0.3]
        sides[k[0]] = r["side"] if r else 64
    assert sides[31] >= sides[7]


def test_flops_counter_sparsity_aware():
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(13, 11, 9, 7, 5), num_classes=10)
    params, _ = M.init(jax.random.PRNGKey(0), cfg)
    dense = count_model_flops(params, cfg, input_size=64)
    assert dense["total"] > 0
    # fresh init: only zero-init'd biases/eps params are zero
    assert dense["nonzero_params"] > 0.9 * dense["params"]

    # zero half of one pwconv: FLOPs must drop accordingly
    w = params["stages"][3][0]["pwconv1"]["w"]
    half = w.at[: w.shape[0] // 2].set(0.0)
    params["stages"][3][0]["pwconv1"]["w"] = half
    sparse = count_model_flops(params, cfg, input_size=64)
    assert sparse["total"] < dense["total"]
    assert sparse["nonzero_params"] < sparse["params"]


def test_backbone_multiscale_and_sparse(rng):
    cfg = BackboneConfig(
        model=M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                           kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                           conv_impl="xla"),
        out_indices=(0, 1, 2, 3), sparse=True)
    params, state = init_backbone(jax.random.PRNGKey(0), cfg)
    # simulate a sparse ckpt
    sel_mask = {n: (rng.random(w.shape) < 0.6).astype(np.float32)
                for n, w in
                __import__("slak_tpu.sparsity.masking",
                           fromlist=["select_maskable"])
                .select_maskable(params).items()}
    from slak_tpu.sparsity.masking import apply_mask_to_tree
    params = apply_mask_to_tree(
        params, {n: jnp.asarray(m) for n, m in sel_mask.items()})
    masks = derive_masks(params)
    assert len(masks) > 0

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    outs, _ = backbone_forward(params, state, x, cfg, masks=masks)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 8)
    assert outs[3].shape == (1, 2, 2, 32)

    # out_indices subset
    cfg2 = BackboneConfig(model=cfg.model, out_indices=(1, 3))
    params2, state2 = init_backbone(jax.random.PRNGKey(0), cfg2)
    outs2, _ = backbone_forward(params2, state2, x, cfg2)
    assert len(outs2) == 2 and outs2[1].shape == (1, 2, 2, 32)
