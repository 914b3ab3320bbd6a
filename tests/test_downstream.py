"""Downstream segmentation tests: UperNet shapes/grads, seg loss with
ignore label, recipe config integrity, end-to-end backbone+head step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.downstream import (SEG_CONFIGS, SegRecipe, UperNetConfig,
                                 init_upernet, seg_loss, upernet_forward)
from slak_tpu.downstream.configs import poly_schedule
from slak_tpu.models import slak as M
from slak_tpu.models.backbone import (BackboneConfig, backbone_forward,
                                      init_backbone)


def _feats(rng, dims=(8, 16, 24, 32), h=32):
    return [jnp.asarray(rng.standard_normal(
        (2, h // (2 ** i), h // (2 ** i), c)).astype(np.float32))
        for i, c in enumerate(dims)]


def test_upernet_shapes(rng):
    cfg = UperNetConfig(in_channels=(8, 16, 24, 32), channels=16,
                        aux_channels=8, num_classes=21)
    params = init_upernet(jax.random.PRNGKey(0), cfg)
    feats = _feats(rng)
    logits, aux = upernet_forward(params, feats, cfg)
    assert logits.shape == (2, 32, 32, 21)
    assert aux.shape == (2, 32, 32, 21)


def test_seg_loss_ignore_label(rng):
    cfg = UperNetConfig(in_channels=(8, 16, 24, 32), channels=16,
                        aux_channels=8, num_classes=5)
    params = init_upernet(jax.random.PRNGKey(0), cfg)
    feats = _feats(rng)
    logits, aux = upernet_forward(params, feats, cfg)
    labels = jnp.asarray(rng.integers(0, 5, (2, 64, 64)))
    l1 = seg_loss(logits, aux, labels, cfg)
    assert np.isfinite(float(l1)) and float(l1) > 0
    # all-ignore labels -> zero-ish loss, no nans
    l2 = seg_loss(logits, aux, jnp.full((2, 64, 64), 255), cfg)
    assert np.isfinite(float(l2))


def test_seg_end_to_end_step(rng):
    """Backbone + UperNet, one jitted training step on 64x64 crops."""
    bcfg = BackboneConfig(
        model=M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                           kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                           conv_impl="xla"),
        out_indices=(0, 1, 2, 3))
    bparams, bstate = init_backbone(jax.random.PRNGKey(0), bcfg)
    hcfg = UperNetConfig(in_channels=(8, 16, 24, 32), channels=16,
                         aux_channels=8, num_classes=7)
    hparams = init_upernet(jax.random.PRNGKey(1), hcfg)

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 7, (2, 64, 64)))

    @jax.jit
    def step(bp, hp):
        def loss_fn(bp, hp):
            feats, _ = backbone_forward(bp, bstate, x, bcfg)
            lg, aux = upernet_forward(hp, feats, hcfg)
            return seg_loss(lg, aux, labels, hcfg)
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(bp, hp)
        bp = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g, bp, grads[0])
        hp = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g, hp, grads[1])
        return bp, hp, loss

    losses = []
    for _ in range(3):
        bparams, hparams, loss = step(bparams, hparams)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_seg_recipes_integrity():
    r = SEG_CONFIGS["upernet_slak_tiny_512_80k_ade20k"]
    assert r.head.in_channels == (124, 249, 499, 998)  # dims * 1.3
    assert r.backbone.model.widened_dims == (124, 249, 499, 998)
    assert r.max_iters == 80_000 and r.num_classes == 150
    sched = poly_schedule(r.lr, r.max_iters, r.warmup_iters, r.warmup_ratio)
    assert len(sched) == r.max_iters
    assert sched[0] == pytest.approx(r.lr * r.warmup_ratio, rel=1e-3)
    assert sched[r.warmup_iters] == pytest.approx(
        r.lr * (1 - r.warmup_iters / r.max_iters), rel=1e-2)
    assert sched[-1] < 1e-7
