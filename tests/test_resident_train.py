"""C-major resident TRAIN stage (round 5): the layout-resident training
path (models/slak.py _block_forward_resident_train + the C-major custom
VJP pallas_banded.dwconv_banded_stats_cmajor_vjp) must match the NHWC
per-branch path — forward logits, BN state updates, and parameter grads —
because it is the same math with the layout glue deleted.

Reference bar: the reference's hot loop is fwd+bwd over these branches
(engine.py:17-140, models/SLaK.py:126-166); training perf work must not
change training semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.models import slak as M
from slak_tpu.ops.pallas_banded import (depthwise_conv2d_banded_stats,
                                        dwconv_banded_stats_cmajor_vjp)


def tiny_cfg(**kw):
    # train_layout='cmajor' forces every stage resident so the tests
    # cover all resident routes regardless of the measured 'auto' table
    # (TRAIN_RESIDENT_STAGES routes only stage 3 resident on TPU).
    base = dict(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                kernel_size=(31, 31, 31, 7, 5), decom=True, branch_bn=True,
                num_classes=10, conv_impl="banded", pallas_interpret=True,
                train_layout="cmajor")
    base.update(kw)
    return M.SLaKConfig(**base)


@pytest.mark.parametrize("kh,kw,hw", [(31, 5, 16), (5, 31, 16), (7, 5, 8)])
def test_cmajor_vjp_matches_nhwc_stats_conv(rng, kh, kw, hw):
    """Op level: the C-major custom VJP == the NHWC stats conv on
    transposed views — y, BN sums, dx, dw (1-D long-axis, 1-D transposed
    caller orientation, and the 2-D tiny-map route)."""
    n, c = 2, 3
    x = jnp.asarray(rng.standard_normal((n, hw, hw, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)

    def f_nhwc(x, w):
        y, s1, s2 = depthwise_conv2d_banded_stats(x, w, True)
        return jnp.sum(y * jnp.sin(y)) + jnp.sum(s1 * s2), (y, s1, s2)

    def f_cm(x, w):
        xc = jnp.transpose(x, (3, 1, 2, 0))
        if kw > kh and hw * hw > 128:
            xq = jnp.transpose(xc, (0, 2, 1, 3))
            yq, s1, s2 = dwconv_banded_stats_cmajor_vjp(
                xq, jnp.transpose(w, (1, 0, 2)), True)
            yc = jnp.transpose(yq, (0, 2, 1, 3))
        else:
            yc, s1, s2 = dwconv_banded_stats_cmajor_vjp(xc, w, True)
        y = jnp.transpose(yc, (3, 1, 2, 0))
        return jnp.sum(y * jnp.sin(y)) + jnp.sum(s1 * s2), (y, s1, s2)

    (ln, auxn), gn = jax.value_and_grad(f_nhwc, (0, 1), has_aux=True)(x, w)
    (lc, auxc), gc = jax.value_and_grad(f_cm, (0, 1), has_aux=True)(x, w)
    np.testing.assert_allclose(float(lc), float(ln), rtol=1e-5)
    for a, b in zip(auxc, auxn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(gc, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_resident_train_gate():
    cfg = tiny_cfg()
    params, _ = M.init(jax.random.PRNGKey(0), cfg)
    x16 = jnp.zeros((2, 16, 16, 8), jnp.float32)   # stage-1 map (1-D route)
    x2 = jnp.zeros((2, 2, 2, 32), jnp.float32)     # stage-4 map (2-D route)
    assert M._stage_resident_train_ok(cfg, params["stages"][0], x16, 0)
    assert M._stage_resident_train_ok(cfg, params["stages"][3], x2, 3)
    # explicit NHWC opt-out
    cfg_n = dataclasses.replace(cfg, train_layout="nhwc")
    assert not M._stage_resident_train_ok(cfg_n, params["stages"][0], x16, 0)
    # 'auto' consults the measured per-stage table
    cfg_a = dataclasses.replace(cfg, train_layout="auto")
    for i, on in enumerate(M.TRAIN_RESIDENT_STAGES[:3]):
        assert M._stage_resident_train_ok(
            cfg_a, params["stages"][0], x16, i) == on
    # a bn-less branch set cannot ride the stats-fused path
    cfg_b = tiny_cfg(branch_bn=False)
    params_b, _ = M.init(jax.random.PRNGKey(0), cfg_b)
    assert not M._stage_resident_train_ok(cfg_b, params_b["stages"][0],
                                          x16, 0)
    # an unexpected bn-bearing branch must be rejected, not dropped
    blk = params["stages"][0][0]
    blk["lk"]["origin"] = {"w": blk["lk"]["LoRA1"]["w"],
                           "bn": blk["lk"]["LoRA1"]["bn"]}
    assert not M._stage_resident_train_ok(cfg, params["stages"][0], x16, 0)
    del blk["lk"]["origin"]
    # config validation covers the new knob
    with pytest.raises(ValueError):
        M.SLaKConfig(train_layout="chwn")


@pytest.mark.parametrize("dp_rate", [0.3])
def test_resident_train_matches_nhwc(rng, dp_rate):
    # dp_rate=0.3 exercises everything 0.0 does PLUS the layout-invariant
    # drop-path masks; the 0.0 variant was dropped to save ~14 CPU-min.
    """Model level: train-mode forward, BN state updates, and parameter
    grads match between the resident C-major stages and the NHWC path.
    With drop_path active the same rng must produce the same per-sample
    masks in both layouts (the bernoulli draw is layout-invariant)."""
    cfg = tiny_cfg(drop_path_rate=dp_rate)
    cfg_n = dataclasses.replace(cfg, train_layout="nhwc")
    params, state = M.init(jax.random.PRNGKey(1), cfg)

    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for leaf in leaves:
            noise = rng.standard_normal(leaf.shape).astype(np.float32)
            out.append(leaf + 0.05 * jnp.abs(jnp.asarray(noise)))
        return jax.tree_util.tree_unflatten(treedef, out)

    params = jitter(params)
    state = jitter(state)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    key = jax.random.PRNGKey(7)

    def loss(params, cfg):
        logits, ns = M.apply(params, state, x, cfg=cfg, train=True, rng=key)
        return jnp.mean(logits * jnp.cos(logits)), (logits, ns)

    (lr, (logit_r, st_r)), g_r = jax.value_and_grad(
        loss, has_aux=True)(params, cfg)
    (ln, (logit_n, st_n)), g_n = jax.value_and_grad(
        loss, has_aux=True)(params, cfg_n)

    np.testing.assert_allclose(np.asarray(logit_r), np.asarray(logit_n),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(st_r),
                    jax.tree_util.tree_leaves(st_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(lr), float(ln), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


@pytest.mark.parametrize("dp_rate", [0.0, 0.4])
def test_resident_fused_mlp_tail_matches_xla(rng, monkeypatch, dp_rate):
    """Block level: the TRAIN_RESIDENT_MLP='fused' tail
    (pallas_mlp.fused_mlp_cmajor — Pallas fwd, tokens-major bwd kernels
    behind two transposes) must match the C-contracted XLA dots it
    replaces — output and parameter grads — on the same (C, H, W, N)
    resident activation, with and without drop-path."""
    cfg = tiny_cfg()
    params, state = M.init(jax.random.PRNGKey(2), cfg)
    p = params["stages"][0][0]
    s = state["stages"][0][0]
    xc = jnp.asarray(rng.standard_normal((8, 16, 16, 2)), jnp.float32)
    key = jax.random.PRNGKey(11) if dp_rate > 0.0 else None

    def run(p):
        y, _ = M._block_forward_resident_train(
            xc, p, s, dp_rate=dp_rate, rng=key, cfg=cfg)
        return jnp.mean(y * jnp.sin(y)), y

    monkeypatch.setattr(M, "TRAIN_RESIDENT_MLP", "xla")
    (lx, yx), gx = jax.value_and_grad(run, has_aux=True)(p)
    monkeypatch.setattr(M, "TRAIN_RESIDENT_MLP", "fused")
    from slak_tpu.ops import pallas_mlp as PM
    assert PM.fused_mlp_ok(8, 32, 4, True)   # the knob actually engages
    (lf, yf), gf = jax.value_and_grad(run, has_aux=True)(p)

    np.testing.assert_allclose(np.asarray(yf), np.asarray(yx),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


def test_resident_train_bf16_runs(rng):
    """bf16 compute (the TPU training dtype) flows through the resident
    stages: finite logits, BN stats updated, grads produced."""
    cfg = tiny_cfg()
    params, state = M.init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.bfloat16)

    def loss(params):
        logits, ns = M.apply(params, state, x, cfg=cfg, train=True,
                             rng=jax.random.PRNGKey(0))
        return jnp.mean(logits.astype(jnp.float32) ** 2), ns

    (l, ns), g = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(l))
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    # BN means actually moved (train-mode stats were applied)
    m0 = state["stages"][0][0]["lk"]["LoRA1"]["bn"]["mean"]
    m1 = ns["stages"][0][0]["lk"]["LoRA1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))
