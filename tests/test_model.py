"""Model-level tests: shapes, BN semantics vs torch, LN parity, reparam merge
equivalence (reference models/SLaK.py:102-122 merge math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from slak_tpu.models import slak as M
from slak_tpu.models.layers import layer_norm, gelu
from slak_tpu.ops.batchnorm import batch_norm


def tiny_cfg(**kw):
    base = dict(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32),
                kernel_size=(13, 11, 9, 7, 5), decom=True, branch_bn=True,
                num_classes=10, conv_impl="xla")
    base.update(kw)
    return M.SLaKConfig(**base)


def test_forward_shapes():
    cfg = tiny_cfg()
    params, state = M.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 32, 32, 3))
    logits, new_state = M.apply(params, state, x, cfg=cfg, train=False)
    assert logits.shape == (2, 10)
    # jit-compilable, no recompile surprises
    f = jax.jit(lambda p, s, x: M.apply(p, s, x, cfg=cfg, train=False))
    logits2, _ = f(params, state, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-5, atol=1e-5)


def test_widened_dims():
    cfg = tiny_cfg(width_factor=1.3)
    assert cfg.widened_dims == tuple(int(d * 1.3) for d in (8, 16, 24, 32))
    params, state = M.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    logits, _ = M.apply(params, state, x, cfg=cfg)
    assert logits.shape == (1, 10)


def test_convnext_mode_has_no_small_or_decom():
    cfg = tiny_cfg(kernel_size=(7, 7, 7, 7, 100), decom=False, branch_bn=False)
    params, _ = M.init(jax.random.PRNGKey(0), cfg)
    lk = params["stages"][0][0]["lk"]
    assert set(lk) == {"origin"}
    assert "bn" not in lk["origin"]


def test_batchnorm_matches_torch(rng):
    c = 6
    x = rng.standard_normal((4, 5, 5, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    rm = rng.standard_normal(c, dtype=np.float32)
    rv = np.abs(rng.standard_normal(c, dtype=np.float32)) + 0.5

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(rm))
        bn.running_var.copy_(torch.from_numpy(rv))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # eval mode uses running stats (check first: torch's train-mode forward
    # mutates the running stats in place)
    bn.eval()
    want = np.transpose(bn(xt).detach().numpy(), (0, 2, 3, 1))
    got, _, _ = batch_norm(jnp.asarray(x), scale, bias, rm, rv, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # train mode
    bn.train()
    want = np.transpose(bn(xt).detach().numpy(), (0, 2, 3, 1))
    got, nm, nv = batch_norm(jnp.asarray(x), scale, bias, rm, rv, train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_layernorm_and_gelu_match_torch(rng):
    c = 16
    x = rng.standard_normal((3, 4, 4, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    got = layer_norm(jnp.asarray(x), scale, bias)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (c,), torch.from_numpy(scale),
        torch.from_numpy(bias), eps=1e-6).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    g = gelu(jnp.asarray(x))
    wg = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(g), wg, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("decom", [True, False])
def test_reparam_merge_matches_unfused(rng, decom):
    """Merged single-conv forward == multi-branch eval forward."""
    cfg = tiny_cfg(decom=decom)
    params, state = M.init(jax.random.PRNGKey(1), cfg)

    # randomize BN stats so the fold actually does something
    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for i, leaf in enumerate(leaves):
            noise = rng.standard_normal(leaf.shape).astype(np.float32)
            out.append(leaf + 0.05 * jnp.abs(jnp.asarray(noise)))
        return jax.tree_util.tree_unflatten(treedef, out)

    state = jitter(state)
    params = jitter(params)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    ref, _ = M.apply(params, state, x, cfg=cfg, train=False)
    merged = M.merge_model(params, state, cfg)
    got, _ = M.apply(merged, state, x, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("layout", ["dual", "cmajor"])
def test_resident_eval_matches_nhwc(rng, layout):
    """C-major resident eval stages ('dual': both orientations live,
    zero per-block XLA layout ops; 'cmajor': single orientation) match
    the per-block NHWC path — the same math in a different layout, so
    tolerance is fp32 noise."""
    import dataclasses
    cfg = tiny_cfg(kernel_size=(31, 31, 31, 7, 5), conv_impl="banded",
                   pallas_interpret=True, eval_layout=layout)
    params, state = M.init(jax.random.PRNGKey(2), cfg)

    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for leaf in leaves:
            noise = rng.standard_normal(leaf.shape).astype(np.float32)
            out.append(leaf + 0.05 * jnp.abs(jnp.asarray(noise)))
        return jax.tree_util.tree_unflatten(treedef, out)

    state = jitter(state)
    params = jitter(params)
    # stages 1-3 qualify (K=31 pair), stage 4 (K=7) stays NHWC
    assert M._stage_resident_ok(cfg, params["stages"][0], 2, jnp.float32)
    assert not M._stage_resident_ok(cfg, params["stages"][3], 2, jnp.float32)

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    got, st_r = M.apply(params, state, x, cfg=cfg, train=False)
    cfg_n = dataclasses.replace(cfg, eval_layout="nhwc")
    want, st_n = M.apply(params, state, x, cfg=cfg_n, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # eval leaves BN state untouched on both paths
    for a, b in zip(jax.tree_util.tree_leaves(st_r),
                    jax.tree_util.tree_leaves(st_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_branch_forward_banded_stats_parity(rng):
    """Train-mode conv+BN branch: the banded stats-fused route (conv
    kernel emits the BN sums, batch_norm_from_sums consumes them) matches
    the plain conv + batch_norm composition — output, new running stats,
    and grads."""
    n, h, w, c, K, s = 2, 16, 16, 3, 31, 5
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32),
         "bn": {"scale": jnp.asarray(rng.random(c) + 0.5, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}}
    st = {"bn": {"mean": jnp.asarray(rng.standard_normal(c), jnp.float32),
                 "var": jnp.asarray(rng.random(c) + 0.5, jnp.float32)}}
    cfg_b = M.SLaKConfig(depths=(1,), dims=(c,), conv_impl="banded",
                         pallas_interpret=True)
    cfg_x = M.SLaKConfig(depths=(1,), dims=(c,), conv_impl="xla")

    def run(cfg):
        def loss(p, x):
            y, ns = M._branch_forward(x, p, st, train=True, cfg=cfg)
            return jnp.sum(y * jnp.sin(y)), ns
        (l, ns), g = jax.value_and_grad(loss, has_aux=True)(p, x)
        return l, ns, g

    lb, nsb, gb = run(cfg_b)
    lx, nsx, gx = run(cfg_x)
    np.testing.assert_allclose(float(lb), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(nsb),
                    jax.tree_util.tree_leaves(nsx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gb),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_config_validates_impl_strings():
    """Unknown dispatch strings must error at construction, not silently
    route to an unintended path (ADVICE r4: a typo like 'nwhc' previously
    fell through to the cmajor resident path)."""
    with pytest.raises(ValueError):
        M.SLaKConfig(eval_layout="nwhc")
    with pytest.raises(ValueError):
        M.SLaKConfig(conv_impl="cuda")
    with pytest.raises(ValueError):
        M.SLaKConfig(mlp_impl="pallas")
    # the four valid layouts still construct
    for lay in ("auto", "cmajor", "dual", "nhwc"):
        M.SLaKConfig(eval_layout=lay)


def test_resident_gate_rejects_unknown_branch(rng):
    """_fold_eval_pair folds LoRA1/LoRA2/small only; a block carrying any
    other bn-bearing branch (e.g. 'origin' from a hand-built checkpoint)
    must NOT qualify for the resident path (ADVICE r4)."""
    cfg = tiny_cfg(kernel_size=(31, 31, 31, 7, 5), conv_impl="banded",
                   pallas_interpret=True)
    params, _ = M.init(jax.random.PRNGKey(0), cfg)
    assert M._stage_resident_ok(cfg, params["stages"][0], 2, jnp.float32)
    blk = params["stages"][0][0]
    blk["lk"]["origin"] = {
        "w": blk["lk"]["LoRA1"]["w"],
        "bn": blk["lk"]["LoRA1"]["bn"],
    }
    assert not M._stage_resident_ok(cfg, params["stages"][0], 2, jnp.float32)
    del blk["lk"]["origin"]


@pytest.mark.parametrize("dp_rate", [0.0, 0.3])
def test_remat_train_forward_matches(rng, dp_rate):
    """cfg.remat wraps each train block in jax.checkpoint — a pure
    memory/FLOPs trade. Loss, logits, BN state, and parameter grads must
    match the unremat'd forward exactly (same rng ⇒ same drop-path
    masks), on both the NHWC and resident-train block paths."""
    outs = {}
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    for remat in (False, True):
        cfg = tiny_cfg(drop_path_rate=dp_rate, remat=remat)
        params, state = M.init(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(7)

        def loss_fn(p):
            logits, ns = M.apply(p, state, x, cfg=cfg, train=True, rng=key)
            return jnp.mean(jax.nn.log_softmax(logits)[:, 0] * -1.0), \
                (logits, ns)

        (loss, (logits, ns)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        outs[remat] = (loss, logits, ns, grads)
    l0, lg0, ns0, g0 = outs[False]
    l1, lg1, ns1, g1 = outs[True]
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg0),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ns1),
                    jax.tree_util.tree_leaves(ns0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
