"""Packed parameter state (train/packing.py): pack/unpack round trip and
train-step parity vs the unpacked per-leaf path — the packed layout must be
a pure performance change (same math, same results)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.models import slak as M
from slak_tpu.sparsity import MaskConfig
from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                            create_train_state, make_train_step)
from slak_tpu.train import packing


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _tiny_model():
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                       conv_impl="xla", drop_path_rate=0.0)
    return M.SLaK(cfg)


def _batch(rng, n=4):
    x = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, n)
    return jnp.asarray(x), jnp.asarray(y)


def test_pack_unpack_roundtrip():
    model = _tiny_model()
    params, _ = model.init(jax.random.PRNGKey(0))
    plan = packing.make_plan(params)
    packed = packing.pack(params, plan)
    # big leaves pass by reference; small leaves live in ONE flat vector
    assert all(l.ndim >= 2 for l in packed["big"])
    assert packed["flat"].ndim == 1 and packed["flat"].dtype == jnp.float32
    n_small = sum(1 for b in plan.is_big if not b)
    assert n_small > 0 and len(packed["big"]) + n_small == len(plan.names)
    back = packing.unpack(packed, plan)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_grad_arrives_packed():
    """The AD transpose of unpack packs the cotangents: the grad of a
    loss taken w.r.t. the packed structure has the packed structure."""
    model = _tiny_model()
    params, mstate = model.init(jax.random.PRNGKey(0))
    plan = packing.make_plan(params)
    packed = packing.pack(params, plan)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)

    def loss(pk):
        logits, _ = model.apply(packing.unpack(pk, plan), mstate, x,
                                train=False)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(packed)
    assert g["flat"].shape == packed["flat"].shape
    # matches the tree-space grad, repacked
    g_tree = jax.grad(lambda p: jnp.sum(
        model.apply(p, mstate, x, train=False)[0] ** 2))(params)
    want = packing.pack(g_tree, plan)
    np.testing.assert_allclose(np.asarray(g["flat"]),
                               np.asarray(want["flat"]), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("sparse", [False, True])
def test_train_step_packed_parity(rng, sparse):
    """5 steps packed vs unpacked: identical losses and final params
    (incl. a DST refresh on the sparse variant)."""
    model = _tiny_model()
    mcfg = MaskConfig(sparsity=0.4, sparse_init="uniform",
                      growth_mode="gradient", prune_rate=0.5,
                      update_frequency=2) if sparse else None
    lr = jnp.asarray(cosine_schedule_array(1e-2, 1e-4, 1, 50))
    wd = jnp.asarray(cosine_schedule_array(0.05, 0.04, 1, 50))
    batch = _batch(rng)

    results = {}
    for packed in (False, True):
        tcfg = TrainConfig(update_freq=1, ema_decay=0.99, layer_decay=0.9,
                           clip_grad=5.0, prune_t_max=20,
                           pack_params=packed)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg, mcfg)
        step = jax.jit(make_train_step(model, tcfg, mcfg, lr, wd))
        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        results[packed] = (losses, state)

    l0, s0 = results[False]
    l1, s1 = results[True]
    # the global grad-norm (clip) sums leaves in a different order in the
    # packed layout -> fp32-noise-level divergence, nothing more
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    p0 = jax.tree_util.tree_leaves(s0.params)
    p1 = jax.tree_util.tree_leaves(s1.tree_params())
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # EMA parity (packed EMA tracks the packed structure)
    e0 = jax.tree_util.tree_leaves(s0.ema_params)
    e1 = jax.tree_util.tree_leaves(s1.tree_ema()[0])
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_packed_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a packed TrainState preserves the packed
    structure (plan travels in the pytree aux)."""
    pytest.importorskip("orbax.checkpoint")
    from slak_tpu.train import checkpoint as ckpt

    model = _tiny_model()
    tcfg = TrainConfig(pack_params=True, ema_decay=0.99)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)
    path = str(tmp_path / "ck")
    ckpt.save_pytree(path, state)
    restored = ckpt.restore_pytree(path, state)
    assert restored.plan is not None
    np.testing.assert_array_equal(np.asarray(restored.params["flat"]),
                                  np.asarray(state.params["flat"]))
    for a, b in zip(state.params["big"], restored.params["big"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("direction", ["old_to_packed", "packed_to_old"])
def test_cross_format_checkpoint_resume(tmp_path, direction):
    """An unpacked (pre-packing, round-2 style) checkpoint must resume
    into a packed-params run with the WEIGHTS FROM THE CHECKPOINT (not
    silently keep the fresh target init), and vice versa."""
    from slak_tpu.train.checkpoint import auto_load, save_checkpoint

    model = _tiny_model()
    tc_saved = TrainConfig(pack_params=(direction == "packed_to_old"))
    tc_target = TrainConfig(pack_params=(direction == "old_to_packed"))
    saved = create_train_state(jax.random.PRNGKey(7), model, tc_saved)
    save_checkpoint(str(tmp_path), saved, epoch=3)

    target = create_train_state(jax.random.PRNGKey(1), model, tc_target)
    loaded, start = auto_load(str(tmp_path), target)
    assert start == 4

    def tree_params(st):
        return (packing.unpack(st.params, st.plan)
                if st.plan is not None else st.params)

    got = jax.tree_util.tree_leaves(tree_params(loaded))
    want = jax.tree_util.tree_leaves(tree_params(saved))
    fresh = jax.tree_util.tree_leaves(tree_params(target))
    assert any(not np.allclose(np.asarray(w), np.asarray(f))
               for w, f in zip(want, fresh))  # distinct inits, else vacuous
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)
    # optimizer moments came through the format adaptation too
    def tree_mom(st, key):
        m = st.opt_state[key]
        return packing.unpack(m, st.plan) if st.plan is not None else m
    for key in ("mu", "nu"):
        for g, w in zip(jax.tree_util.tree_leaves(tree_mom(loaded, key)),
                        jax.tree_util.tree_leaves(tree_mom(saved, key))):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-6)
