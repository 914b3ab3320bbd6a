"""Golden tests for the DST engine against NumPy ports of the reference's
``funcs.py`` / ``sparse_core.py`` semantics (SURVEY.md §4: "mask-update
semantics golden tests against a NumPy port of funcs.py")."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.models import slak as M
from slak_tpu.sparsity import (
    MaskConfig, apply_mask_to_tree, cosine_prune_rate, erk_densities,
    init_masks, select_maskable, truncate_weights,
)
from slak_tpu.sparsity.masking import (
    magnitude_prune, random_growth, score_growth, set_prune,
)


# --- NumPy ports of the reference (funcs.py) -------------------------------

def ref_magnitude_prune(mask, weight, prune_rate):
    """funcs.py:56-114"""
    nnz = mask.sum()
    zeros = mask.size - nnz
    num_remove = math.ceil(prune_rate * nnz)
    if num_remove == 0:
        return (weight != 0.0).astype(np.float32)
    k = math.ceil(zeros + num_remove)
    idx = np.argsort(np.abs(weight).ravel(), kind="stable")
    out = mask.copy().ravel()
    out[idx[:k]] = 0.0
    return out.reshape(mask.shape)


def ref_gradient_growth(new_mask, grad, regrowth):
    """funcs.py:196-205"""
    g = np.abs(grad) * (new_mask == 0)
    idx = np.argsort(-g.ravel(), kind="stable")
    out = new_mask.copy().ravel()
    out[idx[:regrowth]] = 1.0
    return out.reshape(new_mask.shape)


# --- tests ------------------------------------------------------------------

def test_magnitude_prune_matches_reference(rng):
    w = rng.standard_normal((32, 48)).astype(np.float32)
    mask = (rng.random((32, 48)) < 0.6).astype(np.float32)
    w = w * mask  # masked weights are zero, like after apply_mask
    for pr in (0.0, 0.1, 0.5, 0.9):
        got = np.asarray(magnitude_prune(jnp.asarray(mask), jnp.asarray(w),
                                         jnp.float32(pr)))
        want = ref_magnitude_prune(mask, w, pr)
        np.testing.assert_array_equal(got, want)


def test_set_prune_counts(rng):
    w = rng.standard_normal((40, 40)).astype(np.float32)
    mask = (rng.random((40, 40)) < 0.5).astype(np.float32)
    w = w * mask
    pr = 0.4
    got = np.asarray(set_prune(jnp.asarray(mask), jnp.asarray(w),
                               jnp.float32(pr)))
    # SET removes ~num_remove live weights (magnitude half overlaps zeros,
    # negativity half may overlap the magnitude half)
    removed = mask.sum() - got.sum()
    num_remove = math.ceil(pr * mask.sum())
    assert removed >= num_remove / 2 - 1
    assert removed <= num_remove + 1
    assert np.all(got <= mask)  # prune never adds


def test_gradient_growth_matches_reference(rng):
    new_mask = (rng.random((24, 24)) < 0.4).astype(np.float32)
    grad = rng.standard_normal((24, 24)).astype(np.float32)
    for regrowth in (0, 7, 50):
        got = np.asarray(score_growth(jnp.asarray(new_mask),
                                      jnp.asarray(grad),
                                      jnp.float32(regrowth)))
        want = ref_gradient_growth(new_mask, grad, regrowth)
        np.testing.assert_array_equal(got, want)


def test_random_growth_statistics():
    key = jax.random.PRNGKey(0)
    new_mask = jnp.zeros((100, 100), jnp.float32).at[:40].set(1.0)
    regrowth = jnp.float32(600.0)
    grown = random_growth(key, new_mask, regrowth)
    assert float(jnp.sum(grown >= new_mask)) == new_mask.size  # OR semantics
    added = float(jnp.sum(grown) - jnp.sum(new_mask))
    # binomial(6000 zeros, p=0.1): mean 600, sd ~23 — allow 5 sd
    assert 400 < added < 800
    # determinism given the key: replicas need no mask broadcast
    grown2 = random_growth(key, new_mask, regrowth)
    np.testing.assert_array_equal(np.asarray(grown), np.asarray(grown2))


def test_erk_densities_mean():
    shapes = {"a": (64, 64), "b": (3, 3, 64), "c": (128, 256)}
    dens = erk_densities(shapes, 0.4)
    total = sum(np.prod(s) for s in shapes.values())
    nnz = sum(dens[n] * np.prod(s) for n, s in shapes.items())
    assert abs(nnz / total - 0.4) < 1e-6
    # smaller/kernel-ish layers get higher density (ERK property)
    assert dens["b"] > dens["c"]


def tiny_model():
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(13, 11, 9, 7, 5), decom=True,
                       branch_bn=True, num_classes=10, conv_impl="xla")
    params, state = M.init(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_select_maskable_rules():
    cfg, params, _ = tiny_model()
    sel = select_maskable(params)
    # conv + dense weights only: no biases, no LN/BN scales, no gamma
    assert all(v.ndim >= 2 for v in sel.values())
    assert any("LoRA1" in n for n in sel)
    assert any("pwconv1" in n for n in sel)
    assert not any("gamma" in n for n in sel)
    assert not any(n.endswith(".b") for n in sel)
    sel_l = select_maskable(params, only_L=True)
    assert sel_l and all("LoRA" in n for n in sel_l)


@pytest.mark.parametrize("mode", ["uniform", "ERK"])
def test_init_masks_density(mode):
    cfg_m, params, _ = tiny_model()
    mc = MaskConfig(sparsity=0.5, sparse_init=mode)
    st = init_masks(jax.random.PRNGKey(1), params, mc)
    total = sum(m.size for m in st.masks.values())
    nnz = sum(float(jnp.sum(m)) for m in st.masks.values())
    assert abs(nnz / total - 0.5) < 0.05
    # fired starts equal to masks
    for n in st.masks:
        np.testing.assert_array_equal(np.asarray(st.fired[n]),
                                      np.asarray(st.masks[n]))


def test_init_resume_from_zeros():
    _, params, _ = tiny_model()
    masks0 = init_masks(jax.random.PRNGKey(1), params,
                        MaskConfig(sparsity=0.5, sparse_init="uniform")).masks
    sparse_params = apply_mask_to_tree(params, masks0)
    st = init_masks(jax.random.PRNGKey(2), sparse_params,
                    MaskConfig(sparsity=0.5, sparse_init="resume"))
    for n, m in st.masks.items():
        np.testing.assert_array_equal(np.asarray(m), np.asarray(masks0[n]))


def test_snip_init():
    cfg, params, state = tiny_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(np.arange(4) % 10)

    def loss_fn(p):
        logits, _ = M.apply(p, state, x, cfg=cfg, train=False)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=1))

    st = init_masks(jax.random.PRNGKey(1), params,
                    MaskConfig(sparsity=0.6, sparse_init="snip"),
                    loss_fn=loss_fn)
    total = sum(m.size for m in st.masks.values())
    nnz = sum(float(jnp.sum(m)) for m in st.masks.values())
    # snip sets *expected* density via per-layer bernoulli; loose bound, and
    # near-dense layers may have been dropped from the mask set entirely
    assert 0.25 < nnz / total < 0.65


@pytest.mark.parametrize("growth", ["random", "gradient", "momentum"])
def test_truncate_weights_preserves_nnz(growth):
    cfg, params, _ = tiny_model()
    mc = MaskConfig(sparsity=0.5, sparse_init="uniform", growth_mode=growth,
                    prune_rate=0.3)
    st = init_masks(jax.random.PRNGKey(1), params, mc)
    params = apply_mask_to_tree(params, st.masks)
    fake = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(3).standard_normal(
            p.shape).astype(np.float32)), params)
    nnz_before = sum(float(jnp.sum(m)) for m in st.masks.values())
    st2, new_params = truncate_weights(st, params, mc, jnp.float32(0.3),
                                       grads=fake, momentum=fake)
    nnz_after = sum(float(jnp.sum(m)) for m in st2.masks.values())
    # random growth is binomial; others exact. Allow 5%.
    assert abs(nnz_after - nnz_before) / nnz_before < 0.05
    # masked params are zero where mask is zero
    sel = select_maskable(new_params, only_L=mc.only_L)
    for n, m in st2.masks.items():
        assert float(jnp.sum(jnp.abs(sel[n]) * (1 - m))) == 0.0
    # fired is monotone
    for n in st2.masks:
        assert float(jnp.sum(st2.fired[n] >= st.fired[n])) == st2.fired[n].size


def test_truncate_is_jittable_fixed_shape():
    """The critical TPU constraint: mask refresh must not recompile."""
    cfg, params, _ = tiny_model()
    mc = MaskConfig(sparsity=0.5, sparse_init="uniform", growth_mode="random",
                    prune_rate=0.3)
    st = init_masks(jax.random.PRNGKey(1), params, mc)
    params = apply_mask_to_tree(params, st.masks)

    calls = []

    @jax.jit
    def refresh(st, params, pr):
        calls.append(1)  # traced once only
        return truncate_weights(st, params, mc, pr)

    st1, p1 = refresh(st, params, jnp.float32(0.5))
    st2, p2 = refresh(st1, p1, jnp.float32(0.3))  # different rate, same shape
    assert len(calls) == 1


def test_cosine_prune_rate_schedule():
    t_max = 1000
    assert float(cosine_prune_rate(jnp.int32(0), 0.5, t_max)) == pytest.approx(0.5)
    assert float(cosine_prune_rate(jnp.int32(t_max), 0.5, t_max)) == \
        pytest.approx(0.005, abs=1e-6)
    mid = float(cosine_prune_rate(jnp.int32(t_max // 2), 0.5, t_max))
    assert 0.2 < mid < 0.3


# --- global (cross-layer) modes ---------------------------------------------

def ref_global_magnitude_prune(masks, weights, prune_rate):
    """funcs.py:116-148 made exact: global kill-count by |w| rank."""
    names = list(masks)
    all_w = np.concatenate([np.abs(weights[n]).ravel() for n in names])
    total_nnz = sum(masks[n].sum() for n in names)
    zeros = all_w.size - total_nnz
    num_remove = math.ceil(prune_rate * total_nnz)
    idx = np.argsort(all_w, kind="stable")
    kill = np.zeros(all_w.size, bool)
    kill[idx[:int(zeros + num_remove)]] = True
    out, off = {}, 0
    for n in names:
        m = masks[n]
        k = kill[off:off + m.size].reshape(m.shape)
        out[n] = np.where(k, 0.0, m).astype(np.float32)
        off += m.size
    return out


def test_global_magnitude_prune_matches_numpy_port(rng):
    from slak_tpu.sparsity.masking import global_magnitude_prune
    masks, weights = {}, {}
    for i, shape in enumerate([(16, 24), (7, 5, 12), (30, 30)]):
        m = (rng.random(shape) < 0.6).astype(np.float32)
        w = rng.standard_normal(shape).astype(np.float32) * m
        masks[f"l{i}"], weights[f"l{i}"] = m, w
    for pr in (0.0, 0.2, 0.7):
        got = global_magnitude_prune(
            {n: jnp.asarray(m) for n, m in masks.items()},
            {n: jnp.asarray(w) for n, w in weights.items()},
            jnp.float32(pr))
        want = ref_global_magnitude_prune(masks, weights, pr)
        for n in masks:
            np.testing.assert_array_equal(np.asarray(got[n]), want[n])


def test_global_momentum_growth_exact_count(rng):
    from slak_tpu.sparsity.masking import global_momentum_growth
    masks, scores = {}, {}
    for i, shape in enumerate([(16, 24), (7, 5, 12)]):
        masks[f"l{i}"] = (rng.random(shape) < 0.4).astype(np.float32)
        scores[f"l{i}"] = rng.standard_normal(shape).astype(np.float32)
    regrow = 37
    got = global_momentum_growth(
        {n: jnp.asarray(m) for n, m in masks.items()},
        {n: jnp.asarray(s) for n, s in scores.items()},
        jnp.float32(regrow))
    added = sum(float(jnp.sum(got[n])) - masks[n].sum() for n in masks)
    assert added == regrow
    # grown positions are exactly the top-|score| masked slots
    all_s = np.concatenate([(np.abs(scores[n]) * (masks[n] == 0)).ravel()
                            for n in masks])
    thr = np.sort(all_s)[-regrow]
    for n in masks:
        grown = (np.asarray(got[n]) == 1) & (masks[n] == 0)
        assert np.all(np.abs(scores[n])[grown] >= thr)


def test_truncate_weights_global_modes_preserve_nnz():
    cfg, params, _ = tiny_model()
    mc = MaskConfig(sparsity=0.5, sparse_init="uniform",
                    prune_mode="global_magnitude",
                    growth_mode="global_momentum_growth", prune_rate=0.3)
    st = init_masks(jax.random.PRNGKey(1), params, mc)
    params = apply_mask_to_tree(params, st.masks)
    fake = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(3).standard_normal(
            p.shape).astype(np.float32)), params)
    nnz_before = sum(float(jnp.sum(m)) for m in st.masks.values())

    @jax.jit
    def refresh(st, params, pr):
        return truncate_weights(st, params, mc, pr, grads=fake,
                                momentum=fake)

    st2, new_params = refresh(st, params, jnp.float32(0.3))
    nnz_after = sum(float(jnp.sum(m)) for m in st2.masks.values())
    assert abs(nnz_after - nnz_before) <= 1.0  # exact-count global modes
    sel = select_maskable(new_params, only_L=mc.only_L)
    for n, m in st2.masks.items():
        assert float(jnp.sum(jnp.abs(sel[n]) * (1 - m))) == 0.0
