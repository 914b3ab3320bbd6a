"""Fused LN+MLP block tail (ops/pallas_mlp.py) vs the reference op
composition (models/SLaK.py:145-166 semantics), interpret mode (CPU CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.ops import pallas_mlp as pm


def _params(rng, c):
    c4 = 4 * c
    return (
        jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),   # ln s
        jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),       # ln b
        jnp.asarray(rng.standard_normal((c, c4)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(c4) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((c4, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        jnp.asarray(np.full(c, 0.5), jnp.float32),                    # gamma
        jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32),   # pre_bias
    )


@pytest.mark.parametrize("add_residual", [True, False])
def test_fused_mlp_matches_reference(rng, add_residual):
    n, h, w, c = 2, 5, 6, 12
    y = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ps = _params(rng, c)
    got = pm.fused_mlp(y, res, *ps, add_residual, True)
    want = pm._reference_mlp(y, res, *ps, add_residual=add_residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_grads_match_reference(rng):
    """Custom VJP (XLA recompute backward) vs autodiff of the reference
    composition."""
    n, h, w, c = 2, 4, 4, 8
    y = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ps = _params(rng, c)
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    def lf(y_, res_, *ps_):
        return jnp.sum(pm.fused_mlp(y_, res_, *ps_, True, True) * r)

    def lr(y_, res_, *ps_):
        return jnp.sum(pm._reference_mlp(y_, res_, *ps_,
                                         add_residual=True) * r)

    gf = jax.grad(lf, argnums=tuple(range(10)))(y, res, *ps)
    gr = jax.grad(lr, argnums=tuple(range(10)))(y, res, *ps)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mlp_bwd_chunked_wide(rng, monkeypatch):
    """C above the monolithic backward gate: the F-chunked kernel (grid
    over C4 chunks, dh accumulated in the dy ref, LN backward finalized on
    the last chunk) matches reference autodiff — incl. a non-dividing C4
    (padding path, NF=3)."""
    monkeypatch.setattr(pm, "_BWD_C_MAX", 4)
    monkeypatch.setattr(pm, "_pick_fc", lambda c4, itemsize=2: 12)
    n, h, w, c = 2, 3, 3, 8
    y = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ps = _params(rng, c)
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    def lf(y_, res_, *ps_):
        return jnp.sum(pm.fused_mlp(y_, res_, *ps_, True, True) * r)

    def lr(y_, res_, *ps_):
        return jnp.sum(pm._reference_mlp(y_, res_, *ps_,
                                         add_residual=True) * r)

    gf = jax.grad(lf, argnums=tuple(range(10)))(y, res, *ps)
    gr = jax.grad(lr, argnums=tuple(range(10)))(y, res, *ps)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mlp_bf16(rng):
    n, h, w, c = 2, 4, 4, 8
    y32 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    r32 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    ps = _params(rng, c)
    y = jnp.asarray(y32, jnp.bfloat16)
    res = jnp.asarray(r32, jnp.bfloat16)
    got = pm.fused_mlp(y, res, *ps, True, True)
    assert got.dtype == jnp.bfloat16
    want = pm._reference_mlp(jnp.asarray(y32), jnp.asarray(r32), *ps,
                             add_residual=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=5e-2, atol=5e-2)


def test_erf_poly_accuracy():
    import scipy.special as sp
    x = np.linspace(-4, 4, 2001).astype(np.float32)
    got = np.asarray(pm._erf_as(jnp.asarray(x)))
    # 1.5e-7 formula error + fp32 evaluation rounding
    err = np.abs(got - sp.erf(x)).max()
    assert err <= 1e-6, err


def test_fused_mlp_gate():
    # SLaK-T w1.3 stage dims at bf16: stages 1-3 fused, stage 4 exceeds
    # the resident-weight VMEM budget
    assert pm.fused_mlp_ok(124, 496, 2, True)
    assert pm.fused_mlp_ok(249, 996, 2, True)
    assert pm.fused_mlp_ok(499, 1996, 2, True)
    assert not pm.fused_mlp_ok(998, 3992, 2, True)
    assert not pm.fused_mlp_ok(124, 496, 2, False)   # CPU
