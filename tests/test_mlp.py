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


@pytest.mark.parametrize("add_residual", [True, False])
def test_fused_mlp_cmajor_matches_reference(rng, add_residual):
    """The C-major (C, M) variant (resident eval path) vs the reference
    composition — includes an M that does not divide the tile (pad path)."""
    c, h, w, n = 12, 5, 6, 3
    yc = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    resc = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    ps = _params(rng, c)
    got = pm.fused_mlp_cmajor(yc, resc, *ps, add_residual, True)
    assert got.shape == yc.shape
    # reference runs tokens-major: transpose (C,H,W,N) -> (N,H,W,C)
    want = pm._reference_mlp(jnp.transpose(yc, (3, 1, 2, 0)),
                             jnp.transpose(resc, (3, 1, 2, 0)), *ps,
                             add_residual=add_residual)
    np.testing.assert_allclose(np.asarray(jnp.transpose(got, (3, 1, 2, 0))),
                               np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_mlp_cmajor_grads_match_reference(rng):
    """C-major VJP (delegates to the tokens-major backward through
    transposes) vs autodiff of the reference composition."""
    c, h, w, n = 8, 4, 3, 2
    yc = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    resc = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    ps = _params(rng, c)
    r = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)

    def lf(y_, res_, *ps_):
        return jnp.sum(pm.fused_mlp_cmajor(y_, res_, *ps_, True, True) * r)

    def lr(y_, res_, *ps_):
        out = pm._reference_mlp(jnp.transpose(y_, (3, 1, 2, 0)),
                                jnp.transpose(res_, (3, 1, 2, 0)), *ps_,
                                add_residual=True)
        return jnp.sum(jnp.transpose(out, (3, 1, 2, 0)) * r)

    gf = jax.grad(lf, argnums=tuple(range(10)))(yc, resc, *ps)
    gr = jax.grad(lr, argnums=tuple(range(10)))(yc, resc, *ps)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("emit_q", [True, False])
def test_fused_mlp_cmajor_dual_matches_reference(rng, emit_q):
    """Dual-orientation kernel (dual-resident eval stage): branch add +
    LN+MLP on (C, W, nb) tiles, outputs in both orientations via grid
    indexing. Checked against the jnp twin, fwd + input grads."""
    c, h, w, n = 12, 5, 6, 3
    y1 = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    y2 = jnp.asarray(rng.standard_normal((c, w, h, n)), jnp.float32)
    resh = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)
    ps = _params(rng, c)
    oh, oq = pm.fused_mlp_cmajor_dual(y1, y2, resh, *ps, emit_q, True)
    rh, rq = pm._reference_mlp_dual(y1, y2, resh, *ps, emit_q=emit_q)
    np.testing.assert_allclose(np.asarray(oh), np.asarray(rh),
                               rtol=2e-4, atol=2e-4)
    if emit_q:
        np.testing.assert_allclose(np.asarray(oq), np.asarray(rq),
                                   rtol=2e-4, atol=2e-4)
    else:
        assert oq is None and rq is None

    r = jnp.asarray(rng.standard_normal((c, h, w, n)), jnp.float32)

    def lf(y1_, y2_, res_):
        o, _ = pm.fused_mlp_cmajor_dual(y1_, y2_, res_, *ps, False, True)
        return jnp.sum(o * r)

    def lr(y1_, y2_, res_):
        o, _ = pm._reference_mlp_dual(y1_, y2_, res_, *ps, emit_q=False)
        return jnp.sum(o * r)

    gf = jax.grad(lf, (0, 1, 2))(y1, y2, resh)
    gr = jax.grad(lr, (0, 1, 2))(y1, y2, resh)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_erf_poly_accuracy():
    import scipy.special as sp
    x = np.linspace(-4, 4, 2001).astype(np.float32)
    got = np.asarray(pm._erf_as(jnp.asarray(x)))
    # 1.5e-7 formula error + fp32 evaluation rounding
    err = np.abs(got - sp.erf(x)).max()
    assert err <= 1e-6, err


def test_fused_mlp_gate():
    # SLaK-T w1.3 stage dims at bf16: ALL four stages fit the 20 MiB
    # resident-weight VMEM budget (stage 4 = 2*998*3992*2 = 15.2 MiB).
    assert pm.fused_mlp_ok(124, 496, 2, True)
    assert pm.fused_mlp_ok(249, 996, 2, True)
    assert pm.fused_mlp_ok(499, 1996, 2, True)
    assert pm.fused_mlp_ok(998, 3992, 2, True)
    # Boundary: 2*c*4c*2 > 20 MiB for c > 1144 — SLaK-B w1.3 stage 4
    # (c=1331, 27.0 MiB) must fall back to the unfused path.
    assert pm.fused_mlp_ok(1144, 4576, 2, True)
    assert not pm.fused_mlp_ok(1145, 4580, 2, True)
    assert not pm.fused_mlp_ok(1331, 5324, 2, True)
    assert not pm.fused_mlp_ok(124, 496, 2, False)   # CPU


def test_fused_mlp_stage4_width(rng):
    """Stage-4 parity at the flagship width (C=998, C4=3992) — the shape
    the 20 MiB gate newly admits; tiny spatial keeps interpret-mode CPU
    time bounded."""
    n, h, w, c = 1, 2, 2, 998
    y = jnp.asarray(rng.standard_normal((n, h, w, c)) * 0.3, jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ps = _params(rng, c)
    got = pm.fused_mlp(y, res, *ps, True, True)
    want = pm._reference_mlp(y, res, *ps, add_residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
