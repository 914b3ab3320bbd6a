"""Pallas fast paths under data parallelism — the reference's production
configuration is DDP *wrapping the custom CUDA kernel*
(``/root/reference/main.py:374-376`` +
``depthwise_conv2d_implicit_gemm.py:14-66``); the TPU equivalents must
therefore compose with batch sharding. These tests run the banded custom
VJP and the fused LN+MLP under (a) ``shard_map`` over the data axis and
(b) plain-jit batch sharding on the 8-device CPU mesh, asserting losses
and grads match the single-device path. Interpret mode lifts the %128
lane-block constraint (``pallas_banded.py`` dwconv_banded_cmajor); the
same code paths run compiled on hardware (``tools/tpu_checks.py`` +
``__graft_entry__.dryrun_multichip``'s banded variant)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slak_tpu.ops.pallas_banded import depthwise_conv2d_banded
from slak_tpu.ops.pallas_mlp import fused_mlp


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("data",))


def _rel(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))


# --------------------------------------------------------------------------
# banded conv custom VJP
# --------------------------------------------------------------------------


def _conv_inputs(rng, n=16, h=10, w=10, c=5, kh=9, kw=3):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    return x, wt, r


def _conv_loss(x, wt, r):
    return jnp.sum(depthwise_conv2d_banded(x, wt, True) * r)


def test_banded_vjp_shard_map(rng):
    x, wt, r = _conv_inputs(rng)
    l0, (dx0, dw0) = jax.jit(
        jax.value_and_grad(_conv_loss, (0, 1)))(x, wt, r)

    def local(x, wt, r):
        l, (dx, dw) = jax.value_and_grad(_conv_loss, (0, 1))(x, wt, r)
        # DDP semantics: grad all-reduce for the replicated weights, the
        # loss summed over the global batch; dx stays shard-local.
        return lax.psum(l, "data"), dx, lax.psum(dw, "data")

    mesh = _mesh()
    f = jax.jit(shard_map(local, mesh=mesh,
                          in_specs=(P("data"), P(), P("data")),
                          out_specs=(P(), P("data"), P()),
                          check_vma=False))
    l1, dx1, dw1 = f(x, wt, r)
    assert _rel(l1, l0) < 1e-5
    assert _rel(dx1, dx0) < 1e-5
    assert _rel(dw1, dw0) < 1e-5


def test_banded_vjp_jit_batch_sharded(rng):
    x, wt, r = _conv_inputs(rng)
    l0, (dx0, dw0) = jax.jit(
        jax.value_and_grad(_conv_loss, (0, 1)))(x, wt, r)

    mesh = _mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    rs = jax.device_put(r, NamedSharding(mesh, P("data")))
    ws = jax.device_put(wt, NamedSharding(mesh, P()))
    l1, (dx1, dw1) = jax.jit(
        jax.value_and_grad(_conv_loss, (0, 1)))(xs, ws, rs)
    assert _rel(l1, l0) < 1e-5
    assert _rel(dx1, dx0) < 1e-5
    assert _rel(dw1, dw0) < 1e-5


def test_banded2d_vjp_shard_map(rng):
    # tiny map -> the 2-D Toeplitz regime (use_banded2d)
    x, wt, r = _conv_inputs(rng, n=8, h=6, w=6, c=3, kh=7, kw=5)
    l0, (dx0, dw0) = jax.jit(
        jax.value_and_grad(_conv_loss, (0, 1)))(x, wt, r)

    def local(x, wt, r):
        l, (dx, dw) = jax.value_and_grad(_conv_loss, (0, 1))(x, wt, r)
        return lax.psum(l, "data"), dx, lax.psum(dw, "data")

    mesh = _mesh()
    f = jax.jit(shard_map(local, mesh=mesh,
                          in_specs=(P("data"), P(), P("data")),
                          out_specs=(P(), P("data"), P()),
                          check_vma=False))
    l1, dx1, dw1 = f(x, wt, r)
    assert _rel(l1, l0) < 1e-5
    assert _rel(dx1, dx0) < 1e-5
    assert _rel(dw1, dw0) < 1e-5


# --------------------------------------------------------------------------
# fused LN+MLP
# --------------------------------------------------------------------------


def _mlp_inputs(rng, n=16, h=4, w=4, c=8):
    c4 = 4 * c
    y = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ps = (jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),
          jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
          jnp.asarray(rng.standard_normal((c, c4)) * 0.05, jnp.float32),
          jnp.asarray(rng.standard_normal(c4) * 0.1, jnp.float32),
          jnp.asarray(rng.standard_normal((c4, c)) * 0.05, jnp.float32),
          jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
          jnp.asarray(np.full(c, 0.5), jnp.float32))
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    return y, res, ps, r


def _mlp_loss(y, res, w1, w2, rest, r):
    ln_s, ln_b, b1, b2, gamma = rest
    return jnp.sum(fused_mlp(y, res, ln_s, ln_b, w1, b1, w2, b2, gamma,
                             jnp.zeros_like(gamma),
                             True, True) * r)


def test_fused_mlp_shard_map(rng):
    y, res, ps, r = _mlp_inputs(rng)
    ln_s, ln_b, w1, b1, w2, b2, gamma = ps
    rest = (ln_s, ln_b, b1, b2, gamma)
    vg = jax.value_and_grad(_mlp_loss, (0, 2, 3))
    l0, (dy0, dw10, dw20) = jax.jit(vg)(y, res, w1, w2, rest, r)

    def local(y, res, w1, w2, rest, r):
        l, (dy, dw1, dw2) = vg(y, res, w1, w2, rest, r)
        return (lax.psum(l, "data"), dy,
                lax.psum(dw1, "data"), lax.psum(dw2, "data"))

    mesh = _mesh()
    f = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P(), P(), P("data")),
        out_specs=(P(), P("data"), P(), P()),
        check_vma=False))
    l1, dy1, dw11, dw21 = f(y, res, w1, w2, rest, r)
    assert _rel(l1, l0) < 1e-5
    assert _rel(dy1, dy0) < 1e-5
    assert _rel(dw11, dw10) < 1e-5
    assert _rel(dw21, dw20) < 1e-5


def test_fused_mlp_jit_batch_sharded(rng):
    y, res, ps, r = _mlp_inputs(rng)
    ln_s, ln_b, w1, b1, w2, b2, gamma = ps
    rest = (ln_s, ln_b, b1, b2, gamma)
    vg = jax.value_and_grad(_mlp_loss, (0, 2, 3))
    l0, (dy0, dw10, dw20) = jax.jit(vg)(y, res, w1, w2, rest, r)

    mesh = _mesh()
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))  # noqa
    rep = lambda a: jax.device_put(a, NamedSharding(mesh, P()))       # noqa
    l1, (dy1, dw11, dw21) = jax.jit(vg)(
        sh(y), sh(res), rep(w1), rep(w2),
        jax.tree_util.tree_map(rep, rest), sh(r))
    assert _rel(l1, l0) < 1e-5
    assert _rel(dy1, dy0) < 1e-5
    assert _rel(dw11, dw10) < 1e-5
    assert _rel(dw21, dw20) < 1e-5


# --------------------------------------------------------------------------
# full block routing under the mesh (model layer drives the kernels)
# --------------------------------------------------------------------------


def test_model_banded_routing_under_jit_sharding(rng):
    """SLaK debug model with conv_impl='banded' + interpret: the model-layer
    routing (banded convs + fused MLP) under plain-jit batch sharding must
    match the unsharded run."""
    import dataclasses

    from slak_tpu.models import create_model
    from slak_tpu.models.slak import apply as slak_apply

    m = create_model("SLaK_debug", conv_impl="banded", num_classes=10)
    cfg = dataclasses.replace(m.cfg, pallas_interpret=True)
    params, state = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)

    fwd = jax.jit(functools.partial(
        lambda p, s, x: slak_apply(p, s, x, cfg=cfg, train=False)[0]))
    l0 = fwd(params, state, x)

    mesh = _mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    ss = jax.device_put(state, NamedSharding(mesh, P()))
    l1 = fwd(ps, ss, xs)
    assert _rel(l1, l0) < 1e-5
