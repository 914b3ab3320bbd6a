"""Tensor (channel) parallel inference (parallel/tp.py): the 8-way
channel-sharded forward must reproduce single-device logits. This is a
capability BEYOND the reference (DP-only, main.py:374-376)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slak_tpu.models import slak as M
from slak_tpu.parallel import make_mesh
from slak_tpu.parallel.tp import AXIS, make_tp_apply


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _jitter_state(state, rng):
    return jax.tree_util.tree_map(
        lambda l: l + 0.05 * jnp.abs(jnp.asarray(
            rng.standard_normal(l.shape).astype(np.float32))), state)


@pytest.mark.parametrize("decom", [True, False])
def test_tp_matches_single_device(rng, decom):
    cfg = M.SLaKConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64),
                       kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                       decom=decom, branch_bn=True, conv_impl="xla",
                       drop_path_rate=0.0)
    model = M.SLaK(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    state = _jitter_state(state, rng)  # make the BN folds non-trivial

    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    want, _ = model.apply(params, state, x, train=False)

    mesh = make_mesh(8, axis_name=AXIS)
    got = make_tp_apply(model, mesh)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_flagship_widths(rng):
    """The flagship SLaK-T width_factor=1.3 stage dims are 124/249/499/998
    — 249 odd, 499 prime, none divisible by 8. make_tp_apply must serve
    them via exact zero-padding (pad_for_tp) and still reproduce the
    single-device logits."""
    cfg = M.SLaKConfig(depths=(1, 1, 2, 1), dims=(96, 192, 384, 768),
                       width_factor=1.3, kernel_size=(13, 11, 9, 7, 5),
                       num_classes=10, decom=True, branch_bn=True,
                       conv_impl="xla", drop_path_rate=0.0)
    assert cfg.widened_dims == (124, 249, 499, 998)
    model = M.SLaK(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    state = _jitter_state(state, rng)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want, _ = model.apply(params, state, x, train=False)

    mesh = make_mesh(8, axis_name=AXIS)
    got = make_tp_apply(model, mesh)(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_tp_convnext_mode(rng):
    """ConvNeXt mode (no decom, no branch BN, conv bias, small>=K kills
    the small branch) through the channel-sharded forward."""
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                       kernel_size=(7, 7, 7, 7, 100), num_classes=10,
                       decom=False, branch_bn=False, conv_impl="xla",
                       drop_path_rate=0.0)
    model = M.SLaK(cfg)
    params, state = model.init(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want, _ = model.apply(params, state, x, train=False)
    got = make_tp_apply(model, make_mesh(8, axis_name=AXIS))(params, state, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
