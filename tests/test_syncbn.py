"""SyncBN fidelity: the shard_map train step over 8 devices must reproduce
a single-device full-batch step exactly — the torch SyncBatchNorm guarantee
(reference models/SLaK.py:19-28; SURVEY.md hard part #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from slak_tpu.models import slak as M
from slak_tpu.parallel import make_mesh, replicate, shard_batch
from slak_tpu.parallel.syncbn import make_syncbn_train_step
from slak_tpu.train import TrainConfig, create_train_state, make_train_step


def test_syncbn_matches_single_device():
    base = dict(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                conv_impl="xla", drop_path_rate=0.0)
    tcfg = TrainConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16))
    lr = jnp.asarray(np.full(10, 1e-3, np.float32))

    m1 = M.SLaK(M.SLaKConfig(**base))
    s1 = create_train_state(jax.random.PRNGKey(0), m1, tcfg)
    step1 = jax.jit(make_train_step(m1, tcfg, None, lr, None))
    s1, met1 = step1(s1, (x, y), jax.random.PRNGKey(5))

    mesh = make_mesh(8)
    m8 = M.SLaK(M.SLaKConfig(**base, bn_axis_name="data"))
    s8 = create_train_state(jax.random.PRNGKey(0), m8, tcfg)
    step8 = make_syncbn_train_step(m8, tcfg, None, lr, None, mesh)
    s8 = replicate(s8, mesh)
    s8, met8 = step8(s8, shard_batch((x, y), mesh), jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(met8["loss"]), float(met1["loss"]),
                               rtol=1e-4)
    bn1 = np.asarray(s1.model_state["stages"][0][0]["lk"]["LoRA1"]["bn"]["mean"])
    bn8 = np.asarray(jax.device_get(
        s8.model_state["stages"][0][0]["lk"]["LoRA1"]["bn"]["mean"]))
    np.testing.assert_allclose(bn8, bn1, rtol=1e-4, atol=1e-5)
    w1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    w8 = np.asarray(jax.device_get(jax.tree_util.tree_leaves(s8.params)[0]))
    np.testing.assert_allclose(w8, w1, rtol=1e-4, atol=1e-5)


def test_syncbn_banded_stats_matches_single_device():
    """SyncBN THROUGH the stats-fused banded path (interpret): per-shard
    kernel-emitted sums -> pmean in batch_norm_from_sums must reproduce
    the single-device full-batch running stats and loss — the production
    kernel config under DDP (reference main.py:374-376 + SyncBatchNorm)."""
    base = dict(depths=(1, 1, 1, 1), dims=(6, 8, 12, 16),
                kernel_size=(31, 9, 7, 5, 5), num_classes=10,
                conv_impl="banded", pallas_interpret=True,
                drop_path_rate=0.0)
    tcfg = TrainConfig()
    rng = np.random.default_rng(1)
    # stage-1 map 12x12 (H*W = 144 > 128): the 1-D banded kernel (not the
    # 2-D tiny-map route) computes the stats in its epilogue; later tiny
    # stages take the 2-D route with XLA stats — both paths covered
    x = jnp.asarray(rng.standard_normal((16, 48, 48, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 16))
    lr = jnp.asarray(np.full(10, 1e-3, np.float32))

    m1 = M.SLaK(M.SLaKConfig(**base))
    s1 = create_train_state(jax.random.PRNGKey(0), m1, tcfg)
    step1 = jax.jit(make_train_step(m1, tcfg, None, lr, None))
    s1, met1 = step1(s1, (x, y), jax.random.PRNGKey(5))

    mesh = make_mesh(8)
    m8 = M.SLaK(M.SLaKConfig(**base, bn_axis_name="data"))
    s8 = create_train_state(jax.random.PRNGKey(0), m8, tcfg)
    step8 = make_syncbn_train_step(m8, tcfg, None, lr, None, mesh)
    s8 = replicate(s8, mesh)
    s8, met8 = step8(s8, shard_batch((x, y), mesh), jax.random.PRNGKey(5))

    np.testing.assert_allclose(float(met8["loss"]), float(met1["loss"]),
                               rtol=1e-4)
    st1 = s1.model_state["stages"][0][0]["lk"]["LoRA1"]["bn"]
    st8 = jax.device_get(s8.model_state["stages"][0][0]["lk"]["LoRA1"]["bn"])
    np.testing.assert_allclose(np.asarray(st8["mean"]),
                               np.asarray(st1["mean"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st8["var"]),
                               np.asarray(st1["var"]), rtol=1e-4, atol=1e-5)
