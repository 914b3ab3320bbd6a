"""Training-layer tests: AdamW vs torch golden, schedule parity, layer-decay
map, sparse EMA golden vs a port of model_sema.py, end-to-end train_step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from slak_tpu.models import slak as M
from slak_tpu.sparsity import MaskConfig
from slak_tpu.train import (
    AdamWConfig, TrainConfig, adamw_init, adamw_update,
    cosine_schedule_array, create_train_state, layer_decay_scales,
    layer_id_for_param, losses, make_eval_step, make_train_step, param_groups,
)
from slak_tpu.train.ema import ema_init, ema_update


def test_adamw_matches_torch(rng):
    """Few steps of our AdamW == torch.optim.AdamW given identical grads."""
    w0 = rng.standard_normal((8, 16)).astype(np.float32)
    b0 = rng.standard_normal((16,)).astype(np.float32)
    lr, wd = 1e-2, 0.05

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.AdamW(
        [{"params": [wt], "weight_decay": wd},
         {"params": [bt], "weight_decay": 0.0}], lr=lr)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    st = adamw_init(params)
    wd_mask = {"w": 1.0, "b": 0.0}
    lr_scale = {"w": 1.0, "b": 1.0}

    for i in range(5):
        gw = rng.standard_normal((8, 16)).astype(np.float32)
        gb = rng.standard_normal((16,)).astype(np.float32)
        wt.grad = torch.from_numpy(gw.copy())
        bt.grad = torch.from_numpy(gb.copy())
        opt.step()
        params, st, _ = adamw_update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, st, params,
            jnp.float32(lr), jnp.float32(wd), wd_mask, lr_scale)

    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), bt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def _numpy_adan(params, grads_seq, lr, wd, betas=(0.98, 0.92, 0.99),
                eps=1e-8):
    """Independent numpy statement of the Adan algorithm (arXiv 2208.06677
    Alg. 1 with bias correction + proximal decoupled weight decay — the
    semantics the fork's timm1/optim/adan.py implements)."""
    b1, b2, b3 = betas
    p = {k: v.copy() for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(vv) for k, vv in params.items()}
    n = {k: np.zeros_like(vv) for k, vv in params.items()}
    prev = None
    for t, grads in enumerate(grads_seq, start=1):
        bc1, bc2, bc3 = 1 - b1 ** t, 1 - b2 ** t, 1 - b3 ** t
        for k, g in grads.items():
            gd = g - (prev[k] if prev is not None else g)
            m[k] = b1 * m[k] + (1 - b1) * g
            v[k] = b2 * v[k] + (1 - b2) * gd
            u = g + b2 * gd
            n[k] = b3 * n[k] + (1 - b3) * u * u
            eta = 1.0 / (np.sqrt(n[k] / bc3) + eps)
            step = eta * (m[k] / bc1 + b2 * v[k] / bc2)
            wd_k = wd if k == "w" else 0.0
            p[k] = (p[k] - lr * step) / (1.0 + lr * wd_k)
        prev = grads
    return p


def test_adan_matches_paper_reference(rng):
    """Few steps of our Adan == an independent numpy statement of the
    published algorithm (grad-difference momentum, three-EMA update,
    proximal weight decay) given identical grads."""
    from slak_tpu.train.optim import adan_init, adan_update
    w0 = rng.standard_normal((8, 16)).astype(np.float32)
    b0 = rng.standard_normal((16,)).astype(np.float32)
    lr, wd = 1e-2, 0.05
    grads_seq = [{"w": rng.standard_normal((8, 16)).astype(np.float32),
                  "b": rng.standard_normal((16,)).astype(np.float32)}
                 for _ in range(5)]

    want = _numpy_adan({"w": w0, "b": b0}, grads_seq, lr, wd)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    st = adan_init(params)
    for grads in grads_seq:
        params, st, gnorm = adan_update(
            {k: jnp.asarray(g) for k, g in grads.items()}, st, params,
            jnp.float32(lr), jnp.float32(wd), {"w": 1.0, "b": 0.0},
            {"w": 1.0, "b": 1.0})
        assert np.isfinite(float(gnorm))

    np.testing.assert_allclose(np.asarray(params["w"]), want["w"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), want["b"],
                               rtol=1e-5, atol=1e-6)


def test_adan_clip_grad():
    """clip_grad scales the whole grad tree to the given global norm
    before the update (same contract as AdamW), and the reported gnorm
    is the pre-clip norm."""
    from slak_tpu.train.optim import AdanConfig, adan_init, adan_update
    p = {"w": jnp.ones((4,), jnp.float32)}
    g = {"w": jnp.full((4,), 10.0, jnp.float32)}   # norm 20
    st = adan_init(p)
    _, _, gn = adan_update(g, st, p, jnp.float32(1e-2), jnp.float32(0.0),
                           {"w": 1.0}, {"w": 1.0},
                           AdanConfig(clip_grad=1.0))
    assert float(gn) == pytest.approx(20.0, rel=1e-5)
    # clipped update must equal the unclipped update with g/20 (first
    # step is scale-invariant in g only through pre_grad seeding; compare
    # against explicitly scaled grads)
    p1, _, _ = adan_update(g, adan_init(p), p, jnp.float32(1e-2),
                           jnp.float32(0.0), {"w": 1.0}, {"w": 1.0},
                           AdanConfig(clip_grad=1.0))
    g_scaled = {"w": g["w"] / 20.0}
    p2, _, _ = adan_update(g_scaled, adan_init(p), p, jnp.float32(1e-2),
                           jnp.float32(0.0), {"w": 1.0}, {"w": 1.0},
                           AdanConfig())
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               rtol=1e-6)


def test_train_step_with_adan(rng):
    """End-to-end engine wiring: TrainConfig(opt='adan') trains the debug
    model (loss finite and decreasing) and adam_momentum serves the
    sparsity engine from the Adan state (growth='momentum' path)."""
    from slak_tpu.models import create_model
    from slak_tpu.sparsity import MaskConfig
    model = create_model("SLaK_debug", kernel_size=(13, 11, 9, 7, 5),
                         decom=True, branch_bn=True, num_classes=10,
                         drop_path_rate=0.0, conv_impl="xla")
    cfg = TrainConfig(opt="adan", clip_grad=5.0, smoothing=0.1,
                      prune_t_max=10)
    mask_cfg = MaskConfig(sparsity=0.3, sparse_init="uniform",
                          growth_mode="momentum", update_frequency=2)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg, mask_cfg)
    assert "pre_grad" in state.opt_state           # adan state, not adamw
    step = jax.jit(make_train_step(
        model, cfg, mask_cfg,
        jnp.full((10,), 1e-3, jnp.float32), None))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8,)), jnp.int32)
    losses_seen = []
    for i in range(4):
        state, metrics = step(state, (x, y), jax.random.PRNGKey(i))
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses_seen)
    assert losses_seen[-1] < losses_seen[0]


def test_cosine_schedule_matches_reference():
    """Clone of utils.py:428-445 math."""
    sched = cosine_schedule_array(4e-3, 1e-6, epochs=10, niter_per_ep=100,
                                  warmup_epochs=2)
    assert len(sched) == 1000
    # warmup: linear 0 -> base over 200 iters
    np.testing.assert_allclose(sched[:200],
                               np.linspace(0, 4e-3, 200), rtol=1e-6)
    assert sched[200] == pytest.approx(4e-3, rel=1e-5)
    assert sched[-1] == pytest.approx(
        1e-6 + 0.5 * (4e-3 - 1e-6) * (1 + np.cos(np.pi * 799 / 800)),
        rel=1e-5)


def test_layer_decay_map():
    """optim_factory.py:32-60 bucket map on our param paths."""
    assert layer_id_for_param("downsample.0.conv.w") == 0
    assert layer_id_for_param("downsample.1.conv.w") == 2
    assert layer_id_for_param("downsample.2.conv.w") == 3
    assert layer_id_for_param("downsample.3.conv.w") == 12
    assert layer_id_for_param("stages.0.1.pwconv1.w") == 1
    assert layer_id_for_param("stages.1.2.lk.LoRA1.w") == 2
    assert layer_id_for_param("stages.2.0.pwconv1.w") == 3
    assert layer_id_for_param("stages.2.8.pwconv1.w") == 5
    assert layer_id_for_param("stages.2.26.pwconv1.w") == 11
    assert layer_id_for_param("stages.3.2.pwconv2.w") == 12
    assert layer_id_for_param("head.w") == 13
    assert layer_id_for_param("norm.scale") == 13
    scales = layer_decay_scales(0.7)
    assert len(scales) == 14
    assert scales[13] == pytest.approx(1.0)
    assert scales[0] == pytest.approx(0.7 ** 13)


def test_param_groups_wd_mask():
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(7, 7, 7, 7, 5), num_classes=10)
    params, _ = M.init(jax.random.PRNGKey(0), cfg)
    wd_mask, lr_scale = param_groups(params, layer_decay=0.7)
    flat = jax.tree_util.tree_flatten_with_path(wd_mask)[0]
    for path, v in flat:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if name.endswith(".b") or "bias" in name or "scale" in name \
                or "gamma" in name:
            assert v == 0.0, name


def torch_sparse_ema(ema_v, model_v, mask, decay):
    """Port of model_sema.py:81-91."""
    new_diff = (((ema_v != 0).astype(np.uint8) ^ mask.astype(np.uint8))
                & mask.astype(np.uint8)).astype(np.float32)
    return (ema_v * decay + model_v * (1 - decay)) * mask \
        + new_diff * decay * model_v


def test_sparse_ema_matches_reference(rng):
    decay = 0.9
    ema = rng.standard_normal((16, 16)).astype(np.float32)
    model = rng.standard_normal((16, 16)).astype(np.float32)
    mask = (rng.random((16, 16)) < 0.5).astype(np.float32)
    ema = ema * (rng.random((16, 16)) < 0.7)  # some zeros -> "fresh" slots

    got = ema_update({"w": jnp.asarray(ema)}, {"w": jnp.asarray(model)},
                     decay, masks={"w": jnp.asarray(mask)})
    want = torch_sparse_ema(ema, model, mask, decay)
    np.testing.assert_allclose(np.asarray(got["w"]), want, rtol=1e-5,
                               atol=1e-6)
    # unmasked leaf: plain EMA
    got2 = ema_update({"w": jnp.asarray(ema)}, {"w": jnp.asarray(model)},
                      decay)
    np.testing.assert_allclose(np.asarray(got2["w"]),
                               decay * ema + (1 - decay) * model, rtol=1e-5)


def test_losses_match_torch(rng):
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 8)
    lt = torch.from_numpy(logits)
    yt = torch.from_numpy(labels)

    got = float(losses.label_smoothing_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), 0.1))
    want = float(torch.nn.functional.cross_entropy(lt, yt, label_smoothing=0.1))
    assert got == pytest.approx(want, rel=1e-5)

    soft = rng.random((8, 10)).astype(np.float32)
    soft /= soft.sum(1, keepdims=True)
    got = float(losses.soft_target_cross_entropy(jnp.asarray(logits),
                                                 jnp.asarray(soft)))
    want = float(torch.sum(-torch.from_numpy(soft)
                           * torch.log_softmax(lt, dim=-1), dim=-1).mean())
    assert got == pytest.approx(want, rel=1e-5)

    a1 = float(losses.accuracy_topk(jnp.asarray(logits), jnp.asarray(labels), 1))
    want1 = float((lt.argmax(-1) == yt).float().mean())
    assert a1 == pytest.approx(want1)


def _tiny_model():
    cfg = M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                       kernel_size=(13, 11, 9, 7, 5), num_classes=10,
                       conv_impl="xla", drop_path_rate=0.1)
    return M.SLaK(cfg)


def _batch(rng, n=8):
    x = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, n)
    return jnp.asarray(x), jnp.asarray(y)


def test_train_step_dense(rng):
    model = _tiny_model()
    tcfg = TrainConfig(update_freq=1, ema_decay=0.99, layer_decay=0.9)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)
    lr = jnp.asarray(cosine_schedule_array(1e-2, 1e-4, 1, 50))
    wd = jnp.asarray(cosine_schedule_array(0.05, 0.05, 1, 50))
    step = jax.jit(make_train_step(model, tcfg, None, lr, wd))
    batch = _batch(rng)
    losses_seen = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses_seen.append(float(metrics["loss"]))
    assert losses_seen[-1] < losses_seen[0]
    assert int(state.step) == 5
    assert state.ema_params is not None


def test_train_step_sparse_dst(rng):
    model = _tiny_model()
    mcfg = MaskConfig(sparsity=0.4, sparse_init="uniform",
                      growth_mode="gradient", prune_rate=0.5,
                      update_frequency=2)
    tcfg = TrainConfig(update_freq=1, ema_decay=0.99, prune_t_max=20)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, mcfg)
    lr = jnp.asarray(cosine_schedule_array(1e-2, 1e-4, 1, 50))
    step = jax.jit(make_train_step(model, tcfg, mcfg, lr, None))
    batch = _batch(rng)
    nnz0 = sum(float(jnp.sum(m)) for m in state.mask_state.masks.values())
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    nnz1 = sum(float(jnp.sum(m)) for m in state.mask_state.masks.values())
    # At 32x32 test resolution the stage-3/4 maps are 1x1-2x2, so most
    # large-kernel taps only touch padding -> exactly-zero grads -> growth
    # regrows into zero-score ties (the reference drifts identically there).
    # On real 224x224 shapes grads are dense and growth is exact.
    assert abs(nnz1 - nnz0) / nnz0 < 0.05
    # all masked weights are zero after the step
    from slak_tpu.sparsity import select_maskable
    sel = select_maskable(state.tree_params())
    for n, m in state.mask_state.masks.items():
        assert float(jnp.sum(jnp.abs(sel[n]) * (1 - m))) == 0.0


def test_train_step_grad_accum(rng):
    model = _tiny_model()
    tcfg = TrainConfig(update_freq=2)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)
    lr = jnp.asarray(np.full(50, 1e-2, np.float32))
    step = jax.jit(make_train_step(model, tcfg, None, lr, None))
    x, y = _batch(rng, n=8)  # 2 micro-batches of 4
    state, metrics = step(state, (x, y), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_eval_step(rng):
    model = _tiny_model()
    tcfg = TrainConfig()
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)
    ev = jax.jit(make_eval_step(model))
    m = ev(state.tree_params(), state.model_state, _batch(rng))
    assert 0.0 <= float(m["acc1"]) <= 1.0
    assert float(m["acc5"]) >= float(m["acc1"])


def test_train_step_data_parallel(rng):
    """DP over the 8-device CPU mesh: batch sharded, params replicated."""
    from slak_tpu.parallel import make_mesh, shard_batch, replicate

    model = _tiny_model()
    tcfg = TrainConfig()
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)
    lr = jnp.asarray(np.full(50, 1e-2, np.float32))
    step = jax.jit(make_train_step(model, tcfg, None, lr, None))

    x, y = _batch(rng, n=16)
    # single-device result
    s1, m1 = step(state, (x, y), jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_batch((x, y), mesh)
    s8, m8 = step(state_r, batch_s, jax.random.PRNGKey(0))
    # same math, just sharded: losses match closely
    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    w1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    w8 = np.asarray(jax.tree_util.tree_leaves(s8.params)[0])
    np.testing.assert_allclose(w1, w8, rtol=1e-4, atol=1e-5)
