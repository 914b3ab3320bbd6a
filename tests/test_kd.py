"""KD tests: NKD/KD/SmoothL1 golden vs direct torch ports of the reference
formulas, MGD mechanics, and an end-to-end distillation step (SLaK teacher ->
ConvNeXt student, the L2S headline config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slak_tpu.kd import (KDConfig, init_kd_params, kd_loss, kd_opt_init,
                         make_kd_train_step, make_teacher_apply, mgd_init,
                         mgd_loss, nkd_loss, smooth_l1)
from slak_tpu.models import slak as M
from slak_tpu.train import TrainConfig, create_train_state


def torch_nkd(logit_s, logit_t, label, temp=1.0, alpha=1.0):
    """Direct port of engine_kd.py:30-63."""
    logit_s, logit_t = torch.from_numpy(logit_s), torch.from_numpy(logit_t)
    label = torch.from_numpy(label).view(-1, 1)
    y_i = F.softmax(logit_s, dim=1)
    t_i = F.softmax(logit_t, dim=1)
    y_t = torch.gather(y_i, 1, label)
    w_t = torch.gather(t_i, 1, label).detach()
    mask = torch.zeros_like(logit_s).scatter_(1, label, 1).bool()
    logit_s = logit_s - 1000 * mask
    logit_t = logit_t - 1000 * mask
    T_i = F.softmax(logit_t / temp, dim=1)
    S_i = F.softmax(logit_s / temp, dim=1)
    T_t = torch.gather(T_i, 1, label)
    S_t = torch.gather(S_i, 1, label)
    np_t = T_i / (1 - T_t)
    np_s = S_i / (1 - S_t)
    np_t[T_i == T_t] = 0
    np_s[T_i == T_t] = 1
    soft_loss = -(w_t * torch.log(y_t)).mean()
    dist = (np_t * torch.log(np_s)).sum(dim=1).mean()
    return float(soft_loss - alpha * (temp ** 2) * dist)


def test_nkd_matches_reference(rng):
    ls = rng.standard_normal((8, 20)).astype(np.float32) * 3
    lt = rng.standard_normal((8, 20)).astype(np.float32) * 3
    y = rng.integers(0, 20, 8)
    for temp in (1.0, 4.0):
        got = float(nkd_loss(jnp.asarray(ls), jnp.asarray(lt), jnp.asarray(y),
                             temp=temp))
        want = torch_nkd(ls, lt, y, temp=temp)
        assert got == pytest.approx(want, rel=1e-4)


def test_kd_matches_reference(rng):
    ls = rng.standard_normal((8, 20)).astype(np.float32) * 2
    lt = rng.standard_normal((8, 20)).astype(np.float32) * 2
    y = rng.integers(0, 20, 8)
    T, alpha = 2.0, 0.1
    got = float(kd_loss(jnp.asarray(ls), jnp.asarray(y), jnp.asarray(lt),
                        T, False, alpha))
    lst, ltt = torch.from_numpy(ls), torch.from_numpy(lt)
    yt = torch.from_numpy(y)
    want = float(F.kl_div(F.log_softmax(lst / T, 1), F.softmax(ltt / T, 1),
                          reduction="batchmean") * T * T * alpha
                 + F.cross_entropy(lst, yt) * (1 - alpha))
    assert got == pytest.approx(want, rel=1e-4)
    # hard variant
    got_h = float(kd_loss(jnp.asarray(ls), jnp.asarray(y), jnp.asarray(lt),
                          T, True))
    want_h = float(0.5 * F.cross_entropy(lst, yt)
                   + 0.5 * F.cross_entropy(lst, ltt.max(1)[1]))
    assert got_h == pytest.approx(want_h, rel=1e-4)


def test_smooth_l1_matches_torch(rng):
    a = rng.standard_normal((4, 7, 7, 16)).astype(np.float32) * 5
    b = rng.standard_normal((4, 7, 7, 16)).astype(np.float32) * 5
    got = float(smooth_l1(jnp.asarray(a), jnp.asarray(b), beta=2.0))
    want = float(torch.nn.SmoothL1Loss(beta=2.0)(torch.from_numpy(a),
                                                 torch.from_numpy(b)))
    assert got == pytest.approx(want, rel=1e-5)


def test_mgd_loss_mechanics(rng):
    p = mgd_init(jax.random.PRNGKey(0), 16, 24)
    assert "align" in p  # channel mismatch -> align conv
    fs = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    ft = jnp.asarray(rng.standard_normal((2, 8, 8, 24)).astype(np.float32))
    loss = mgd_loss(jax.random.PRNGKey(1), p, fs, ft)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # grads flow into the generator
    g = jax.grad(lambda p: mgd_loss(jax.random.PRNGKey(1), p, fs, ft))(p)
    assert float(jnp.abs(g["gen1"]["w"]).sum()) > 0


@pytest.mark.parametrize("distill_type", ["NKD", "KD", "FD+NKD", "MGD",
                                          "None"])
def test_kd_train_step(rng, distill_type):
    """L2S: SLaK-ish teacher -> ConvNeXt-mode student, one jitted step."""
    teacher = M.SLaK(M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 40),
                                  kernel_size=(13, 11, 9, 7, 5),
                                  num_classes=10, conv_impl="xla"))
    student = M.SLaK(M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                                  kernel_size=(7, 7, 7, 7, 100), decom=False,
                                  branch_bn=False, num_classes=10,
                                  conv_impl="xla"))
    tp, ts = teacher.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(ema_decay=0.99)
    state = create_train_state(jax.random.PRNGKey(1), student, tcfg)

    kd_cfg = KDConfig(distill_type=distill_type)
    kd_params = init_kd_params(jax.random.PRNGKey(2), kd_cfg, 32, 40)
    kd_opt = kd_opt_init(kd_params)

    teacher_apply = make_teacher_apply(teacher, tp, ts)
    lr = jnp.asarray(np.full(50, 1e-3, np.float32))
    step = jax.jit(make_kd_train_step(student, teacher_apply, kd_cfg, tcfg,
                                      None, lr, None))

    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 4))
    losses = []
    for i in range(3):
        state, kd_params, kd_opt, m = step(state, kd_params, kd_opt, (x, y),
                                           jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # student learns
    if distill_type == "FD+NKD":
        assert "fd_proj" in kd_params  # 32 != 40 channels -> projection


def test_kd_train_step_mesh(rng):
    """KD step under an 8-device data-parallel mesh (reference runs KD
    under DDP, main_KD.py): batch-sharded inputs, replicated state, loss
    matches the single-device step."""
    from slak_tpu.parallel import make_mesh, replicate, shard_batch

    teacher = M.SLaK(M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 40),
                                  kernel_size=(13, 11, 9, 7, 5),
                                  num_classes=10, conv_impl="xla"))
    student = M.SLaK(M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                                  kernel_size=(7, 7, 7, 7, 100), decom=False,
                                  branch_bn=False, num_classes=10,
                                  conv_impl="xla"))
    tp, ts = teacher.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(ema_decay=0.99)
    state0 = create_train_state(jax.random.PRNGKey(1), student, tcfg)
    kd_cfg = KDConfig(distill_type="NKD")
    kd_params0 = init_kd_params(jax.random.PRNGKey(2), kd_cfg, 32, 40)
    kd_opt0 = kd_opt_init(kd_params0)
    teacher_apply = make_teacher_apply(teacher, tp, ts)
    lr = jnp.asarray(np.full(50, 1e-3, np.float32))
    step = jax.jit(make_kd_train_step(student, teacher_apply, kd_cfg, tcfg,
                                      None, lr, None))

    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 8))

    _, _, _, m0 = step(state0, kd_params0, kd_opt0, (x, y),
                       jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    state = replicate(state0, mesh)
    kd_params = replicate(kd_params0, mesh)
    kd_opt = replicate(kd_opt0, mesh)
    batch = shard_batch((x, y), mesh)
    state, kd_params, kd_opt, m = step(state, kd_params, kd_opt, batch,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(m0["loss"]),
                               rtol=2e-5)
