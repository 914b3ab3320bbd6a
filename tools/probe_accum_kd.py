"""Measure the grad-accumulated and KD train steps on TPU (VERDICT r4 #6).

The recipe trains at effective batch 4096 via ``--update_freq`` (reference
engine.py:33,69-88; 32 chips x bs128); the KD recipe adds a frozen teacher
forward to every step (reference engine_kd.py:86-277). Both are full-step
walls with a scalar fetch — the probe_model_ab.py instrument.

Usage:
    python tools/probe_accum_kd.py accum   # bs128 x update_freq 4
    python tools/probe_accum_kd.py kd      # NKD, ViT-Small teacher
    python tools/probe_accum_kd.py both    # (default)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BS = 128


def _flagship(**kw):
    from slak_tpu.models import create_model
    return create_model(
        "SLaK_tiny", kernel_size=(51, 49, 47, 13, 5), decom=True,
        branch_bn=True, width_factor=1.3, drop_path_rate=0.1,
        conv_impl="auto", mlp_impl="auto", **kw)


def _time_steps(run, fresh_x, n=5):
    ts = []
    for i in range(n):
        x = fresh_x()
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        run(x, i)
        ts.append(time.perf_counter() - t0)
    return 1e3 * sorted(ts)[len(ts) // 2], ts


def probe_accum(uf: int = 4):
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)
    rng = np.random.default_rng(0)
    n = BS * uf
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, n)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))
    model = _flagship()
    tc = TrainConfig(update_freq=uf, ema_decay=0.9999,
                     compute_dtype=jnp.bfloat16, prune_t_max=1000,
                     pack_params=True)
    mc = MaskConfig(sparsity=0.4, sparse_init="uniform", growth_mode="random",
                    prune_rate=0.5, update_frequency=100)
    st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
    step = jax.jit(make_train_step(model, tc, mc, lr, None),
                   donate_argnums=0)
    x0 = jnp.asarray(rng.standard_normal((n, 224, 224, 3)), jnp.bfloat16)
    box = [st]
    st2, m = step(box[0], (x0, y), jax.random.PRNGKey(1))
    box[0] = st2
    float(m["loss"])

    def run(x, i):
        box[0], m = step(box[0], (x, y), jax.random.PRNGKey(2 + i))
        float(m["loss"])

    ms, ts = _time_steps(
        run, lambda: jnp.asarray(rng.standard_normal((n, 224, 224, 3)),
                                 jnp.bfloat16))
    print(f"accum uf={uf} bs{BS}x{uf}: {ms:7.1f} ms  "
          f"{n/(ms/1e3):5.0f} img/s "
          f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
          flush=True)


def probe_kd():
    from slak_tpu.kd import (KDConfig, init_kd_params, kd_opt_init,
                             make_kd_train_step)
    from slak_tpu.models import vit as V
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state)
    rng = np.random.default_rng(0)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, BS)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))
    student = _flagship()
    teacher = V.vit_small_patch16_224(num_classes=1000)
    t_params = teacher.init(jax.random.PRNGKey(5))
    teacher_apply = teacher.teacher_apply(t_params)
    kd_cfg = KDConfig(distill_type="NKD")
    tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                     compute_dtype=jnp.bfloat16, prune_t_max=1000,
                     pack_params=True)
    mc = MaskConfig(sparsity=0.4, sparse_init="uniform", growth_mode="random",
                    prune_rate=0.5, update_frequency=100)
    st = create_train_state(jax.random.PRNGKey(0), student, tc, mc)
    kd_params = init_kd_params(jax.random.PRNGKey(6), kd_cfg,
                               student.cfg.widened_dims[-1],
                               teacher.cfg.embed_dim)
    kd_opt = kd_opt_init(kd_params)
    step = jax.jit(make_kd_train_step(student, teacher_apply, kd_cfg, tc,
                                      mc, lr, None), donate_argnums=0)
    x0 = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)), jnp.bfloat16)
    box = [st, kd_params, kd_opt]
    box[0], box[1], box[2], m = step(box[0], box[1], box[2], (x0, y),
                                     jax.random.PRNGKey(1))
    float(m["loss"])

    def run(x, i):
        box[0], box[1], box[2], m = step(box[0], box[1], box[2], (x, y),
                                         jax.random.PRNGKey(2 + i))
        float(m["loss"])

    ms, ts = _time_steps(
        run, lambda: jnp.asarray(rng.standard_normal((BS, 224, 224, 3)),
                                 jnp.bfloat16))
    print(f"kd NKD vit_small->SLaK-T bs{BS}: {ms:7.1f} ms  "
          f"{BS/(ms/1e3):5.0f} img/s "
          f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
          flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("accum", "both"):
        probe_accum(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    if what in ("kd", "both"):
        probe_kd()
