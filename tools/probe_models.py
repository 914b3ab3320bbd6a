"""Per-model eval/train throughput on TPU (VERDICT r4 #4: perf was
demonstrated on SLaK-T only; the reference publishes SLaK-S 83.8 and
SLaK-B 84.0 at the same 51x51 recipe, README.md:46-47).

Measures full-model walls (the probe_model_ab.py instrument: one dispatch,
fresh input bytes per rep, scalar fetch, median of 5):
  eval  — jitted eval forward, bs256 bf16 (bench.py's configuration);
  train — the full sparse-DST train step, bs128 bf16.

Usage: python tools/probe_models.py SLaK_small:eval SLaK_base:train:64 ...
       (default: SLaK_{tiny,small,base} + convnext_small, both modes;
       an optional third field overrides the batch and a trailing
       ':remat' turns on per-block activation remat — SLaK-B train
       bs128 needs 17.2G HBM unremat'd and OOMs the 15.75G v5e chip,
       so its single-chip number is denominated remat'd)
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


def _model(name, remat=False):
    from slak_tpu.models import create_model
    if name.startswith("SLaK"):
        return create_model(name, kernel_size=(51, 49, 47, 13, 5),
                            decom=True, branch_bn=True, width_factor=1.3,
                            drop_path_rate=0.1, conv_impl="auto",
                            mlp_impl="auto", remat=remat)
    return create_model(name, drop_path_rate=0.1, conv_impl="auto",
                        mlp_impl="auto", remat=remat)


def probe_eval(name, bs=256):
    model = _model(name)
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)  # bench.py's eval configuration

    @jax.jit
    def fwd(p, s, x):
        logits, _ = model.apply(p, s, x, train=False)
        return jnp.sum(logits)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)), jnp.bfloat16)
    float(fwd(params, state, x))
    ts = []
    for _ in range(5):
        x = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)),
                        jnp.bfloat16)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        float(fwd(params, state, x))
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{name:16s} eval  bs{bs}: {ms:7.1f} ms  {bs/(ms/1e3):5.0f} img/s "
          f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
          flush=True)


def probe_train(name, bs=128, remat=False):
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)
    model = _model(name, remat=remat)
    rng = np.random.default_rng(0)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, bs)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))
    tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                     compute_dtype=jnp.bfloat16, prune_t_max=1000,
                     pack_params=True)
    mc = MaskConfig(sparsity=0.4, sparse_init="uniform", growth_mode="random",
                    prune_rate=0.5, update_frequency=100)
    st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
    step = jax.jit(make_train_step(model, tc, mc, lr, None),
                   donate_argnums=0)
    x = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)), jnp.bfloat16)
    st, m = step(st, (x, y), jax.random.PRNGKey(1))
    float(m["loss"])
    ts = []
    for i in range(5):
        x = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)),
                        jnp.bfloat16)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        st, m = step(st, (x, y), jax.random.PRNGKey(2 + i))
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    tag = " remat" if remat else ""
    print(f"{name:16s} train bs{bs}{tag}: {ms:7.1f} ms  "
          f"{bs/(ms/1e3):5.0f} img/s "
          f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
          flush=True)


if __name__ == "__main__":
    jobs = sys.argv[1:] or [
        f"{m}:{k}" for m in ("SLaK_tiny", "SLaK_small", "SLaK_base",
                             "convnext_small")
        for k in ("eval", "train")]
    for job in jobs:
        parts = job.split(":")
        name, mode = parts[0], parts[1]
        remat = "remat" in parts[2:]
        bs = [int(p) for p in parts[2:] if p.isdigit()]
        kw = {"bs": bs[0]} if bs else {}
        if mode == "eval":
            probe_eval(name, **kw)
        else:
            probe_train(name, remat=remat, **kw)
