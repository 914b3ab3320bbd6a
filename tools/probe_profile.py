"""Capture jax.profiler traces of the flagship eval + train steps and dump
per-category device-time attribution (tools/parse_xplane.py) — the
starting point of every perf session.

    python tools/probe_profile.py [--mode eval|train|both] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both")
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--eval_bs", type=int, default=256)
    ap.add_argument("--train_bs", type=int, default=128)
    args = ap.parse_args()

    from slak_tpu.models import create_model
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)

    rng = np.random.default_rng(0)
    model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                         decom=True, branch_bn=True, width_factor=1.3,
                         drop_path_rate=0.1, conv_impl="auto")

    if args.mode in ("eval", "both"):
        params, state = model.init(jax.random.PRNGKey(0))
        pb = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        x = jnp.asarray(rng.standard_normal(
            (args.eval_bs, 224, 224, 3)), jnp.bfloat16)
        fwd = jax.jit(lambda p, s, x: jnp.sum(
            model.apply(p, s, x, train=False)[0]))
        jax.block_until_ready(fwd(pb, state, x))
        d = args.out + "_eval"
        with jax.profiler.trace(d):
            for _ in range(3):
                out = fwd(pb, state, x)
            jax.block_until_ready(out)
        print(f"=== EVAL bs{args.eval_bs} trace -> {d}", flush=True)
        subprocess.run([sys.executable, "tools/parse_xplane.py", d,
                        "--top", "25"])

    if args.mode in ("train", "both"):
        tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                         compute_dtype=jnp.bfloat16, prune_t_max=1000)
        mc = MaskConfig(sparsity=0.4, sparse_init="uniform",
                        growth_mode="random", prune_rate=0.5,
                        update_frequency=100)
        st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
        lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                               warmup_steps=10))
        step = jax.jit(make_train_step(model, tc, mc, lr, None),
                       donate_argnums=0)
        x = jnp.asarray(rng.standard_normal(
            (args.train_bs, 224, 224, 3)), jnp.bfloat16)
        y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, args.train_bs)),
                           1000)
        st, m = step(st, (x, y), jax.random.PRNGKey(1))
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        st, m = step(st, (x, y), jax.random.PRNGKey(2))
        jax.block_until_ready(m["loss"])
        wall = time.perf_counter() - t0
        d = args.out + "_train"
        with jax.profiler.trace(d):
            for i in range(3):
                st, m = step(st, (x, y), jax.random.PRNGKey(3 + i))
            jax.block_until_ready(m["loss"])
        print(f"=== TRAIN bs{args.train_bs} trace -> {d} "
              f"(1-step wall {wall*1e3:.1f} ms)", flush=True)
        subprocess.run([sys.executable, "tools/parse_xplane.py", d,
                        "--top", "25"])


if __name__ == "__main__":
    main()
