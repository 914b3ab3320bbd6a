"""Model-level A/B of the fast paths: full train-step wall time across
{conv_impl, mlp_impl} in {auto, xla}^2 (+ eval variants).

Why model-level: the round-2/3 micro-benchmark chains carry a ~5 ms/iter
harness floor (probe_floor.py: an IDENTITY chain body times 5.1 ms at the
stage-1 shape — pad+scale+sum over a ~100 MB tensor runs at ~145 GB/s
effective), so per-call deltas under ~1 ms are noise there. The full step
is one dispatch with a scalar fetch — the only number the tunnel can't
distort. Fresh input bytes per rep (result cache), median of 5.
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


def main():
    import os

    from slak_tpu.models import create_model
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)

    rng = np.random.default_rng(0)
    BS = 128
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, BS)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))

    # argv: space-separated "conv,mlp,pack" combos (default: the 2x2
    # conv/mlp grid with packing on)
    combos = [tuple(a.split(",")) for a in sys.argv[1:]] or [
        (c, m, "pack") for c in ("auto", "xla") for m in ("auto", "xla")]
    for conv_impl, mlp_impl, pack in combos:
            model = create_model(
                "SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                decom=True, branch_bn=True, width_factor=1.3,
                drop_path_rate=0.1, conv_impl=conv_impl,
                mlp_impl=mlp_impl)
            tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                             compute_dtype=jnp.bfloat16, prune_t_max=1000,
                             pack_params=(pack == "pack"))
            mc = MaskConfig(sparsity=0.4, sparse_init="uniform",
                            growth_mode="random", prune_rate=0.5,
                            update_frequency=100)
            st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
            step = jax.jit(make_train_step(model, tc, mc, lr, None),
                           donate_argnums=0)
            x = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)),
                            jnp.bfloat16)
            st, m = step(st, (x, y), jax.random.PRNGKey(1))
            float(m["loss"])
            ts = []
            for i in range(5):
                x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
                jax.block_until_ready(x)
                t0 = time.perf_counter()
                st, m = step(st, (x, y), jax.random.PRNGKey(2 + i))
                float(m["loss"])
                ts.append(time.perf_counter() - t0)
            ms = 1e3 * sorted(ts)[len(ts) // 2]
            print(f"train conv={conv_impl:5s} mlp={mlp_impl:5s} "
                  f"pack={pack:6s}: "
                  f"{ms:6.1f} ms  {BS/(ms/1e3):5.0f} img/s "
                  f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
                  flush=True)
            del st, step


if __name__ == "__main__":
    main()
