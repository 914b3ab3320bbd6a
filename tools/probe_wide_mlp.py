"""Step-level A/B of TRAIN_WIDE_MLP_BWD (models/slak.py): stage-3 train
MLP on the Pallas fused fwd + F-chunked bwd vs the XLA composition.

Motivation (round-4 train trace, /tmp/prof_r4t_train): the in-situ XLA
stage-3 MLP costs ~29 ms/step (fwd GELU-stash fusions ~9, bwd ~15, bias
reduces ~5) against a ~4 ms compute floor — its fusions run N-minor
({0,3,2,1}) layouts inherited from the C-major conv custom-calls around
them. The round-3 CHAIN A/B (wash, 7.17 vs 6.97 ms) measured the kernels
standalone, where XLA picks clean layouts; step level is the instrument
that sees the layout poisoning.

Protocol: full train step, fresh input bytes per rep (tunnel result
cache), scalar fetch sync, median of 5 — bench.py:72-97 conventions.
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
    import slak_tpu.models.slak as S
    from slak_tpu.models import create_model
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)

    rng = np.random.default_rng(0)
    BS = 128
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, BS)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))

    for wide in (False, True):
        S.TRAIN_WIDE_MLP_BWD = wide
        model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                             decom=True, branch_bn=True, width_factor=1.3,
                             drop_path_rate=0.1, conv_impl="auto")
        tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                         compute_dtype=jnp.bfloat16, prune_t_max=1000)
        mc = MaskConfig(sparsity=0.4, sparse_init="uniform",
                        growth_mode="random", prune_rate=0.5,
                        update_frequency=100)
        st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
        step = jax.jit(make_train_step(model, tc, mc, lr, None),
                       donate_argnums=0)
        x = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)),
                        jnp.bfloat16)
        st, m = step(st, (x, y), jax.random.PRNGKey(1))
        loss0 = float(m["loss"])
        ts = []
        for i in range(5):
            x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            st, m = step(st, (x, y), jax.random.PRNGKey(2 + i))
            float(m["loss"])
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(ts)[len(ts) // 2]
        print(f"wide_mlp_bwd={wide}: {ms:6.1f} ms  {BS/(ms/1e3):5.0f} "
              f"img/s  loss0={loss0:.4f} "
              f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
              flush=True)
        del st, step


if __name__ == "__main__":
    main()
