"""Full-train-step A/B of the C-major resident TRAIN stages (round 5).

Each argv entry is a 4-char stage mask, e.g. "0000" (all NHWC), "1111"
(all resident), "0011" (stages 3-4 resident): TRAIN_RESIDENT_STAGES is
patched to the mask and the flagship train step (SLaK-T 51x51 w1.3,
bs128 bf16, sparse DST + EMA, packed) is timed end-to-end — the only
trustworthy instrument on the tunnel (see probe_model_ab.py header).
Fresh input bytes per rep (result cache), median of 5.

Usage: python tools/probe_train_layout.py 0000 1111 0011 ...
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
    from slak_tpu.models import create_model
    from slak_tpu.models import slak as slak_mod
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)

    rng = np.random.default_rng(0)
    BS = 128
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, BS)), 1000)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))
    masks = sys.argv[1:] or ["0000", "1111"]
    for mask in masks:
        # optional trailing 'f' = fused_mlp_cmajor tail in resident blocks
        slak_mod.TRAIN_RESIDENT_MLP = "fused" if mask.endswith("f") else "xla"
        stages = tuple(c == "1" for c in mask.rstrip("f"))
        assert len(stages) == 4, mask
        slak_mod.TRAIN_RESIDENT_STAGES = stages
        model = create_model(
            "SLaK_tiny", kernel_size=(51, 49, 47, 13, 5), decom=True,
            branch_bn=True, width_factor=1.3, drop_path_rate=0.1,
            conv_impl="auto", mlp_impl="auto", train_layout="auto")
        tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                         compute_dtype=jnp.bfloat16, prune_t_max=1000,
                         pack_params=True)
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
        print(f"train resident={mask}: {ms:6.1f} ms  "
              f"{BS/(ms/1e3):5.0f} img/s "
              f"(all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
              flush=True)
        del st, step


if __name__ == "__main__":
    main()
