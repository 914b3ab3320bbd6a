"""Eval A/B: fuse stage 4's MLP tail (C=998, 15.9M of weights) into the
Pallas kernel under the raised 64M scoped-vmem cap, vs the XLA
composition (the round-4 eval trace bills stage 4's tail ~6-7 ms of a
123 ms pass against a ~2 ms matmul floor).

Flips pallas_mlp._W_BYTES_MAX in-process: 9M (stage 4 XLA, the default)
vs 20M (stage 4 fused). Chain-of-3 harness from probe_eval_ab.py.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from slak_tpu.models import create_model
    from slak_tpu.ops import pallas_mlp as pm

    rng = np.random.default_rng(0)
    BS = 256
    L = 3
    for wmax in (9, 20):
        pm._W_BYTES_MAX = wmax * 1024 * 1024
        model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                             decom=True, branch_bn=True, width_factor=1.3,
                             conv_impl="auto")
        params, state = model.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32
            else a, params)

        @jax.jit
        def run(params, state, x):
            def body(carry, _):
                logits, _ = model.apply(params, state, carry, train=False)
                s = jnp.sum(logits)
                nxt = carry * (1.0 + 1e-12 * s).astype(carry.dtype)
                return nxt, s
            xf, ss = lax.scan(body, x, None, length=L)
            return jnp.sum(ss) + jnp.sum(xf[0, 0, 0].astype(jnp.float32))

        x = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)),
                        jnp.bfloat16)
        float(run(params, state, x))
        ts = []
        for i in range(5):
            x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            float(run(params, state, x))
            ts.append((time.perf_counter() - t0) / L)
        ms = 1e3 * sorted(ts)[len(ts) // 2]
        print(f"wmax={wmax}M: {ms:6.1f} ms/pass  {BS/(ms/1e3):5.0f} img/s "
              f"(all: {' '.join(f'{t*1e3:.1f}' for t in sorted(ts))})",
              flush=True)


if __name__ == "__main__":
    main()
