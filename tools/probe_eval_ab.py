"""Eval-path A/B: full-model inference wall time across eval layouts.

Variants: resident C-major stages with the fused pair call ('input'),
resident with the split pair ('split'), and the per-block NHWC path
('nhwc'). Chain-of-3 inside one jit (carry evolves, full reduction,
scalar fetch) with fresh input bytes per rep — the model-level harness
from bench.py, minus the slope game (we compare variants, so the constant
dispatch offset cancels).
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
    from slak_tpu.models import slak as M

    rng = np.random.default_rng(0)
    BS = 256
    L = 3
    variants = sys.argv[1:] or ["dual", "split", "nhwc"]
    for variant in variants:
        if variant in ("nhwc", "dual"):
            layout = variant
        else:
            layout = "cmajor"
            M.RESIDENT_PAIR_IMPL = variant
        model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                             decom=True, branch_bn=True, width_factor=1.3,
                             conv_impl="auto", eval_layout=layout)
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
        for _ in range(5):
            x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            float(run(params, state, x))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(ts)[len(ts) // 2] / L
        print(f"eval layout={variant:6s}: {ms:6.1f} ms/pass "
              f"{BS/(ms/1e3):5.0f} img/s "
              f"(all/L: {' '.join(f'{t*1e3/L:.0f}' for t in sorted(ts))})",
              flush=True)


if __name__ == "__main__":
    main()
