"""Model-level A/B of the eval conv-pair dispatch:
split (2 calls + pads/transposes/add) vs fused (1 call, in-kernel halos)
in both transpose modes. Full eval forward bs256, one dispatch + scalar
fetch, fresh bytes per rep, median of 5.
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
    import slak_tpu.ops.depthwise as dw
    from slak_tpu.models import create_model

    rng = np.random.default_rng(0)
    BS = int(__import__("os").environ.get("AB_BS", "256"))
    model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                         decom=True, branch_bn=True, width_factor=1.3,
                         conv_impl="auto")
    params, state = model.init(jax.random.PRNGKey(0))
    pb_ = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    impls = sys.argv[1:] or ("split", "fused-kernel", "fused-input",
                             "fused-dualout", "fused-dualboth")
    for impl in impls:
        dw.PAIR_IMPL = impl
        fwd = jax.jit(lambda p, s, x: jnp.sum(
            model.apply(p, s, x, train=False)[0].astype(jnp.float32)))
        x = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)), jnp.bfloat16)
        try:
            float(fwd(pb_, state, x))
        except Exception as e:
            print(f"eval pair={impl}: FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        ts = []
        for _ in range(5):
            x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            float(fwd(pb_, state, x))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(ts)[len(ts) // 2]
        print(f"eval pair={impl:12s}: {ms:6.1f} ms  {BS/(ms/1e3):5.0f} img/s"
              f" (all: {' '.join(f'{t*1e3:.0f}' for t in sorted(ts))})",
              flush=True)


if __name__ == "__main__":
    main()
