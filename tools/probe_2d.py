"""A/B probe: 1-D banded vs 2-D Toeplitz kernels at SLaK stage shapes.

Streaming model (pallas_banded.py): 1-D = min(kh,kw) x-passes, 2-D =
ceil(H*W/128) x-passes -> 2-D should win stage 3 (2 < 5) and lose stage 2
(7 > 5). fwd+dgrad+wgrad chains, repo timing protocol.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ITERS = 8
ENT = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))


def main():
    from slak_tpu.ops import pallas_banded as pb

    rng = np.random.default_rng(0)

    def chain(n, h, w_, c, K, s, force2d):
        orig = pb.use_banded2d
        pb.use_banded2d = lambda *a: force2d
        try:
            r = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
            vg = jax.value_and_grad(
                lambda a, b: jnp.sum(
                    (pb.depthwise_conv2d_banded(a, b) * r)
                    .astype(jnp.float32)), (0, 1))

            @jax.jit
            def run(x, wt):
                def body(carry, _):
                    x_, w__ = carry
                    l, (dx, dw) = vg(x_, w__)
                    return (x_ + dx.astype(x_.dtype) * 1e-6,
                            w__ + dw.astype(w__.dtype) * 1e-6), l
                (xf, wf), ls = lax.scan(body, (x, wt), None, length=ITERS)
                return (jnp.sum(ls)
                        + jnp.sum(xf[0, 0, 0].astype(jnp.float32))
                        + jnp.sum(wf[0, 0].astype(jnp.float32)))
            wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1,
                             jnp.float32)
            x0 = jnp.asarray(ENT.standard_normal((n, h, w_, c)),
                             jnp.bfloat16)
            compiled = run.lower(x0, wt).compile()
            float(compiled(x0, wt))
            ts = []
            for _ in range(3):
                x2 = jnp.asarray(ENT.standard_normal((n, h, w_, c)),
                                 jnp.bfloat16)
                jax.block_until_ready(x2)
                t0 = time.perf_counter()
                float(compiled(x2, wt))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1] / ITERS
        finally:
            pb.use_banded2d = orig

    for (h, w_, c, K, s, tag) in [(14, 14, 499, 47, 5, "s3"),
                                  (28, 28, 249, 49, 5, "s2")]:
        t1 = chain(128, h, w_, c, K, s, False)
        t2 = chain(128, h, w_, c, K, s, True)
        print(f"[{tag}] {h}x{w_} C{c} ({K},{s}): 1-D {t1*1e3:6.2f} ms | "
              f"2-D {t2*1e3:6.2f} ms | 2D speedup {t1/t2:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
