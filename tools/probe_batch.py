"""Training batch-size crossover probe (VERDICT r2 item 3): the banded
custom VJP zero-pads the batch to 128 lanes exactly (fwd outputs sliced,
wgrad contributions zero), so sub-128 batches pay padded lane work. The
reference kernels accept arbitrary batch (cutlass example-19
test_correctness.py:16-127); measure where padded-banded still beats XLA
so `banded_train_ok` can gate on measurement instead of divisibility.

Per-branch fwd+dgrad+wgrad chains at batch {32, 64, 96, 128}, banded
(padded) vs XLA autodiff, stage-1/2 shapes. Protocol: fetch-synced,
entropy-fresh bytes, in-jit chains.
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
    from slak_tpu.ops.depthwise import depthwise_conv2d_xla

    rng = np.random.default_rng(0)

    def chain_vg(conv, n, h, w_, c, K, s):
        r = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        vg = jax.value_and_grad(
            lambda a, b: jnp.sum((conv(a, b) * r).astype(jnp.float32)),
            (0, 1))

        @jax.jit
        def run(x, wt):
            def body(carry, _):
                x_, w__ = carry
                l, (dx, dw) = vg(x_, w__)
                return (x_ + dx.astype(x_.dtype) * 1e-6,
                        w__ + dw.astype(w__.dtype) * 1e-6), l
            (xf, wf), ls = lax.scan(body, (x, wt), None, length=ITERS)
            return (jnp.sum(ls) + jnp.sum(xf[0, 0, 0].astype(jnp.float32))
                    + jnp.sum(wf[0, 0].astype(jnp.float32)))
        return run

    def timeit(run, shape_x, wt):
        x0 = jnp.asarray(ENT.standard_normal(shape_x), jnp.bfloat16)
        float(run(x0, wt))
        ts = []
        for _ in range(3):
            x2 = jnp.asarray(ENT.standard_normal(shape_x), jnp.bfloat16)
            jax.block_until_ready(x2)
            t0 = time.perf_counter()
            float(run(x2, wt))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1] / ITERS

    for (h, w_, c, K, s, tag) in [(56, 56, 124, 51, 5, "s1"),
                                  (28, 28, 249, 49, 5, "s2")]:
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32)
        for n in (32, 64, 96, 128):
            shape = (n, h, w_, c)
            tb = timeit(chain_vg(
                lambda a, b: pb.depthwise_conv2d_banded(a, b),
                n, h, w_, c, K, s), shape, wt)
            tx = timeit(chain_vg(depthwise_conv2d_xla,
                                 n, h, w_, c, K, s), shape, wt)
            print(f"[{tag}] bs{n:3d}: banded {tb*1e3:6.2f} ms | "
                  f"xla {tx*1e3:6.2f} ms | ratio {tx/tb:4.2f}", flush=True)


if __name__ == "__main__":
    main()
