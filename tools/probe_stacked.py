"""A/B probe: per-tap banded dots vs the tap-stacked (M-packed) variant.

The per-tap dots are issue-bound at M = H << 128 (time ~ contraction x
M-tiles, the idle M columns are free); stacking g = floor(128/H) taps of
one channel densely along M cuts the per-channel cost from s*H to
ceil(s/g)*H contraction-rows with no FLOP inflation. Predicted fwd gains:
s1 5/3 = 1.67x, s2 5/2 = 2.5x, s3 5/1 = 5x. fwd-only chains, repo timing
protocol (fetch-synced, entropy-fresh bytes, in-jit scan with evolving
carry + full reduction).
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

    def chain(n, h, w_, c, K, s, fn):
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.bfloat16)
        xcp = pb._to_cmajor_wpad(x, s // 2)

        @jax.jit
        def run(xc, wt):
            def body(carry, _):
                y = fn(carry, wt)
                s_ = jnp.sum(y.astype(jnp.float32))
                nxt = jnp.pad(y, ((0, 0), (0, 0), (s // 2, s // 2), (0, 0)))
                return (nxt * (1.0 + 1e-12 * s_).astype(y.dtype)), s_
            cf, ss = lax.scan(body, xc, None, length=ITERS)
            return jnp.sum(ss) + jnp.sum(cf[0, 0, 0].astype(jnp.float32))

        compiled = run.lower(xcp, wt).compile()
        float(compiled(xcp, wt))
        ts = []
        for _ in range(3):
            x2 = jnp.asarray(ENT.standard_normal(xcp.shape), xcp.dtype)
            jax.block_until_ready(x2)
            t0 = time.perf_counter()
            float(compiled(x2, wt))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1] / ITERS

    for (n, h, w_, c, K, s, tag) in [
            (128, 56, 56, 124, 51, 5, "s1"),
            (128, 28, 28, 249, 49, 5, "s2"),
            (128, 14, 14, 499, 47, 5, "s3")]:
        t_tap = chain(n, h, w_, c, K, s,
                      lambda xc, wt: pb.dwconv_banded_cmajor(xc, wt))
        t_stk = chain(n, h, w_, c, K, s,
                      lambda xc, wt: pb.dwconv_banded_stacked_cmajor(xc, wt))
        print(f"[{tag}] {h}x{w_} C{c} ({K},{s}): per-tap {t_tap*1e3:6.2f} ms"
              f" | stacked {t_stk*1e3:6.2f} ms | "
              f"speedup {t_tap/t_stk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
