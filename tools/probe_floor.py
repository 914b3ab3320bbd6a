"""Chain-harness floor: what does the timing harness itself cost?

probe_overhead.py measured copy-only ~= full-kernel time, which either
means the pallas call is streaming-bound at ~50 GB/s (bad) or the chain
harness (per-iteration pad + scale + sum over a ~100 MB tensor) dominates
and every per-call number in probe_* is offset by a constant (fine —
deltas still hold). Decompose: (a) identity body (slice only), (b) one
XLA elementwise pass, (c) copy-only pallas twin, (d) the real banded fwd.
"""

from __future__ import annotations

import functools
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


def chain_time(xcp, wt, s, fn):
    @jax.jit
    def run(xc, w):
        def body(carry, _):
            y = fn(carry, w)
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


def main():
    from slak_tpu.ops import pallas_banded as pb
    from tools.probe_overhead import run_variant

    rng = np.random.default_rng(0)
    for (n, h, w_, c, K, s, tag) in [
            (128, 56, 56, 124, 51, 5, "s1"),
            (128, 28, 28, 249, 49, 5, "s2")]:
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.bfloat16)
        xcp = pb._to_cmajor_wpad(x, s // 2)
        Wp = xcp.shape[2]
        pw = s // 2
        nb0 = pb.batch_block(n, x.dtype) or n
        cb0 = pb._pick_cb(h, Wp, nb0, 2)

        t_id = chain_time(xcp, wt, s,
                          lambda xc, w: xc[:, :, pw:pw + w_, :])
        t_ew = chain_time(xcp, wt, s,
                          lambda xc, w: jnp.tanh(xc[:, :, pw:pw + w_, :]))
        t_cp = chain_time(xcp, wt, s,
                          lambda xc, w: run_variant(xc, w, nb0, cb0, 0))
        t_fl = chain_time(xcp, wt, s,
                          lambda xc, w: run_variant(xc, w, nb0, cb0, s))
        print(f"[{tag}] identity {t_id*1e3:5.2f} | +tanh {t_ew*1e3:5.2f}"
              f" | pallas-copy {t_cp*1e3:5.2f} | banded {t_fl*1e3:5.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
