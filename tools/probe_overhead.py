"""Where does banded-fwd time actually go? (round-3 diagnostic)

The tap-stacked probe measured a wash (1.01/1.10/1.02x) where the
issue-bound model predicted 1.67/2.5/5x — so the per-tap dots are NOT the
bottleneck at SLaK shapes. This probe decomposes the fwd kernel cost:

  * copy-only twin: same grid + BlockSpecs, body = one slice copy
    (measures grid-step + VMEM streaming floor, no MXU work);
  * 1-tap twin: one dot instead of s (measures the marginal dot cost);
  * cb sweep: fewer, fatter grid steps (amortizes per-step overhead).

fwd-only chains, repo timing protocol (fetch-synced, entropy-fresh bytes,
in-jit scan with evolving carry + full reduction).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ITERS = 8
ENT = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))


def variant_kernel(a_ref, x_ref, o_ref, *, s: int, W: int, cb: int,
                   prec, ntaps: int):
    """ntaps=0: copy-only; ntaps=k: k dots of the s."""
    for i in range(cb):
        if ntaps == 0:
            o_ref[i] = x_ref[i, :, 0:W, :]
        else:
            acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
            for j in range(ntaps):
                xs = x_ref[i, :, j:j + W, :]
                acc += lax.dot_general(
                    a_ref[i, j], xs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
            o_ref[i] = acc.astype(o_ref.dtype)


def run_variant(xc, w, nb, cb, ntaps):
    from slak_tpu.ops import pallas_banded as pb
    C, H, Wp, N = xc.shape
    kh, s, _ = w.shape
    W = Wp - 2 * (s // 2)
    cp = pb._round_up(C, cb)
    A = pb._pad_channels(pb.build_banded(w, H).astype(xc.dtype), cp)
    xcp = pb._pad_channels(xc, cp)
    kernel = functools.partial(variant_kernel, s=s, W=W, cb=cb,
                               prec=pb._precision(xc.dtype), ntaps=ntaps)
    out = pl.pallas_call(
        kernel,
        grid=(cp // cb, N // nb),
        in_specs=[
            pl.BlockSpec((cb, s, H, H), lambda c, b: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, H, Wp, nb), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb, H, W, nb), lambda c, b: (c, 0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, H, W, N), xc.dtype),
    )(A, xcp)
    return out[:C]


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

    try:
        compiled = run.lower(xcp, wt).compile()
    except Exception as e:
        return None, str(e).splitlines()[0][:80]
    float(compiled(xcp, wt))
    ts = []
    for _ in range(3):
        x2 = jnp.asarray(ENT.standard_normal(xcp.shape), xcp.dtype)
        jax.block_until_ready(x2)
        t0 = time.perf_counter()
        float(compiled(x2, wt))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / ITERS, None


def main():
    from slak_tpu.ops import pallas_banded as pb
    rng = np.random.default_rng(0)
    for (n, h, w_, c, K, s, tag) in [
            (128, 56, 56, 124, 51, 5, "s1"),
            (128, 28, 28, 249, 49, 5, "s2"),
            (128, 14, 14, 499, 47, 5, "s3")]:
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.bfloat16)
        xcp = pb._to_cmajor_wpad(x, s // 2)
        Wp = xcp.shape[2]
        nb0 = pb.batch_block(n, x.dtype) or n
        cb0 = pb._pick_cb(h, Wp, nb0, 2)
        print(f"[{tag}] {h}x{w_} C{c} base nb={nb0} cb={cb0}", flush=True)
        variants = [
            (nb0, cb0, 0, "copy-only"),
            (nb0, cb0, 1, "1-tap"),
            (nb0, cb0, s, "full s"),
            (nb0, cb0 * 2, s, "cb x2"),
            (nb0, cb0 * 4, s, "cb x4"),
        ]
        if nb0 != 128:
            variants.append((128, cb0, s, "nb=128"))
        for (nb, cb, ntaps, lbl) in variants:
            t, err = chain_time(
                xcp, wt, s,
                lambda xc, w, nb=nb, cb=cb, nt=ntaps:
                    run_variant(xc, w, nb, cb, nt))
            if t is None:
                print(f"    {lbl:10s}: FAIL {err}", flush=True)
            else:
                print(f"    {lbl:10s}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
