"""FFT-conv feasibility probe (ROADMAP round-3 lead (a)).

Question: can a frequency-domain formulation beat the banded kernels'
MXU streaming bound for the decomposed (K, s) large-kernel convs?

Analysis first (why the answer should be NO for the decomposed branches):
the banded kernel's cost is s streams of x through the MXU (the K long-axis
taps ride FREE inside the stationary banded matrix) = s*H*W*N*C/128 cycles.
A DFT along H costs 1 forward stream (contract over the true H) plus an
inverse stream contracting over 2F ~ 2*(H+K)/H taps-equivalent, plus a
frequency-domain pointwise stage on a tensor inflated by 2F/H * 2 (fp32)
~ 5-9x vs x — HBM-bound. For s = 5 there is no room. FFT only pays for
NON-decomposed dense KxK kernels (K^2 taps vs ~4 streams + pointwise),
i.e. ConvNeXt-mode 7x7 at most — where XLA's native conv is already fine.

This probe measures the empirical side: (1) raw jnp.fft.rfft/irfft
throughput along H at stage-1 shape, (2) a full DFT-matmul conv (cos/sin
dots + shifted pointwise + inverse) vs (3) the banded custom VJP chain.
Timing per the repo protocol (fetch-synced, entropy-fresh bytes).
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


def timeit(fn, x, *args):
    float(jnp.sum(fn(x, *args).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        x2 = jnp.asarray(ENT.standard_normal(x.shape), x.dtype)
        jax.block_until_ready(x2)
        t0 = time.perf_counter()
        float(jnp.sum(fn(x2, *args).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / ITERS


def chain(body):
    @jax.jit
    def run(x, *args):
        def step(carry, _):
            y = body(carry, *args)
            s = jnp.sum(y.astype(jnp.float32))
            return carry * (1.0 + 1e-12 * s).astype(carry.dtype), s
        cf, ss = lax.scan(step, x, None, length=ITERS)
        return jnp.sum(ss) + jnp.sum(cf[0, 0, 0].astype(jnp.float32))
    return run


def dft_conv(x, wt, L):
    """(N,H,W,C) conv with (K,s) kernel via DFT along H. fp32 frequency
    domain, real cos/sin matmuls on the MXU."""
    N, H, W, C = x.shape
    K, s, _ = wt.shape
    f = jnp.arange(L // 2 + 1)
    # forward DFT of x over the true H rows (padding rows are zero)
    n_ = jnp.arange(H)
    ang_x = -2 * jnp.pi * f[:, None] * n_[None, :] / L
    Fc = jnp.cos(ang_x).astype(jnp.float32)          # (F, H)
    Fs = jnp.sin(ang_x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    Xre = jnp.einsum("fh,nhwc->nfwc", Fc, xf)        # (N, F, W, C)
    Xim = jnp.einsum("fh,nhwc->nfwc", Fs, xf)
    # kernel DFT (tiny, per channel/j), center tap at K//2; POSITIVE sign:
    # the conv is a cross-correlation, so the kernel spectrum is conjugated
    k_ = jnp.arange(K) - K // 2
    ang_w = 2 * jnp.pi * f[:, None] * k_[None, :] / L
    Wre = jnp.einsum("fk,kjc->fjc", jnp.cos(ang_w), wt.astype(jnp.float32))
    Wim = jnp.einsum("fk,kjc->fjc", jnp.sin(ang_w), wt.astype(jnp.float32))
    # pointwise complex multiply, summed over the s shifted columns
    pw = s // 2
    Xre_p = jnp.pad(Xre, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    Xim_p = jnp.pad(Xim, ((0, 0), (0, 0), (pw, pw), (0, 0)))
    Ore = jnp.zeros_like(Xre)
    Oim = jnp.zeros_like(Xim)
    for j in range(s):
        xr = Xre_p[:, :, j:j + W]
        xi = Xim_p[:, :, j:j + W]
        wr = Wre[:, j][None, :, None, :]
        wi = Wim[:, j][None, :, None, :]
        Ore = Ore + xr * wr - xi * wi
        Oim = Oim + xr * wi + xi * wr
    # inverse real DFT back to H rows
    ang_i = 2 * jnp.pi * f[None, :] * n_[:, None] / L
    scale = jnp.where((f == 0) | (2 * f == L), 1.0, 2.0) / L
    Gc = (jnp.cos(ang_i) * scale).astype(jnp.float32)  # (H, F)
    Gs = (jnp.sin(ang_i) * scale).astype(jnp.float32)
    y = (jnp.einsum("hf,nfwc->nhwc", Gc, Ore)
         - jnp.einsum("hf,nfwc->nhwc", Gs, Oim))
    return y.astype(x.dtype)


def main():
    from slak_tpu.ops.depthwise import depthwise_conv2d_xla
    from slak_tpu.ops.pallas_banded import depthwise_conv2d_banded

    rng = np.random.default_rng(0)
    for (n, h, w_, c, K, s, tag) in [
            (128, 56, 56, 124, 51, 5, "s1"),
            (128, 28, 28, 249, 49, 5, "s2")]:
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32)
        L = 1
        while L < h + K - 1:
            L *= 2

        # correctness
        y_ref = depthwise_conv2d_xla(x, wt.astype(x.dtype))
        y_fft = dft_conv(x, wt, L)
        rel = float(jnp.abs((y_fft - y_ref).astype(jnp.float32)).max()
                    / (jnp.abs(y_ref.astype(jnp.float32)).max() + 1e-9))
        print(f"[{tag}] dft_conv rel err vs xla: {rel:.2e}", flush=True)

        # raw XLA FFT primitive throughput for calibration
        def rawfft(a):
            return jnp.fft.irfft(jnp.fft.rfft(a.astype(jnp.float32),
                                              n=L, axis=1),
                                 n=L, axis=1)[:, :h].astype(a.dtype)
        t_raw = timeit(chain(rawfft), x)
        t_dft = timeit(chain(lambda a: dft_conv(a, wt, L)), x)
        t_band = timeit(chain(
            lambda a: depthwise_conv2d_banded(a, wt.astype(a.dtype))), x)
        print(f"[{tag}] raw rfft+irfft: {t_raw*1e3:.2f} ms | "
              f"dft_conv fwd: {t_dft*1e3:.2f} ms | "
              f"banded fwd: {t_band*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
