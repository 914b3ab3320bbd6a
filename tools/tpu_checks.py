"""On-TPU correctness + performance checks for the Pallas fast paths.

CI runs CPU-only (interpret-mode kernels); this script drives the compiled
kernels on the real chip — run it after touching anything in
``slak_tpu/ops/``:

    python tools/tpu_checks.py             # correctness only (~5 min warm)
    python tools/tpu_checks.py --perf      # + timing chains & model step

Checks:
  1. banded conv custom VJP (fwd/dgrad/wgrad) vs XLA autodiff at SLaK-T
     stage shapes, bf16, batch 128 — both 1-D and 2-D Toeplitz regimes;
  2. fused LN+MLP fwd+bwd vs the reference op composition;
  3. full-model eval and train-grad parity, conv_impl auto vs xla;
  4. (--perf) per-branch train chains, full train step, bench-style eval.

Timing methodology: in-jit chained loops where every iteration ends in a
full reduction feeding the result and the tensor carry evolves with the
output — see CLAUDE.md "timing harnesses are an adversarial game".
"""

from __future__ import annotations

import argparse
import dataclasses
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


def _rel(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))


def check_banded(rng):
    from slak_tpu.ops import pallas_banded as pb
    from slak_tpu.ops.depthwise import depthwise_conv2d_xla

    ok = True
    for (n, h, w_, c, kh, kw, tag, tol) in [
            (128, 56, 56, 37, 51, 5, "s1 1d", 1e-2),
            (128, 28, 28, 37, 5, 49, "s2 rect-twin", 1e-2),
            (128, 7, 7, 37, 13, 5, "s4 2d", 1e-2),
            # sub-128 batch: the pad-to-128 route banded_train_ok now
            # admits at bs >= 64 (probe_batch crossover, 2026-08-18)
            (96, 56, 56, 37, 51, 5, "s1 bs96-pad", 1e-2)]:
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
        r = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)

        def lb(x_, w__):
            return jnp.sum((pb.depthwise_conv2d_banded(x_, w__) * r)
                           .astype(jnp.float32))

        def lx(x_, w__):
            return jnp.sum((depthwise_conv2d_xla(x_, w__) * r)
                           .astype(jnp.float32))
        _, (dx1, dw1) = jax.jit(jax.value_and_grad(lb, (0, 1)))(x, wt)
        _, (dx2, dw2) = jax.jit(jax.value_and_grad(lx, (0, 1)))(x, wt)
        rw, rx = _rel(dw1, dw2), _rel(dx1, dx2)
        good = rw < tol and rx < tol
        ok &= good
        print(f"banded[{tag}]: dw={rw:.1e} dx={rx:.1e} "
              f"{'OK' if good else 'FAIL'}", flush=True)
    return ok


def check_banded_stats(rng):
    """Stats-fused forward (conv + BN batch sums in one kernel) vs the
    split composition, plus the ds1/ds2-routing backward, compiled."""
    from slak_tpu.ops import pallas_banded as pb

    ok = True
    for (n, h, w_, c, kh, kw, tag) in [
            (128, 56, 56, 37, 51, 5, "s1 1d"),
            (128, 28, 28, 37, 5, 49, "s2 rect-twin"),
            (96, 28, 28, 37, 49, 5, "s2 bs96-pad")]:
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((kh, kw, c)) * 0.1, jnp.float32)
        cnt = n * h * w_

        def lf(x_, w__):
            y, s1, s2 = pb.depthwise_conv2d_banded_stats(x_, w__)
            mean = s1 / cnt
            var = s2 / cnt - mean ** 2
            z = (y.astype(jnp.float32) - mean) * lax.rsqrt(var + 1e-5)
            return jnp.sum(z * jnp.sin(z))

        def lr(x_, w__):
            y = pb.depthwise_conv2d_banded(x_, w__).astype(jnp.float32)
            mean = jnp.mean(y, (0, 1, 2))
            var = jnp.mean(y * y, (0, 1, 2)) - mean ** 2
            z = (y - mean) * lax.rsqrt(var + 1e-5)
            return jnp.sum(z * jnp.sin(z))

        (v1, (dx1, dw1)) = jax.jit(jax.value_and_grad(lf, (0, 1)))(x, wt)
        (v2, (dx2, dw2)) = jax.jit(jax.value_and_grad(lr, (0, 1)))(x, wt)
        rv = abs(float(v1) - float(v2)) / (abs(float(v2)) + 1e-9)
        rw, rx = _rel(dw1, dw2), _rel(dx1, dx2)
        good = rv < 1e-2 and rw < 1e-2 and rx < 1e-2
        ok &= good
        print(f"banded_stats[{tag}]: v={rv:.1e} dw={rw:.1e} dx={rx:.1e} "
              f"{'OK' if good else 'FAIL'}", flush=True)
    return ok


def check_mlp(rng):
    from slak_tpu.ops import pallas_mlp as pm

    n, h, w, c = 128, 28, 28, 124
    c4 = 4 * c
    y = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    ps = (jnp.asarray(rng.standard_normal(c) * 0.1 + 1, jnp.float32),
          jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
          jnp.asarray(rng.standard_normal((c, c4)) * 0.05, jnp.float32),
          jnp.asarray(rng.standard_normal(c4) * 0.1, jnp.float32),
          jnp.asarray(rng.standard_normal((c4, c)) * 0.05, jnp.float32),
          jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
          jnp.asarray(np.full(c, 0.5), jnp.float32),
          jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32))  # pre_bias
    r = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)

    def lf(y_):
        return jnp.sum((pm.fused_mlp(y_, res, *ps, True) * r)
                       .astype(jnp.float32))

    def lr(y_):
        return jnp.sum((pm._reference_mlp(y_, res, *ps, add_residual=True)
                        * r).astype(jnp.float32))
    o1 = jax.jit(pm.fused_mlp, static_argnums=(10, 11))(y, res, *ps, True,
                                                       False)
    o2 = pm._reference_mlp(y, res, *ps, add_residual=True)
    g1 = jax.jit(jax.grad(lf))(y)
    g2 = jax.jit(jax.grad(lr))(y)
    ro, rg = _rel(o1, o2), _rel(g1, g2)
    good = ro < 1e-2 and rg < 1e-2
    print(f"fused_mlp: out={ro:.1e} dgrad={rg:.1e} "
          f"{'OK' if good else 'FAIL'}", flush=True)
    return good


def check_model(rng):
    import optax

    from slak_tpu.models import create_model
    from slak_tpu.models.slak import apply as slak_apply

    m = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                     decom=True, branch_bn=True, width_factor=1.3)
    params, state = m.init(jax.random.PRNGKey(0))
    pb16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    cfg_a = m.cfg
    cfg_x = dataclasses.replace(m.cfg, conv_impl="xla", mlp_impl="xla")
    xb = jnp.asarray(rng.standard_normal((128, 96, 96, 3)), jnp.bfloat16)
    yb = jnp.asarray(np.arange(128) % 1000)

    la, _ = jax.jit(lambda p: slak_apply(p, state, xb, cfg=cfg_a,
                                         train=False))(pb16)
    lx, _ = jax.jit(lambda p: slak_apply(p, state, xb, cfg=cfg_x,
                                         train=False))(pb16)
    re = _rel(la, lx)

    def loss(p, cfg):
        logits, _ = slak_apply(p, state, xb, cfg=cfg, train=True,
                               rng=jax.random.PRNGKey(7))
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()
    ga = jax.jit(jax.grad(lambda p: loss(p, cfg_a)))(pb16)
    gx = jax.jit(jax.grad(lambda p: loss(p, cfg_x)))(pb16)
    fa = jnp.concatenate([v.astype(jnp.float32).ravel()
                          for v in jax.tree_util.tree_leaves(ga)])
    fx = jnp.concatenate([v.astype(jnp.float32).ravel()
                          for v in jax.tree_util.tree_leaves(gx)])
    rg = _rel(fa, fx)
    good = re < 2e-2 and rg < 2e-2
    print(f"model auto-vs-xla: eval={re:.1e} traingrad={rg:.1e} "
          f"{'OK' if good else 'FAIL'}", flush=True)
    return good


def perf(rng):
    from slak_tpu.ops import pallas_banded as pb

    entropy = np.random.default_rng(
        int.from_bytes(__import__("os").urandom(8), "little"))

    def timeit(fn, *args, reps=3):
        """Median of reps, each with entropy-fresh first arg and the timed
        region ended by an actual D2H fetch: on the axon tunnel
        block_until_ready does NOT synchronize and repeated identical
        (executable, args) executions are served from a cross-process
        result cache (bench.py:72-97, measured 2026-08-17)."""
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            a0 = jnp.asarray(entropy.standard_normal(args[0].shape),
                             args[0].dtype)
            jax.block_until_ready(a0)
            t0 = time.perf_counter()
            float(jnp.sum(fn(a0, *args[1:]).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / ITERS

    def chain(tag, n, h, w_, c, K, s):
        x = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((K, s, c)) * 0.1, jnp.float32)
        r = jnp.asarray(rng.standard_normal((n, h, w_, c)), jnp.bfloat16)
        vg = jax.value_and_grad(
            lambda a, b: jnp.sum((pb.depthwise_conv2d_banded(a, b) * r)
                                 .astype(jnp.float32)), (0, 1))

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
        print(f"chain {tag}: {timeit(run, x, wt)*1e3:.2f} ms", flush=True)

    chain("s1 (51,5) C124", 128, 56, 56, 124, 51, 5)
    chain("s2 (49,5) C249", 128, 28, 28, 249, 49, 5)
    chain("s3 (47,5) C499", 128, 14, 14, 499, 47, 5)

    from slak_tpu.models import create_model
    from slak_tpu.sparsity import MaskConfig
    from slak_tpu.train import (TrainConfig, cosine_schedule_array,
                                create_train_state, make_train_step)
    BS = 128
    x = jnp.asarray(rng.standard_normal((BS, 224, 224, 3)), jnp.bfloat16)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 1000, BS)), 1000)
    model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                         decom=True, branch_bn=True, width_factor=1.3,
                         drop_path_rate=0.1, conv_impl="auto")
    tc = TrainConfig(update_freq=1, ema_decay=0.9999,
                     compute_dtype=jnp.bfloat16, prune_t_max=1000)
    mc = MaskConfig(sparsity=0.4, sparse_init="uniform",
                    growth_mode="random", prune_rate=0.5,
                    update_frequency=100)
    st = create_train_state(jax.random.PRNGKey(0), model, tc, mc)
    lr = jnp.asarray(cosine_schedule_array(4e-3, 1e-6, 1, 1000,
                                           warmup_steps=10))
    step = jax.jit(make_train_step(model, tc, mc, lr, None),
                   donate_argnums=0)
    st, m = step(st, (x, y), jax.random.PRNGKey(1))
    float(m["loss"])   # fetch = the only real sync on the tunnel
    ts = []
    for i in range(6):
        # fresh batch bytes per step: the donated TrainState already
        # differs step-to-step, but keep the input fresh too
        x = jnp.asarray(rng.standard_normal(x.shape), jnp.bfloat16)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        st, m = step(st, (x, y), jax.random.PRNGKey(2 + i))
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"train step bs{BS}: {ms:.1f} ms -> {BS/(ms/1e3):.0f} img/s/chip",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true")
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    ok = (check_banded(rng) & check_banded_stats(rng) & check_mlp(rng)
          & check_model(rng))
    if args.perf:
        perf(rng)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
