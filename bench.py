"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line (stdout):
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Metric: SLaK-T 51x51 (width 1.3, the paper's headline config) inference
throughput at 224x224, bf16, per chip — BASELINE.json's north star. The
baseline for the ratio is an A100 running the reference's CUTLASS
implicit-GEMM extension; the reference repo publishes no throughput
(SURVEY.md §6), so we pin the documented estimate A100_IMG_PER_SEC below
from the reference's hardware context (A100, ~5.0 GMAC effective model,
PyTorch fp16) — an estimate, not a measurement; the margin target is >= 2x
so estimate error cannot erase it.

Timing methodology (CLAUDE.md "timing harnesses are an adversarial game"):
the axon tunnel can serve repeated identical (executable, args) executions
near-instantly, and XLA propagates output slices backward through scan
bodies. So the model runs L times *inside one jit* via ``lax.scan`` whose
carry evolves with each iteration's output and whose body ends in a full
reduction feeding the returned scalar; per-image time is the *slope*
between two chain lengths (which also subtracts dispatch overhead), and
the L2/L1 wall-time ratio is checked for linearity before the number is
believed (warning on stderr if it drifts).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

A100_IMG_PER_SEC = 1000.0  # documented estimate of the reference on A100

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
L1, L2 = 3, 9


def main():
    from slak_tpu.models import create_model

    model = create_model("SLaK_tiny", kernel_size=(51, 49, 47, 13, 5),
                         decom=True, branch_bn=True, width_factor=1.3,
                         conv_impl="auto")
    params, state = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, 224, 224, 3)), jnp.bfloat16)

    def chain(length):
        @jax.jit
        def run(params, state, x):
            def body(carry, _):
                logits, _ = model.apply(params, state, carry, train=False)
                s = jnp.sum(logits)          # full reduction: no slice-DCE
                # carry evolves with the output: no cross-iteration CSE
                nxt = carry * (1.0 + 1e-12 * s).astype(carry.dtype)
                return nxt, s
            xf, ss = lax.scan(body, x, None, length=length)
            return (jnp.sum(ss)
                    + jnp.sum(xf[0, 0, 0].astype(jnp.float32)))
        return run

    # The tunnel serves repeated (executable, input-bytes) executions from
    # a result cache that SURVIVES ACROSS PROCESSES (measured 2026-08-17:
    # replaying byte patterns a probe script ran a minute earlier returned
    # in ~0.3 ms with correct outputs; genuinely fresh bytes always time
    # honestly and linearly in L). Defense in depth: (a) every timed call
    # uses entropy-derived input bytes no process has ever sent, (b) the
    # median over 5 calls drops stray anomalies, (c) the L2/L1 linearity
    # check below guards the final number.
    # ... and (d) the timed region ends in an ACTUAL D2H FETCH of the
    # scalar output: measured (2026-08-17) ``block_until_ready`` returns
    # without waiting on this tunnel — only the fetch synchronizes. The
    # output is a scalar, so the fetch itself costs ~nothing.
    entropy = np.random.default_rng(
        int.from_bytes(os.urandom(8), "little"))
    runs = {length: chain(length) for length in (L1, L2)}
    compiled = {length: run.lower(params, state, x).compile()
                for length, run in runs.items()}

    def measure():
        times = {}
        for length in (L1, L2):
            float(compiled[length](params, state, x))  # drain queue
            samples = []
            for _ in range(5):
                x2 = jnp.asarray(entropy.standard_normal(x.shape), x.dtype)
                jax.block_until_ready(x2)
                t0 = time.perf_counter()
                float(compiled[length](params, state, x2))
                samples.append(time.perf_counter() - t0)
            times[length] = sorted(samples)[len(samples) // 2]
            print(f"L={length} samples: "
                  + " ".join(f"{s:.4f}" for s in samples), file=sys.stderr)
        return times

    # FAIL-SAFE, not fail-noisy (2026-08-17 incident: a nonlinear run once
    # emitted 12.6M img/s): if the L2/L1 ratio is off, re-measure with new
    # entropy; if it never settles, fall back to the conservative
    # single-dispatch time wall/L2 (includes the tunnel's full dispatch
    # overhead, so it can only UNDERSTATE throughput).
    expect = L2 / L1
    for attempt in range(4):
        times = measure()
        ratio = times[L2] / times[L1]
        if 0.75 * expect <= ratio <= 1.25 * expect:
            slope = (times[L2] - times[L1]) / (L2 - L1)  # sec per pass
            break
        print(f"WARNING: chain wall time not linear in L "
              f"(t{L2}/t{L1} = {ratio:.2f}, expected ~{expect:.2f}); "
              f"retrying ({attempt + 1}/4)", file=sys.stderr)
    else:
        slope = times[L2] / L2
        print("WARNING: linearity never settled; falling back to the "
              "conservative wall/L estimate", file=sys.stderr)

    ips = BATCH / slope
    print(json.dumps({
        "metric": "SLaK-T 51x51 inference images/sec/chip @224 bf16",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
