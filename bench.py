"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Metric: SLaK-T 51x51 (width 1.3, the paper's headline config) inference
throughput at 224x224, bf16, per chip — BASELINE.json's north star. The
baseline for the ratio is an A100 running the reference's CUTLASS
implicit-GEMM extension; the reference repo publishes no throughput
(SURVEY.md §6), so we pin the documented estimate A100_IMG_PER_SEC below
from the reference's hardware context (A100, ~5.0 GMAC effective model,
PyTorch fp16) — revise when a measured number lands.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_IMG_PER_SEC = 1000.0  # documented estimate of the reference on A100

BATCH = 256
WARMUP = 2
ITERS = 10


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

    @jax.jit
    def fwd(params, state, x):
        logits, _ = model.apply(params, state, x, train=False)
        # scalar output: keep device->host traffic off the timing (the
        # tunnel makes large D2H transfers look like compute)
        return jnp.sum(logits)

    for _ in range(WARMUP):
        out = fwd(params, state, x)
    jax.device_get(out)

    t0 = time.time()
    for _ in range(ITERS):
        out = fwd(params, state, x)
    jax.device_get(out)
    dt = (time.time() - t0) / ITERS

    ips = BATCH / dt
    print(json.dumps({
        "metric": "SLaK-T 51x51 inference images/sec/chip @224 bf16",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
