import os

# Tests run on a virtual multi-device CPU platform so sharding tests work
# without real TPU chips (SURVEY.md §4: "multi-device tests ... with CPU
# xla_force_host_platform_device_count fakes").
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-select an experimental TPU plugin platform via
# JAX_PLATFORMS in a way that survives os.environ overrides; the config API
# always wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
