"""Device mesh / sharding helpers — the TPU-native replacement for the
reference's DDP + NCCL stack (``utils.py:252-332``, ``main.py:374-376``).

The reference's only parallelism is data parallel (SURVEY.md §2.5). Here DP
is expressed as a 1-D ``jax.sharding.Mesh`` over the ``data`` axis: the batch
is sharded, params/optimizer state are replicated, and XLA inserts the grad
all-reduce (the DDP equivalent) automatically when the jitted train step's
outputs are replicated. SyncBN's cross-replica mean/var (``models/SLaK.py:
19-28``) maps to ``lax.pmean`` inside the step via ``SLaKConfig.bn_axis_name``
under ``shard_map``, or — TPU-friendlier — stays per-shard BN with a large
per-chip batch (a deliberate, documented fidelity decision; eval parity is
unaffected because eval uses running stats).

Multi-host bootstrap: ``jax.distributed.initialize()`` replaces the
reference's env://-OMPI-SLURM rendezvous dance (``utils.py:296-332``).

No mask broadcast is needed (reference ``sparse_core.py:404-407``): mask
updates are deterministic functions of replicated weights + a replicated RNG
key, so every replica computes identical masks.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
