"""SyncBN-faithful data-parallel training — the reference wraps every
large-kernel branch BN in ``nn.SyncBatchNorm`` (``models/SLaK.py:19-28``),
so batch statistics are computed over the *global* batch. Under plain
``jit`` with a sharded batch, XLA computes BN stats globally anyway (the
batch is one logical array), but the mask/optimizer collectives are
implicit. This module offers the explicit ``shard_map`` formulation where
per-shard BN stats are ``pmean``'d across the data axis (exactly SyncBN)
and the gradient all-reduce is explicit — the fully-faithful DDP+SyncBN
equivalent, and the form that scales to multi-host without relying on XLA's
global-view sharding propagation.
"""

from __future__ import annotations

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from slak_tpu.parallel.mesh import DATA_AXIS


def make_syncbn_train_step(model, train_cfg, mask_cfg, lr_schedule,
                           wd_schedule, mesh: Mesh,
                           axis_name: str = DATA_AXIS):
    """Build a jitted shard_map train step with SyncBN batch statistics.

    The model's config must carry ``bn_axis_name=axis_name`` so train-mode
    BN pmeans its batch stats over the data axis.
    """
    from slak_tpu.train.engine import make_train_step

    assert model.cfg.bn_axis_name == axis_name, (
        "model must be built with bn_axis_name set for SyncBN")
    step = make_train_step(model, train_cfg, mask_cfg, lr_schedule,
                           wd_schedule, pmean_axis=axis_name)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), (P(axis_name), P(axis_name)), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=0)
