"""Sharding rules: batch over dp×fsdp, params optionally sharded over fsdp.

The reference replicates the full model per GPU (DDP); here params can
additionally be ZeRO-3-style sharded over the ``fsdp`` mesh axis — XLA
inserts the all-gathers/reduce-scatters. With fsdp=1 this degrades to plain
replicated data parallelism, matching the reference's strategy exactly
(SURVEY.md §2.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DP_AXIS, FSDP_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1, accum_axis: bool = False) -> NamedSharding:
    """Batch axis sharded over both mesh axes (dp and fsdp both consume data).

    ``accum_axis=True`` marks a leading gradient-accumulation (microbatch)
    axis: it stays unsharded (the train step scans over it sequentially) and
    axis 1 carries the per-device batch split instead.
    """
    if accum_axis:
        assert ndim >= 2, "accum_axis needs (n_micro, batch, ...) arrays, got rank < 2"
    lead = [None] if accum_axis else []
    rest = [None] * (ndim - len(lead) - 1)
    return NamedSharding(mesh, P(*lead, (DP_AXIS, FSDP_AXIS), *rest))


def shard_batch(mesh: Mesh, batch, accum_axis: bool = False):
    """Place a pytree of host arrays onto the mesh, batch-axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(
            np.asarray(x), data_sharding(mesh, np.asarray(x).ndim, accum_axis=accum_axis)
        ),
        batch,
    )


def fsdp_param_sharding(mesh: Mesh, params, min_size: int = 2**16):
    """Per-parameter NamedSharding: shard the largest divisible axis over fsdp.

    Small params (< min_size elements) stay replicated — sharding them costs
    more in collective latency than it saves in HBM.
    Returns a pytree of NamedSharding matching ``params``.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]

    def rule(p):
        if fsdp_size == 1 or p.size < min_size:
            return replicated(mesh)
        # choose the largest axis divisible by the fsdp size
        axes = sorted(range(p.ndim), key=lambda a: -p.shape[a])
        for a in axes:
            if p.shape[a] % fsdp_size == 0:
                spec = [None] * p.ndim
                spec[a] = FSDP_AXIS
                return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree.map(rule, params)
