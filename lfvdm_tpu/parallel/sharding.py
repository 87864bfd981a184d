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


def put_batch_array(mesh: Mesh, x, accum_axis: bool = False):
    """Place one host batch array onto the mesh, batch-axis sharded.

    Single-process: a plain sharded device_put. Multi-process (pod slices):
    each process holds only its LOCAL rows — matching the reference's
    per-rank batches (train_util.py:91) — so the global array is assembled
    with make_array_from_process_local_data; the global batch is
    local_batch × process_count along the sharded axis.
    """
    x = np.asarray(x)
    sharding = data_sharding(mesh, x.ndim, accum_axis=accum_axis)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    axis = 1 if accum_axis else 0
    gshape = list(x.shape)
    gshape[axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(sharding, x, tuple(gshape))


def shard_batch(mesh: Mesh, batch, accum_axis: bool = False):
    """Place a pytree of host arrays onto the mesh, batch-axis sharded."""
    return jax.tree.map(lambda x: put_batch_array(mesh, x, accum_axis=accum_axis), batch)


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
