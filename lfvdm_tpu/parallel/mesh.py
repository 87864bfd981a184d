"""Device mesh construction for dp/fsdp training over ICI (+DCN).

Replaces the reference's MPI + NCCL stack (dist_util.py, SURVEY.md §2.7):
rendezvous is `jax.distributed.initialize`, collectives are emitted by XLA
from sharding annotations, and rank identity is `jax.process_index()`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
FSDP_AXIS = "fsdp"


def setup_distributed():
    """Initialize multi-process JAX if launched under a multi-host runtime.

    Safe to call unconditionally: no-ops in single-process runs (the common
    single-chip / single-host case).
    """
    import os

    multi_host_tpu = len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
    if ("JAX_COORDINATOR_ADDRESS" in os.environ
            or "COORDINATOR_ADDRESS" in os.environ
            or multi_host_tpu):  # Cloud TPU pod slices set TPU_WORKER_HOSTNAMES,
        # not a coordinator address; initialize() auto-discovers there.
        jax.distributed.initialize()


def make_eval_mesh(dp_devices: int, batch_size: Optional[int] = None) -> Mesh:
    """Validated pure-dp mesh over the first ``dp_devices`` devices for
    single-process data-parallel eval (window sampling, I3D features).

    Raises up front when the request can't deliver parallelism — more
    devices than visible, or a batch size that isn't a multiple (every
    batch would silently take the replicated fallback).
    """
    n = len(jax.devices())
    if dp_devices > n:
        raise ValueError(f"--dp_devices {dp_devices} > {n} visible devices")
    if batch_size is not None and batch_size % dp_devices:
        raise ValueError(
            f"--batch_size {batch_size} must be a multiple of --dp_devices "
            f"{dp_devices}, or every batch runs replicated (no parallelism)")
    return make_mesh(devices=jax.devices()[:dp_devices])


def best_mesh_shape(n_devices: int, fsdp: int = 1) -> Tuple[int, int]:
    """Split n_devices into (dp, fsdp). fsdp=1 -> pure data parallel."""
    if fsdp <= 1:
        return (n_devices, 1)
    assert n_devices % fsdp == 0, f"{n_devices} devices not divisible by fsdp={fsdp}"
    return (n_devices // fsdp, fsdp)


def make_mesh(devices: Optional[Sequence] = None, fsdp: int = 1) -> Mesh:
    """Build a (dp, fsdp) mesh over the given (default: all) devices.

    The fsdp axis is innermost so its collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    dp, fs = best_mesh_shape(len(devices), fsdp)
    arr = np.array(devices).reshape(dp, fs)
    return Mesh(arr, (DP_AXIS, FSDP_AXIS))
