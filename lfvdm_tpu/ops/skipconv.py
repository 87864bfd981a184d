"""Fused up-path skip projection: 1x1 conv over a two-part channel concat
+ residual add + per-sample channel statistics, as one Pallas TPU kernel.

Replaces the reference's ``skip_connection(x) + h`` for the up-path ResBlock
(/root/reference/improved_diffusion/unet.py:204-207) where x is the skip
concat. The op is pure HBM traffic (matmul K≤1024, F≤512): XLA's conv
emitter runs it at ~76% of bandwidth at 128² (measured 1.08 ms vs a 0.82 ms
roofline on v5e); this kernel runs the op at 0.96 ms in the same in-model
trace — but loses far more than that at its custom-call boundaries, so it
ships OFF (see ``mode``).
The kernel also emits the per-(sample, channel) (Σy, Σy²) of its OUTPUT —
the next block's GroupNorm statistics (see models/nn.py channel_sums) —
because a custom call is an XLA fusion barrier: without emitting them here,
the stats would cost a standalone full re-read of y.

Backward runs as plain XLA einsums via jax.custom_vjp (the kernel's value is
bandwidth shaping, which XLA handles fine for the backward's matmuls).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 2048  # rows per grid step; 4 bf16 (BLK, 128) buffers ≈ 2 MB + pipeline


def mode():
    """Fused-skip policy: None (default, off), "pallas", or "xla".

    Default OFF — a measured negative result (benchmarks/analyze_hlo.py,
    v5e flagship 128²): the model's conv-on-concat emitter runs the full
    forward at 24.17 ms/fwd, while routing the up-path skip projections
    through this op costs 30.42 ms ("pallas": custom-call layout
    constraints add ~4 ms of relayout copies feeding the kernel, and the
    output convert to f32 un-fuses from the next GroupNorm) or 35.30 ms
    ("xla": the flattened two-matmul form loses the conv emitter's native
    tiled layouts entirely, 6.5 ms of copies). The kernel ITSELF is fine —
    in the same trace the custom calls run 0.96 ms vs 1.08 ms for XLA's
    in-model conv fusion of this op — the loss is purely the custom-call
    fusion/layout boundary, same verdict as the attention kernels at 128²
    (models/rpe.py). Opt in with
    ``LFVDM_PALLAS_SKIPCONV=1`` (pallas) or ``=xla`` to reproduce.

    Note the pallas path is also single-device only: a pallas_call is an
    opaque custom call to GSPMD with no partitioning rule, so multi-device
    traces (dp×fsdp train meshes, pods) must not use it.
    """
    flag = os.environ.get("LFVDM_PALLAS_SKIPCONV", "0")
    if flag in ("0", "", "auto") or os.environ.get("LFVDM_PALLAS") == "0":
        return None
    if flag == "xla":
        return "xla"
    if jax.default_backend() == "tpu" and jax.device_count() == 1:
        return "pallas"
    return "xla"


def _kernel(blocks_per_sample, x1_ref, x2_ref, r_ref, w1_ref, w2_ref, b_ref,
            y_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    y = jnp.dot(x1_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    y = y + jnp.dot(x2_ref[:], w2_ref[:], preferred_element_type=jnp.float32)
    y = y + r_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)

    ps1 = jnp.sum(y, axis=0)[None]
    ps2 = jnp.sum(y * y, axis=0)[None]
    s = i // blocks_per_sample

    @pl.when(i % blocks_per_sample == 0)
    def _init():
        s1_ref[pl.ds(s, 1), :] = ps1
        s2_ref[pl.ds(s, 1), :] = ps2

    @pl.when(i % blocks_per_sample != 0)
    def _accum():
        s1_ref[pl.ds(s, 1), :] = s1_ref[pl.ds(s, 1), :] + ps1
        s2_ref[pl.ds(s, 1), :] = s2_ref[pl.ds(s, 1), :] + ps2


def _fwd_pallas(x1, x2, w, b, resid, n_samples):
    M, c1 = x1.shape
    c2 = x2.shape[1]
    F = w.shape[1]
    w1, w2 = w[:c1], w[c1:]
    rows = M // n_samples
    bps = rows // _BLK
    grid = M // _BLK
    out_dtype = resid.dtype

    kernel = functools.partial(_kernel, bps)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLK, c1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, c2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_samples, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_samples, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, F), out_dtype),
            jax.ShapeDtypeStruct((n_samples, F), jnp.float32),
            jax.ShapeDtypeStruct((n_samples, F), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (c1 + c2) * F,
            bytes_accessed=(x1.size + x2.size + resid.size) * x1.dtype.itemsize
            + M * F * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x1, x2, resid, w1, w2, b[None], )
    return y, s1, s2


def _fwd_xla(x1, x2, w, b, resid, n_samples):
    """Reference path (also the fallback when shapes don't tile)."""
    c1 = x1.shape[1]
    y32 = (jnp.dot(x1, w[:c1], preferred_element_type=jnp.float32)
           + jnp.dot(x2, w[c1:], preferred_element_type=jnp.float32)
           + resid.astype(jnp.float32) + b.astype(jnp.float32)[None])
    y = y32.astype(resid.dtype)
    g = y32.reshape(n_samples, -1, y32.shape[-1])
    return y, jnp.sum(g, axis=1), jnp.sum(g * g, axis=1)


def _supported(x1, x2, resid, n_samples):
    M = x1.shape[0]
    if M % n_samples:
        return False
    rows = M // n_samples
    if rows % _BLK:
        return False
    for a in (x1, x2, resid):
        if a.shape[1] % 128:
            return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def skip_conv_stats(x1, x2, w, b, resid, n_samples, use_pallas):
    """y = [x1 ‖ x2] @ w + b + resid, plus per-sample channel (Σy, Σy²).

    ``x1``/``x2``/``resid``: (M, C) flattened activations, M = n_samples·rows.
    Returns (y (M, F), s1 (n_samples, F) f32, s2 (n_samples, F) f32).
    """
    if use_pallas and _supported(x1, x2, resid, n_samples):
        return _fwd_pallas(x1, x2, w, b, resid, n_samples)
    return _fwd_xla(x1, x2, w, b, resid, n_samples)


def _vjp_fwd(x1, x2, w, b, resid, n_samples, use_pallas):
    out = skip_conv_stats(x1, x2, w, b, resid, n_samples, use_pallas)
    return out, (x1, x2, w, out[0])


def _vjp_bwd(n_samples, use_pallas, saved, cts):
    x1, x2, w, y = saved
    gy, gs1, gs2 = cts
    c1 = x1.shape[1]
    rows = y.shape[0] // n_samples
    # Stats cotangents broadcast per (sample, channel): d/dy Σy = 1, Σy² = 2y.
    gyt = (gy.astype(jnp.float32)
           + jnp.repeat(gs1, rows, axis=0)
           + 2.0 * y.astype(jnp.float32) * jnp.repeat(gs2, rows, axis=0))
    gyt_c = gyt.astype(x1.dtype)
    dx1 = jnp.dot(gyt_c, w[:c1].T)
    dx2 = jnp.dot(gyt_c, w[c1:].T)
    xcat = jnp.concatenate([x1, x2], axis=1)
    dw = jnp.dot(xcat.T.astype(jnp.float32), gyt).astype(w.dtype)
    db = jnp.sum(gyt, axis=0).astype(w.dtype)
    dresid = gyt.astype(x1.dtype)
    return dx1, dx2, dw, db, dresid


skip_conv_stats.defvjp(_vjp_fwd, _vjp_bwd)
