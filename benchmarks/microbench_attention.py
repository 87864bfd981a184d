"""Microbenchmark: fused Pallas attention kernels vs the XLA einsum path.

Times each attention flavor in isolation at the flagship CARLA-128px shapes
(including the layout transposes the fused path needs), so kernel-level wins
and losses are visible without the conv stack in the way.

Usage: python benchmarks/microbench_attention.py [--d 256] [--c 384]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.ops.attention import (
    spatial_attention,
    spatial_attention_reference,
    temporal_rpe_attention,
    temporal_rpe_attention_reference,
)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--t", type=int, default=20)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--d", type=int, default=256, help="spatial sites (HW)")
    ap.add_argument("--c", type=int, default=384, help="channels")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    B, T, H, D, C = args.b, args.t, args.heads, args.d, args.c
    F = C // H
    dt = getattr(jnp, args.dtype)
    rng = np.random.default_rng(0)

    def r(shape, dtype=dt):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    print(f"shapes: B={B} T={T} H={H} D={D} C={C} F={F} dtype={args.dtype} "
          f"device={jax.devices()[0].device_kind}")

    # ---- temporal (RPE + mask): einsum layout (B,D,H,T,F), kernel (B,H,T,F,D)
    q0, k0, v0 = r((B, D, H, T, F)), r((B, D, H, T, F)), r((B, D, H, T, F))
    Rk = r((B, T, T, H, F), jnp.float32)
    Rq = r((B, T, T, H, F), jnp.float32)
    Rv = r((B, T, T, H, F), jnp.float32)
    m = jnp.asarray(rng.integers(0, 2, (B, T)), jnp.float32)

    @jax.jit
    def temporal_pallas_path(q, k, v, Rk, Rq, Rv, m):
        scale = F ** -0.5
        qk = (q * scale).transpose(0, 2, 3, 4, 1)
        kk = k.transpose(0, 2, 3, 4, 1)
        vk = v.transpose(0, 2, 3, 4, 1)
        out = temporal_rpe_attention(
            qk, kk, vk,
            Rk.transpose(0, 3, 1, 2, 4).astype(dt),
            (Rq.transpose(0, 3, 2, 1, 4) * scale).astype(dt),
            Rv.transpose(0, 3, 1, 4, 2).astype(dt), m,
        )
        return out.transpose(0, 4, 1, 2, 3)

    @jax.jit
    def temporal_einsum_path(q, k, v, Rk, Rq, Rv, m):
        scale = F ** -0.5
        qk = (q * scale).transpose(0, 2, 3, 4, 1)
        kk = k.transpose(0, 2, 3, 4, 1)
        vk = v.transpose(0, 2, 3, 4, 1)
        out = temporal_rpe_attention_reference(
            qk, kk, vk,
            Rk.transpose(0, 3, 1, 2, 4).astype(dt),
            (Rq.transpose(0, 3, 2, 1, 4) * scale).astype(dt),
            Rv.transpose(0, 3, 1, 4, 2).astype(dt), m,
        )
        return out.transpose(0, 4, 1, 2, 3)

    t_pallas = timeit(temporal_pallas_path, q0, k0, v0, Rk, Rq, Rv, m)
    t_einsum = timeit(temporal_einsum_path, q0, k0, v0, Rk, Rq, Rv, m)
    print(f"temporal  pallas {t_pallas*1e6:9.1f} us   einsum {t_einsum*1e6:9.1f} us   "
          f"speedup {t_einsum/t_pallas:5.2f}x")

    # ---- spatial (plain): layout (B, T, H, D, F) for both
    qs, ks_, vs = r((B, T, H, D, F)), r((B, T, H, D, F)), r((B, T, H, D, F))
    scale = F ** -0.5
    sp_pallas = jax.jit(lambda q, k, v: spatial_attention(q * scale, k, v))
    sp_einsum = jax.jit(lambda q, k, v: spatial_attention_reference(q * scale, k, v))
    t_sp_pallas = timeit(sp_pallas, qs, ks_, vs)
    t_sp_einsum = timeit(sp_einsum, qs, ks_, vs)
    print(f"spatial   pallas {t_sp_pallas*1e6:9.1f} us   einsum {t_sp_einsum*1e6:9.1f} us   "
          f"speedup {t_sp_einsum/t_sp_pallas:5.2f}x")


if __name__ == "__main__":
    main()
