"""Microbenchmark: nearest-2x-upsample + 3x3 conv variants on the real TPU.

Three mathematically identical forms (see models/unet.py):
  naive   — materialize the 4x nearest broadcast, 3x3 conv at 2H·2W
            (36·HW·C² MACs + reads the 4x broadcast)
  phase   — one 2x2-window conv with 4C phase outputs at H·W (16·HW·C²)
            + depth-to-space interleave (slice/stack/reshape passes)
  dilated — lhs-dilation-2 conv with the 4x4 combined kernel
            K4 = M4·w·M4ᵀ (M4 = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]]), output
            written ONCE in final layout; 16·HW·C² if the emitter
            phase-decomposes the base dilation, 64·HW·C² if it runs dense.

Times each at the two largest flagship levels. Result drives which form
models/unet.py Upsample uses.
"""

import _path  # noqa: F401

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, iters=60):
    """Time ``fn`` in ONE compiled program as an unrolled dependent chain.

    HARNESS WARNING (the reason this file exists in its current form): a
    lax.scan harness here copied its carry every step and inflated the
    dilated variant ~2.8 ms at (64->128, C=128) — which mis-drove the
    in-model strategy until an analyze_hlo A/B showed dilated WINNING that
    level (1.34 -> 0.48 ms in-model). Microbench scans with big carries lie;
    chain iterations by data dependence instead, and confirm any strategy
    choice in-model.
    """

    def loop(x0):
        y = None
        xi = x0
        for _ in range(iters):
            y = fn(xi)
            xi = y[:, ::2, ::2, :]  # fold output back to input shape
        return y

    fn_j = jax.jit(loop)
    np.asarray(fn_j(x))  # compile + fenced warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn_j(x))
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def make_variants(w, b):
    from lfvdm_tpu.models.unet import dilated_upsample_conv, naive_upsample_conv

    def naive(x):
        return naive_upsample_conv(x, w) + b

    m0 = jnp.array([[1., 0, 0], [0, 1, 1]], w.dtype)
    m1 = jnp.array([[1., 1, 0], [0, 0, 1]], w.dtype)

    def phase(x):
        N, H, W, C = x.shape
        F = w.shape[-1]
        phases = [jnp.einsum("rk,cl,klif->rcif", mr, mc, w)
                  for mr in (m0, m1) for mc in (m0, m1)]
        k2 = jnp.concatenate(phases, axis=-1)
        y4 = jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y4 = y4 + jnp.tile(b, 4)
        p00 = y4[:, 0:H, 0:W, 0 * F:1 * F]
        p01 = y4[:, 0:H, 1:W + 1, 1 * F:2 * F]
        p10 = y4[:, 1:H + 1, 0:W, 2 * F:3 * F]
        p11 = y4[:, 1:H + 1, 1:W + 1, 3 * F:4 * F]
        a0 = jnp.stack([p00, p01], axis=3)
        a1 = jnp.stack([p10, p11], axis=3)
        out = jnp.stack([a0, a1], axis=2)
        return out.reshape(N, 2 * H, 2 * W, F)

    def dilated(x):
        return dilated_upsample_conv(x, w) + b

    return naive, phase, dilated


def main():
    rng = np.random.default_rng(0)
    for (H, C) in [(64, 128), (32, 256), (16, 384), (8, 512)]:
        x = jnp.asarray(rng.standard_normal((40, H, H, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.bfloat16)
        naive, phase, dilated = make_variants(w, b)
        ref = np.asarray(jax.jit(naive)(x), np.float32)
        rows = []
        repeat_only = lambda x: jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # noqa: E731
        ov = timeit(repeat_only, x)
        rows.append(f"scan-overhead+broadcast: {ov:6.3f} ms")
        for name, fn in [("naive", naive), ("phase", phase), ("dilated", dilated)]:
            ms = timeit(fn, x)
            err = float(np.max(np.abs(np.asarray(jax.jit(fn)(x), np.float32) - ref)))
            rows.append(f"{name}: {ms:6.3f} ms (maxdiff {err:.3g})")
        print(f"(40,{H},{H},{C}) -> {2*H}²: " + " | ".join(rows), flush=True)


if __name__ == "__main__":
    main()
