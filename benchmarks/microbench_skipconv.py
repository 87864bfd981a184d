"""Microbenchmark: fused up-path skip 1x1 conv + residual + stats.

Compares the Pallas kernel (ops/skipconv.py) against the XLA form at the
flagship 128² shapes (M = 40·16384, 256→128). In-model XLA measures 1.08 ms
for this op (analyze_hlo fusion.16) vs a 0.82 ms HBM roofline.

VERDICT (recorded in ops/skipconv.py:mode): standalone wins don't survive
in-model — custom-call layout constraints add ~4 ms of relayout copies at
the kernel's boundaries and un-fuse the next GroupNorm's convert, so the
full forward regresses 24.17 → 30.42 ms (pallas) / 35.30 ms (flat-matmul
XLA). The op ships OFF by default; this bench reproduces the standalone
numbers.
"""

import _path  # noqa: F401

import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.ops.skipconv import skip_conv_stats

S = 40


def timeit(fn, args, iters=30):
    # Unrolled dependent chain where EVERY input rotates through the
    # previous output (x1<-x2, x2<-y, resid<-y): all matmul operands differ
    # each iteration, so XLA can neither CSE the matmuls nor DCE
    # intermediate work. (Two broken harnesses preceded this one: a lax.scan carry
    # copied ~200x the op cost, and a chain that only fed y->r let XLA CSE
    # the loop-invariant dot(x1,w1)/dot(x2,w2) down to ONE matmul pair.)
    # Requires c1 == c2 == F, which the bench shapes satisfy.
    def loop(x1, x2, w, b, r):
        y = r
        for _ in range(iters):
            y, s1, s2 = fn(x1, x2, w, b, y)
            x1, x2 = x2, y
        return y, s1, s2

    fn_j = jax.jit(loop)
    np.asarray(fn_j(*args)[0])  # real fence (block_until_ready returns early
    best = float("inf")         # on the tunneled runtime; see bench.py)
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn_j(*args)[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def main():
    rng = np.random.default_rng(0)
    for (hw, c1) in [(128, 128), (64, 128)]:
        M = S * hw * hw
        x1 = jnp.asarray(rng.standard_normal((M, c1)), jnp.bfloat16)
        x2 = jnp.asarray(rng.standard_normal((M, c1)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((2 * c1, c1)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((c1,)) * 0.05, jnp.bfloat16)
        r = jnp.asarray(rng.standard_normal((M, c1)), jnp.bfloat16)
        args = (x1, x2, w, b, r)

        xla = lambda *a: skip_conv_stats(*a, S, False)  # noqa: E731
        pls = lambda *a: skip_conv_stats(*a, S, True)   # noqa: E731

        y0, s10, s20 = jax.jit(xla)(*args)
        y1, s11, s21 = jax.jit(pls)(*args)
        err = float(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)).max())
        err_s = float(jnp.abs(s10 - s11).max() / (jnp.abs(s10).max() + 1e-6))
        ms_x = timeit(xla, args)
        ms_p = timeit(pls, args)
        print(f"(S{S}, {hw}², {2*c1}->{c1}): xla {ms_x:6.3f} ms | pallas {ms_p:6.3f} ms"
              f" | maxdiff y {err:.3g} s1rel {err_s:.3g}", flush=True)


if __name__ == "__main__":
    main()
