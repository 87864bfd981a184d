"""Exactness tests for the fused skip-conv Pallas kernel (ops/skipconv.py).

The kernel computes ``y = [x1 ‖ x2] @ w + b + resid`` plus per-sample
channel (Σy, Σy²) — the up-path ResBlock's skip projection + residual add
(/root/reference/improved_diffusion/unet.py:204-207) fused with the next
GroupNorm's statistics. These tests pin the Pallas path against the XLA
form (forward + custom-VJP gradients) in interpret mode on CPU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from lfvdm_tpu.ops import skipconv as sc


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        sc.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    # shrink the row block so tiny test shapes tile
    monkeypatch.setattr(sc, "_BLK", 256)


def _mk(rng, S, rows, c1, c2, F, dtype):
    M = S * rows
    x1 = jnp.asarray(rng.standard_normal((M, c1)), dtype)
    x2 = jnp.asarray(rng.standard_normal((M, c2)), dtype)
    w = jnp.asarray(rng.standard_normal((c1 + c2, F)) * 0.05, dtype)
    b = jnp.asarray(rng.standard_normal((F,)) * 0.05, dtype)
    r = jnp.asarray(rng.standard_normal((M, F)), dtype)
    return x1, x2, w, b, r


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_xla(dtype):
    rng = np.random.default_rng(0)
    S = 2
    args = _mk(rng, S, rows=512, c1=128, c2=128, F=128, dtype=dtype)
    assert sc._supported(args[0], args[1], args[4], S)
    y0, s10, s20 = sc._fwd_xla(*args, S)
    y1, s11, s21 = sc._fwd_pallas(*args, S)
    np.testing.assert_allclose(np.asarray(y0, np.float32),
                               np.asarray(y1, np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s10), np.asarray(s11),
                               rtol=2e-3, atol=2e-3 * float(jnp.abs(s10).max()))
    np.testing.assert_allclose(np.asarray(s20), np.asarray(s21),
                               rtol=2e-3, atol=2e-3 * float(jnp.abs(s20).max()))


def test_gradients_match_between_paths():
    rng = np.random.default_rng(1)
    S = 2
    args = _mk(rng, S, rows=256, c1=128, c2=128, F=128, dtype=jnp.float32)

    def loss(a, use_pallas):
        y, s1, s2 = sc.skip_conv_stats(*a, S, use_pallas)
        return (jnp.sum(y * 1e-3) + jnp.sum(s1) * 1e-6 + jnp.sum(s2) * 1e-7)

    g0 = jax.grad(lambda a: loss(a, False))(args)
    g1 = jax.grad(lambda a: loss(a, True))(args)
    for a, c in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)


def test_unsupported_shapes_fall_back():
    rng = np.random.default_rng(2)
    S = 2
    # rows not a multiple of _BLK → XLA fallback, still correct
    args = _mk(rng, S, rows=100, c1=128, c2=128, F=128, dtype=jnp.float32)
    assert not sc._supported(args[0], args[1], args[4], S)
    y, s1, s2 = sc.skip_conv_stats(*args, S, True)
    y0, s10, s20 = sc._fwd_xla(*args, S)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=1e-6)
