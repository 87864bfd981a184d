"""Parity tests for the fused Pallas attention kernels (ops/attention.py).

Run in Pallas interpreter mode on the CPU mesh (LFVDM_PALLAS=interpret), so
the exact kernel code paths — grids, block specs, fori_loop, masked softmax —
are exercised without TPU hardware. The einsum reference implementations are
themselves parity-tested against /root/reference in test_rpe_attention.py,
so kernel == einsum == reference transitively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.ops.attention import (
    spatial_attention,
    spatial_attention_reference,
    temporal_rpe_attention,
    temporal_rpe_attention_reference,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("LFVDM_PALLAS", "interpret")


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def test_spatial_attention_matches_reference():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    B, T, H, D, F = 2, 3, 2, 16, 8
    q, k, v = (_rand(ks[i], (B, T, H, D, F)) for i in range(3))
    out = spatial_attention(q, k, v)
    ref = spatial_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_spatial_attention_grad_matches_reference():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, T, H, D, F = 1, 2, 1, 8, 4
    q, k, v = (_rand(ks[i], (B, T, H, D, F)) for i in range(3))

    g_fused = jax.grad(lambda *a: spatial_attention(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda *a: spatial_attention_reference(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def _temporal_inputs(seed, B=2, H=2, T=5, F=8, D=16, mask="two-group"):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    q = _rand(ks[0], (B, H, T, F, D))
    k = _rand(ks[1], (B, H, T, F, D))
    v = _rand(ks[2], (B, H, T, F, D))
    r_k = _rand(ks[3], (B, H, T, T, F)) * 0.1
    r_q_t = _rand(ks[4], (B, H, T, T, F)) * 0.1
    r_v_t = _rand(ks[5], (B, H, T, F, T)) * 0.1
    if mask == "two-group":
        m = (jax.random.uniform(ks[6], (B, T)) > 0.4).astype(jnp.float32)
    else:
        m = jnp.ones((B, T), jnp.float32)
    return q, k, v, r_k, r_q_t, r_v_t, m


@pytest.mark.parametrize("mask", ["two-group", "all"])
def test_temporal_rpe_attention_matches_reference(mask):
    args = _temporal_inputs(0, mask=mask)
    out = temporal_rpe_attention(*args)
    ref = temporal_rpe_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_temporal_rpe_attention_d_blocking():
    """A D block smaller than D must not change the result."""
    args = _temporal_inputs(1, D=32)
    out = temporal_rpe_attention(*args, d_block=8)
    ref = temporal_rpe_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_temporal_rpe_attention_grad_matches_reference():
    args = _temporal_inputs(2, B=1, H=1, T=4, F=4, D=8)

    g_fused = jax.grad(lambda *a: temporal_rpe_attention(*a).sum(), argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(
        lambda *a: temporal_rpe_attention_reference(*a).sum(), argnums=tuple(range(6))
    )(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_rpe_attention_module_pallas_path_matches_einsum():
    """End-to-end RPEAttention: fused path == einsum path on shared params."""
    from lfvdm_tpu.models.rpe import RPEAttention

    B, D, T, C, H = 2, 6, 5, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = _rand(ks[0], (B, D, T, C))
    temb = _rand(ks[1], (B, T, 24))
    fi = jnp.sort(jax.random.randint(ks[2], (B, T), 0, 50), axis=1)
    m = (jax.random.uniform(ks[3], (B, T)) > 0.3).astype(jnp.float32)

    kwargs = dict(channels=C, num_heads=H, use_rpe_net=True)
    einsum_mod = RPEAttention(**kwargs, use_pallas=False)
    pallas_mod = RPEAttention(**kwargs, use_pallas=True)
    params = einsum_mod.init(jax.random.PRNGKey(0), x, temb=temb,
                             frame_indices=fi, attn_mask=m)

    out_e, _ = einsum_mod.apply(params, x, temb=temb, frame_indices=fi, attn_mask=m)
    out_p, _ = pallas_mod.apply(params, x, temb=temb, frame_indices=fi, attn_mask=m)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e), atol=1e-5, rtol=1e-5)


def test_rpe_attention_module_pallas_spatial_matches_einsum():
    from lfvdm_tpu.models.rpe import RPEAttention

    B, D, T, C, H = 2, 4, 9, 16, 2
    x = _rand(jax.random.PRNGKey(5), (B, D, T, C))
    kwargs = dict(channels=C, num_heads=H, use_rpe_net=False,
                  use_rpe_q=False, use_rpe_k=False, use_rpe_v=False)
    einsum_mod = RPEAttention(**kwargs, use_pallas=False)
    pallas_mod = RPEAttention(**kwargs, use_pallas=True)
    params = einsum_mod.init(jax.random.PRNGKey(0), x)
    out_e, _ = einsum_mod.apply(params, x)
    out_p, _ = pallas_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e), atol=1e-5, rtol=1e-5)
