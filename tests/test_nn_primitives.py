"""Unit tests for NN primitives against the torch oracle.

GroupNorm32 uses a TPU-layout-friendly formulation (reduce-then-group,
one-pass variance, affine folded into one fused pass) — these tests pin it
elementwise to torch.nn.functional.group_norm, which is what the reference's
GroupNorm32 wraps (reference improved_diffusion/nn.py:12-19).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.models.nn import GroupNorm32, timestep_embedding


@pytest.mark.parametrize("shape,groups", [
    ((4, 16, 16, 64), 32),     # NHWC conv activation
    ((3, 7, 48), 32),          # (N, tokens, C) attention pre-norm; gcd->16
    ((2, 5, 5, 32), 32),       # C == groups
    ((2, 9, 96), 32),
])
def test_group_norm_matches_torch(shape, groups):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32) * 3.0 + 1.5
    C = shape[-1]

    gn = GroupNorm32(groups=groups)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # non-trivial affine
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = np.asarray(gn.apply(params, jnp.asarray(x)))

    # torch group_norm expects (N, C, *): move channels to dim 1.
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    import math

    g = groups if C % groups == 0 else math.gcd(groups, C)
    ref = torch.nn.functional.group_norm(
        xt, g, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5
    ).numpy()
    ref = np.moveaxis(ref, 1, -1)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_group_norm_large_mean_no_cancellation():
    """One-pass variance must survive |mean| >> std (anchored formulation)."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 16, 16, 64)) * 0.1 + 500.0).astype(np.float32)
    gn = GroupNorm32(groups=32)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(gn.apply(params, jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref = torch.nn.functional.group_norm(xt, 32, eps=1e-5).numpy()
    ref = np.moveaxis(ref, 1, -1)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_group_norm_bf16_passthrough_dtype():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 64)), jnp.bfloat16)
    gn = GroupNorm32()
    params = gn.init(jax.random.PRNGKey(0), x)
    out = gn.apply(params, x)
    assert out.dtype == jnp.bfloat16
    # statistics are f32: normalized output mean ~0, var ~1 per group
    o32 = np.asarray(out, np.float32).reshape(2, -1, 32, 2)
    assert abs(o32.mean(axis=(1, 3))).max() < 0.05


def test_group_norm_out_dtype_override():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, 4, 64)), jnp.bfloat16)
    gn = GroupNorm32(out_dtype=jnp.float32)
    params = gn.init(jax.random.PRNGKey(0), x)
    assert gn.apply(params, x).dtype == jnp.float32


def test_unet_output_head_is_float32_under_bf16_torso():
    """Sampling-correctness regression: at high t the eps signal is ~√ᾱ·x0
    (1e-3 at t≈T); a bf16 output head quantizes it away and the ancestral
    chain locks onto wrong content (verified empirically on an overfit toy).
    The head must be f32 regardless of compute dtype."""
    from lfvdm_tpu.config import create_model_and_diffusion

    cfg = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
               attention_resolutions="8", diffusion_steps=8,
               noise_schedule="cosine", compute_dtype="bfloat16")
    model, _ = create_model_and_diffusion(cfg)
    B, K = 1, 3
    x = jnp.zeros((B, K, 2, 32, 32), jnp.float32)
    fi = jnp.tile(jnp.arange(K)[None], (B, 1)).astype(jnp.int32)
    m = jnp.zeros((B, K, 1, 1, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32),
                        x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    out, _ = model.apply(params, x, jnp.zeros((B,), jnp.int32), x0=x,
                         frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    assert out.dtype == jnp.float32
    # the head conv weights themselves must be f32 (flax dtype=f32 upcasts)
    kern = params["params"]["out_conv"]["kernel"]
    assert kern.dtype == jnp.float32


def test_timestep_embedding_matches_torch_reference_layout():
    """cos|sin ordering and fractional timesteps (reference nn.py:105-123)."""
    t = jnp.asarray([0.0, 1.0, 17.5, 999.0])
    emb = np.asarray(timestep_embedding(t, 128))
    assert emb.shape == (4, 128)
    # t=0: cos(0)=1 for the first half, sin(0)=0 for the second half
    np.testing.assert_allclose(emb[0, :64], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 64:], 0.0, atol=1e-6)
    # norm per row is sqrt(sum cos^2 + sin^2) = sqrt(half)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), np.sqrt(64.0), rtol=1e-5)
