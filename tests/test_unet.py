"""Video U-Net: shapes, semantics, jit, grads, and full torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.config import create_model, create_model_and_diffusion

CFG = dict(image_size=32, in_channels=4, num_channels=32, num_res_blocks=1,
           attention_resolutions="16,8", diffusion_steps=32, compute_dtype="float32")


def make_inputs(B=2, T=5, C=4, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    x0 = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    t = rng.integers(0, 32, (B,)).astype(np.int32)
    fi = np.sort(rng.integers(0, 100, (B, T)), axis=1).astype(np.int32)
    obs = np.zeros((B, T, 1, 1, 1), np.float32)
    obs[:, :2] = 1.0
    lat = np.zeros((B, T, 1, 1, 1), np.float32)
    lat[:, 2:4] = 1.0
    return tuple(map(jnp.asarray, (x, x0, t, fi, obs, lat)))


@pytest.fixture(scope="module")
def model_and_params():
    model, _ = create_model_and_diffusion(CFG)
    x, x0, t, fi, obs, lat = make_inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, x0=x0, frame_indices=fi,
                        obs_mask=obs, latent_mask=lat)
    return model, params


def test_output_shape_and_finite(model_and_params):
    model, params = model_and_params
    x, x0, t, fi, obs, lat = make_inputs()
    out, attns = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                             latent_mask=lat)
    assert out.shape == x.shape
    assert attns is None
    assert np.all(np.isfinite(np.asarray(out)))


def test_zero_init_head_outputs_zero_at_init(model_and_params):
    """The output conv is zero-initialized, so a fresh model emits zeros
    (exact epsilon-prediction of zero) — matches reference init."""
    model, params = model_and_params
    x, x0, t, fi, obs, lat = make_inputs(seed=3)
    out, _ = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                         latent_mask=lat)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_observed_frames_replace_input(model_and_params):
    """x at observed positions is replaced by x0 — the noisy x there must
    have no effect (unet.py:443-448)."""
    model, params = model_and_params
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).standard_normal(p.shape).astype(np.float32),
        params,
    )
    x, x0, t, fi, obs, lat = make_inputs(seed=4)
    x_perturbed = x.at[:, :2].add(jax.random.normal(jax.random.PRNGKey(5), x[:, :2].shape))
    out1, _ = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    out2, _ = model.apply(params, x_perturbed, t, x0=x0, frame_indices=fi, obs_mask=obs,
                          latent_mask=lat)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)


def test_learn_sigma_doubles_channels():
    model = create_model(32, 4, 32, 1, learn_sigma=True, compute_dtype="float32")
    x, x0, t, fi, obs, lat = make_inputs()
    params = model.init(jax.random.PRNGKey(0), x, t, x0=x0, frame_indices=fi,
                        obs_mask=obs, latent_mask=lat)
    out, _ = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    assert out.shape == (2, 5, 8, 32, 32)


def test_jit_and_grad(model_and_params):
    model, params = model_and_params
    x, x0, t, fi, obs, lat = make_inputs(seed=6)

    @jax.jit
    def loss_fn(params):
        out, _ = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                             latent_mask=lat)
        return jnp.mean((out - x0) ** 2 * lat)

    g = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(p**2) for p in jax.tree.leaves(g)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_attn_weights_logging(model_and_params):
    model, params = model_and_params
    x, x0, t, fi, obs, lat = make_inputs()
    out, attns = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                             latent_mask=lat, return_attn_weights=True)
    assert set(attns) == {"temporal", "spatial"}
    assert len(attns["temporal"]) > 0
    for a in attns["temporal"]:
        assert a.shape == (2, 5, 5)  # (B, T, T)


def test_bf16_close_to_f32(model_and_params):
    model_f32, params = model_and_params
    model_bf16, _ = create_model_and_diffusion({**CFG, "compute_dtype": "bfloat16"})
    x, x0, t, fi, obs, lat = make_inputs(seed=7)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(8).standard_normal(p.shape).astype(np.float32),
        params,
    )
    out32, _ = model_f32.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                               latent_mask=lat)
    out16, _ = model_bf16.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                                latent_mask=lat)
    assert out16.dtype == jnp.float32  # head is f32
    err = np.abs(np.asarray(out32) - np.asarray(out16)).max()
    assert err < 0.1, err


def test_unet_full_parity_with_reference(reference):
    """End-to-end network parity: convert a randomly-initialized reference
    UNetVideoModel's weights and compare outputs on identical inputs."""
    import torch
    from improved_diffusion.script_util import create_model as ref_create_model

    from lfvdm_tpu.utils.torch_convert import convert_unet_state_dict

    torch.manual_seed(0)
    ref_model = ref_create_model(
        image_size=32, in_channels=4, num_channels=32, num_res_blocks=1,
        learn_sigma=False, class_cond=False, use_checkpoint=False,
        attention_resolutions="16,8", num_heads=4, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, use_rpe_net=True,
    )
    ref_model.eval()
    with torch.no_grad():
        # randomize so zero-init layers don't hide bugs
        for p in ref_model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = convert_unet_state_dict(
        sd, num_res_blocks=1, channel_mult=(1, 2, 2, 2), attention_resolutions=(2, 4),
    )

    model = create_model(32, 4, 32, 1, compute_dtype="float32")
    x, x0, t, fi, obs, lat = make_inputs(seed=9)

    with torch.no_grad():
        ref_out, _ = ref_model(
            torch.tensor(np.asarray(x)), x0=torch.tensor(np.asarray(x0)),
            timesteps=torch.tensor(np.asarray(t)),
            frame_indices=torch.tensor(np.asarray(fi, dtype=np.int64)),
            obs_mask=torch.tensor(np.asarray(obs)),
            latent_mask=torch.tensor(np.asarray(lat)),
        )
    our_out, _ = model.apply(params, x, t, x0=x0, frame_indices=fi, obs_mask=obs,
                             latent_mask=lat)
    np.testing.assert_allclose(
        np.asarray(our_out), ref_out.numpy(), rtol=1e-3, atol=2e-4
    )
