"""Export/serving roundtrip: jax.export artifact == live sampler output."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu import serving
from lfvdm_tpu.config import create_model_and_diffusion

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=4, noise_schedule="cosine",
           compute_dtype="float32")
B, K, C, H = 1, 4, 2, 32


def _setup():
    model, diffusion = create_model_and_diffusion(CFG)
    x = np.zeros((B, K, C, H, H), np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, K, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32),
                        x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).standard_normal(p.shape).astype(np.float32),
        params)
    return model, diffusion, params


def test_export_roundtrip_matches_live_sampler(tmp_path):
    model, diffusion, params = _setup()
    blob = serving.export_window_sampler(
        model, diffusion, params, batch_size=B, max_frames=K,
        in_channels=C, image_size=H)
    assert len(blob) > 1000

    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((B, K, C, H, H)).astype(np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    obs = np.zeros((B, K, 1, 1, 1), np.float32)
    obs[:, :2] = 1.0
    key = jax.random.PRNGKey(7)
    key_data = np.asarray(jax.random.key_data(key))

    served = serving.load_window_sampler(blob)
    out_served = np.asarray(served(params, x0, fi, obs, 1.0 - obs, key_data))

    live_fn = serving.make_window_sampler(model, diffusion)
    out_live = np.asarray(jax.jit(live_fn)(params, x0, fi, obs, 1.0 - obs, key))

    assert out_served.shape == (B, K, C, H, H)
    np.testing.assert_allclose(out_served, out_live, atol=1e-5, rtol=1e-5)


def test_params_npz_roundtrip(tmp_path):
    _, _, params = _setup()
    path = str(tmp_path / "params.npz")
    serving.save_params_npz(params, path)
    like = jax.tree.map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params)
    restored = serving.load_params_npz(path, like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
