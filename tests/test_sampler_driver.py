"""End-to-end video sampling through the jitted driver (tiny model)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.sampling.driver import VideoSampler

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=4, noise_schedule="cosine",
           compute_dtype="float32")
B, T, C, H, W = 2, 16, 2, 32, 32


@pytest.fixture(scope="module")
def sampler():
    model, diffusion = create_model_and_diffusion(CFG)
    x = np.zeros((B, 4, C, H, W), np.float32)
    fi = np.tile(np.arange(4)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, 4, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32), x0=x,
                        frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    # perturb so outputs are not exactly zero (zero-init head)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape).astype(np.float32),
        params,
    )
    return VideoSampler(model, diffusion, params)


def test_autoreg_full_video(sampler):
    rng = np.random.default_rng(1)
    batch = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, indices = sampler.sample_video(
        batch, scheme_name="autoreg", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(2),
    )
    assert samples.shape == batch.shape
    np.testing.assert_array_equal(samples[:, :4], batch[:, :4])  # observed kept
    assert np.all(np.isfinite(samples))
    covered = set(range(4))
    for _, latent in indices:
        covered.update(latent[0])
    assert covered == set(range(T))
    # generated frames are actually non-zero (model ran)
    assert np.abs(samples[:, 4:]).max() > 0


def test_hierarchy_full_video(sampler):
    rng = np.random.default_rng(3)
    batch = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, _ = sampler.sample_video(
        batch, scheme_name="hierarchy-2", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(4),
    )
    assert np.all(np.isfinite(samples))
    assert np.abs(samples[:, 4:]).max() > 0


def test_ddim_sampler():
    model, diffusion = create_model_and_diffusion({**CFG, "timestep_respacing": "ddim2"})
    x = np.zeros((B, 4, C, H, W), np.float32)
    fi = np.tile(np.arange(4)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, 4, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32), x0=x,
                        frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    s = VideoSampler(model, diffusion, params, use_ddim=True)
    assert diffusion.num_timesteps == 2
    rng = np.random.default_rng(5)
    batch = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, _ = s.sample_video(batch, scheme_name="autoreg", n_obs=4, max_frames=4,
                                step_size=2, rng=jax.random.PRNGKey(6))
    assert np.all(np.isfinite(samples))


def test_adaptive_scheme_through_driver(sampler):
    class MockEmbedder:
        def __call__(self, frames):
            return frames.reshape(frames.shape[0], -1)[:, :4].astype(np.float32)

    rng = np.random.default_rng(7)
    batch = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, _ = sampler.sample_video(
        batch, scheme_name="adaptive-autoreg", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(8), embedder=MockEmbedder(),
    )
    assert np.all(np.isfinite(samples))


def test_unconditional_sampling(sampler):
    batch = np.zeros((B, 8, C, H, W), np.float32)
    samples, indices = sampler.sample_video(
        batch, scheme_name="autoreg", n_obs=0, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(9),
    )
    # first call is fully latent (unconditional)
    obs0, latent0 = indices[0]
    assert obs0[0] == [] and len(latent0[0]) == 4
    assert np.abs(samples).max() > 0


def test_sampler_data_parallel_over_mesh(sampler):
    """The compiled sampler runs with inputs sharded over an 8-device dp
    mesh — multi-chip batched sampling is plain data parallelism
    (SURVEY.md §2.7: DP is the reference's one strategy)."""
    from lfvdm_tpu.parallel.mesh import make_mesh
    from lfvdm_tpu.parallel.sharding import data_sharding

    mesh = make_mesh()  # 8 virtual CPU devices via conftest
    Bs = 8
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((Bs, 4, C, H, W)).astype(np.float32)
    fi = np.tile(np.arange(4)[None], (Bs, 1)).astype(np.int32)
    obs = np.zeros((Bs, 4, 1, 1, 1), np.float32)
    obs[:, :2] = 1.0

    args = [jax.device_put(a, data_sharding(mesh, a.ndim))
            for a in (x0, fi, obs, 1.0 - obs)]
    out = sampler.sample_window(*args, jax.random.PRNGKey(3))
    out_np = np.asarray(out)
    assert out_np.shape == (Bs, 4, C, H, W)
    assert np.isfinite(out_np).all()
    # outputs stay sharded over the batch axis (no implicit full replication)
    assert len(out.sharding.device_set) == 8

def test_attention_quartile_maps():
    """Per-quartile attention averaging (ref gaussian_diffusion.py:448-469).

    Two attention resolutions so the spatial nearest-resize + renormalize
    path is exercised. Temporal maps: each layer's head/site-averaged
    softmax rows sum to 1, layers are summed, quartiles averaged — so every
    row of a quartile map sums to ~n_attn_layers.
    """
    cfg = {**CFG, "attention_resolutions": "16,8", "diffusion_steps": 8}
    model, diffusion = create_model_and_diffusion(cfg)
    K = 4
    x = np.random.default_rng(1).standard_normal((B, K, C, H, W)).astype(np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    obs = np.zeros((B, K, 1, 1, 1), np.float32)
    obs[:, :1] = 1.0
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32), x0=x,
                        frame_indices=fi, obs_mask=obs, latent_mask=1 - obs)
    sampler = VideoSampler(model, diffusion, params)

    img, attns = sampler.sample_window_attn(x, fi, obs, 1 - obs,
                                            jax.random.PRNGKey(2))
    assert np.asarray(img).shape == (B, K, C, H, W)
    assert sorted(attns.keys()) == sorted(
        [f"attn/q{q}-{k}" for q in range(4) for k in ("temporal", "spatial")]
    )
    # infer the attention-layer count L from row sums: each layer's
    # softmax rows sum to 1 and layers are summed before quartile-averaging
    q0 = np.asarray(attns["attn/q0-temporal"])
    assert q0.shape == (B, K, K)
    row_sums = q0.sum(-1)
    L = round(float(row_sums.mean()))
    assert L >= 2  # down + middle + up layers at two resolutions
    np.testing.assert_allclose(row_sums, L, rtol=0.35)
    # every quartile map is non-negative and finite
    for v in attns.values():
        v = np.asarray(v)
        assert np.isfinite(v).all() and (v >= -1e-6).all()
    # spatial maps resized to the first layer's token count (16x16 = 256)
    assert np.asarray(attns["attn/q0-spatial"]).shape == (B, 256, 256)


def test_latent_codec_decodes_assembled_video(sampler):
    """A latent-space sampler decodes the ASSEMBLED video once at the end
    (reference decodes in-loop: gaussian_diffusion.py:932-947; driver
    docstring promises the end-of-video decode). With a stub VAE the decode
    is exactly de-normalize -> vae.decode, pixel-shaped output."""
    from lfvdm_tpu.diffusion.codecs import PreEncodedLatentCodec

    mean = np.asarray([0.5, -0.25], np.float32)
    std = np.asarray([2.0, 0.5], np.float32)

    class StubVAE:
        """Latent (B,T,C,h,w) -> 'pixels' (B,T,3,8h,8w), recordably."""

        def decode(self, video):
            video = np.asarray(video)
            up = np.repeat(np.repeat(video, 8, axis=-2), 8, axis=-1)
            return np.concatenate([up, up[:, :, :1]], axis=2)[:, :, :3]

    codec = PreEncodedLatentCodec(mean=mean, std=std, vae=StubVAE())
    latent_sampler = VideoSampler(sampler.model, sampler.diffusion,
                                  sampler.params, codec=codec)
    rng = np.random.default_rng(11)
    batch = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, _ = latent_sampler.sample_video(
        batch, scheme_name="autoreg", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(12),
    )
    assert samples.shape == (B, T, 3, H * 8, W * 8)
    assert np.isfinite(samples).all()
    # Observed frames pass through the buffer untouched, so their decode is
    # exactly denorm(batch) -> stub upsample: pin channel 0 numerically.
    expected_c0 = batch[:, :4, 0] * std[0] + mean[0]
    np.testing.assert_allclose(samples[:, :4, 0, ::8, ::8], expected_c0, rtol=1e-5)
    # just_get_indices must NOT decode (index planning stays in latent space)
    raw, _ = latent_sampler.sample_video(
        batch, scheme_name="autoreg", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(12), just_get_indices=True,
    )
    assert raw.shape == batch.shape


def test_latent_codec_without_vae_denormalizes(sampler):
    """No VAE weights -> decode stops at de-normalized latents (same shape),
    still applied to the assembled video."""
    from lfvdm_tpu.diffusion.codecs import PreEncodedLatentCodec

    mean = np.zeros(C, np.float32) + 3.0
    std = np.ones(C, np.float32)
    codec = PreEncodedLatentCodec(mean=mean, std=std)
    latent_sampler = VideoSampler(sampler.model, sampler.diffusion,
                                  sampler.params, codec=codec)
    batch = np.random.default_rng(13).standard_normal((B, 8, C, H, W)).astype(np.float32)
    samples, _ = latent_sampler.sample_video(
        batch, scheme_name="autoreg", n_obs=4, max_frames=4, step_size=2,
        rng=jax.random.PRNGKey(14),
    )
    assert samples.shape == batch.shape
    np.testing.assert_allclose(samples[:, :4], batch[:, :4] + 3.0, rtol=1e-5)


def test_encoder_reuse_sampler(sampler):
    """Training-free encoder propagation (arXiv:2312.09608): k=2 runs the
    encoder every other step inside one compiled scan. Same seed as the
    exact sampler -> results stay close on a near-zero model, and the
    observed-frame conditioning path is untouched."""
    model, diffusion, params = sampler.model, sampler.diffusion, sampler.params
    fast = VideoSampler(model, diffusion, params, encoder_reuse=2)

    K = 4
    x = np.random.default_rng(3).standard_normal((B, K, C, H, W)).astype(np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    obs = np.zeros((B, K, 1, 1, 1), np.float32)
    obs[:, :1] = 1.0
    key = jax.random.PRNGKey(7)
    exact = np.asarray(sampler.sample_window(x, fi, obs, 1 - obs, key))
    approx = np.asarray(fast.sample_window(x, fi, obs, 1 - obs, key))
    assert np.isfinite(approx).all()
    assert approx.shape == exact.shape
    # identical rng stream; only reused-encoder steps differ — near-zero
    # model => small deviation, definitely not garbage
    assert np.abs(approx - exact).mean() < 0.5, np.abs(approx - exact).mean()
    # ddim + encoder_reuse is rejected
    with pytest.raises(AssertionError):
        VideoSampler(model, diffusion, params, use_ddim=True, encoder_reuse=2)


def test_mesh_sharded_sampling_matches_unsharded():
    """DP-sharded sampling over the 8-device mesh: the window output is
    batch-sharded across devices and numerically matches the unsharded
    sampler (partitionable threefry keeps in-loop noise sharding-invariant)."""
    from lfvdm_tpu.parallel.mesh import make_mesh

    model, diffusion = create_model_and_diffusion(CFG)
    Bm, K = 8, 4
    x = np.zeros((Bm, K, C, H, W), np.float32)
    fi = np.tile(np.arange(K)[None], (Bm, 1)).astype(np.int32)
    m = np.zeros((Bm, K, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((Bm,), np.int32),
                        x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape).astype(np.float32),
        params,
    )
    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((Bm, K, C, H, W)).astype(np.float32)
    obs = np.zeros((Bm, K, 1, 1, 1), np.float32)
    obs[:, :2] = 1.0
    key = jax.random.PRNGKey(8)

    plain = VideoSampler(model, diffusion, params)
    want = np.asarray(plain.sample_window(x0, fi, obs, 1 - obs, key))

    mesh = make_mesh(devices=jax.devices()[:8])
    sharded = VideoSampler(model, diffusion, params, mesh=mesh)
    out = sharded.sample_window(x0, fi, obs, 1 - obs, key)
    assert len(out.sharding.device_set) == 8  # actually spread over the mesh
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    # non-divisible tail batches fall back to replicated execution
    tail = np.asarray(sharded.sample_window(x0[:3], fi[:3], obs[:3],
                                            1 - obs[:3], key))
    assert tail.shape == (3, K, C, H, W) and np.isfinite(tail).all()
