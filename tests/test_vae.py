"""SVD VAE (Flax) shape/API tests (random weights — numerics validated by
scripts/convert_svd_vae.py against diffusers in an egress-enabled env)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def vae():
    from lfvdm_tpu.models.vae import SVDVae

    return SVDVae(image_size=64)


pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

def test_encode_decode_shapes(vae):
    rng = np.random.default_rng(0)
    video = rng.uniform(-1, 1, (1, 3, 3, 64, 64)).astype(np.float32)
    z = np.asarray(vae.encode_video(video, rng=jax.random.PRNGKey(0)))
    assert z.shape == (1, 3, 4, 8, 8)
    x = np.asarray(vae.decode_video(z))
    assert x.shape == (1, 3, 3, 64, 64)
    assert np.all(np.isfinite(x))


def test_encode_deterministic_without_rng(vae):
    rng = np.random.default_rng(1)
    video = rng.uniform(-1, 1, (1, 2, 3, 64, 64)).astype(np.float32)
    z1 = np.asarray(vae.encode_video(video))
    z2 = np.asarray(vae.encode_video(video))
    np.testing.assert_array_equal(z1, z2)


def test_encode_stochastic_with_rng(vae):
    rng = np.random.default_rng(2)
    video = rng.uniform(-1, 1, (1, 2, 3, 64, 64)).astype(np.float32)
    z1 = np.asarray(vae.encode_video(video, rng=jax.random.PRNGKey(1)))
    z2 = np.asarray(vae.encode_video(video, rng=jax.random.PRNGKey(2)))
    assert not np.array_equal(z1, z2)


def test_codec_roundtrip_pre_encoded():
    from lfvdm_tpu.diffusion.codecs import make_codec

    stats = {"mean": np.array([1.0, 2.0, 3.0, 4.0]), "std": np.array([2.0, 2.0, 2.0, 2.0])}
    codec = make_codec("latent", pre_encoded=True, pre_encoded_stats=stats)
    z = np.random.default_rng(3).standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
    decoded = np.asarray(codec.decode(jnp.asarray(z)))
    expected = z * stats["std"].reshape(1, 1, 4, 1, 1) + stats["mean"].reshape(1, 1, 4, 1, 1)
    np.testing.assert_allclose(decoded, expected, rtol=1e-6)


def test_load_svd_vae_npz_roundtrip(vae, tmp_path):
    """The converter's flatten() npz format round-trips through
    load_svd_vae: identical decode outputs (pins the on-disk layout the
    offline torch->Flax conversion writes)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from convert_svd_vae import flatten

    from lfvdm_tpu.models.vae import load_svd_vae

    prefix = str(tmp_path / "svd_vae")
    np.savez(f"{prefix}_encoder.npz",
             **{k: np.asarray(v) for k, v in flatten(vae.enc_vars).items()})
    np.savez(f"{prefix}_decoder.npz",
             **{k: np.asarray(v) for k, v in flatten(vae.dec_vars).items()})
    loaded = load_svd_vae(prefix)
    assert loaded.pretrained
    z = np.random.default_rng(5).standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(loaded.decode_video(z)),
                               np.asarray(vae.decode_video(z)), rtol=1e-6)


def test_make_codec_from_config_decodes_with_real_vae(vae, tmp_path, monkeypatch):
    """The flagship latent-eval path: PreEncodedLatentCodec built by
    make_codec_from_config with SVD-VAE weights must decode latents to
    pixel-shaped output (regression: SVDVae lacked the codec-facing
    .decode and the decode crashed AFTER the full sampling run)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from convert_svd_vae import flatten

    from lfvdm_tpu.diffusion.codecs import make_codec_from_config

    prefix = str(tmp_path / "svd_vae")
    np.savez(f"{prefix}_encoder.npz",
             **{k: np.asarray(v) for k, v in flatten(vae.enc_vars).items()})
    np.savez(f"{prefix}_decoder.npz",
             **{k: np.asarray(v) for k, v in flatten(vae.dec_vars).items()})

    codec = make_codec_from_config(
        {"diffusion_space": "latent", "pre_encoded": True,
         "enc_stats_mean": [0.0] * 4, "enc_stats_std": [1.0] * 4},
        vae_weights=prefix,
    )
    z = np.random.default_rng(7).standard_normal((1, 2, 4, 8, 8)).astype(np.float32)
    out = np.asarray(codec.decode(z))
    assert out.shape == (1, 2, 3, 64, 64)
    assert np.isfinite(out).all()
