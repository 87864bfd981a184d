"""Codec factory semantics (fast tier): config -> codec resolution rules."""

import numpy as np
import pytest

from lfvdm_tpu.diffusion.codecs import (
    PixelCodec,
    PreEncodedLatentCodec,
    make_codec,
    make_codec_from_config,
)


def test_pixel_config_gives_identity_codec():
    codec = make_codec_from_config({"diffusion_space": "pixel"})
    assert isinstance(codec, PixelCodec)
    x = np.ones((1, 2, 3, 4, 4), np.float32)
    np.testing.assert_array_equal(codec.decode(x), x)


def test_missing_space_defaults_to_pixel():
    assert isinstance(make_codec_from_config({}), PixelCodec)


def test_embedded_stats_win_over_registry():
    codec = make_codec_from_config({
        "diffusion_space": "latent", "pre_encoded": True,
        "enc_stats_mean": [1.0, 2.0], "enc_stats_std": [3.0, 4.0],
        "dataset": "carla_no_traffic_2x_encoded",  # registry path would differ
    })
    assert isinstance(codec, PreEncodedLatentCodec)
    np.testing.assert_array_equal(codec.mean.reshape(-1), [1.0, 2.0])
    np.testing.assert_array_equal(codec.std.reshape(-1), [3.0, 4.0])
    z = np.random.default_rng(0).standard_normal((1, 1, 2, 2, 2)).astype(np.float32)
    want = z * codec.std + codec.mean
    np.testing.assert_allclose(np.asarray(codec.decode(z)), want, rtol=1e-6)


def test_latent_without_stats_falls_back_to_identity(capsys):
    codec = make_codec_from_config({
        "diffusion_space": "latent", "pre_encoded": True, "in_channels": 4,
    })
    assert isinstance(codec, PreEncodedLatentCodec)
    np.testing.assert_array_equal(codec.mean.reshape(-1), np.zeros(4))
    assert "identity stats" in capsys.readouterr().out


def test_online_latent_without_vae_raises():
    with pytest.raises(AssertionError, match="VAE weights"):
        make_codec_from_config({"diffusion_space": "latent", "pre_encoded": False})


def test_wavelet_space_is_live():
    """Beyond-reference: upstream raises NotImplementedError for wavelet
    space (gaussian_diffusion.py:908); here it resolves to a working codec
    (full pins in test_wavelet.py)."""
    from lfvdm_tpu.diffusion.codecs import WaveletCodec

    assert isinstance(make_codec_from_config({"diffusion_space": "wavelet"}),
                      WaveletCodec)
    assert isinstance(make_codec("wavelet"), WaveletCodec)
