"""Diffusion-space codecs: pixel, pre-encoded latent, and VAE latent.

Capability parity: the reference folds encode/decode into GaussianDiffusion
(gaussian_diffusion.py:173-181, 890-947: `diffusion_space` ∈ {pixel, latent},
`pre_encoded` normalization stats, SVD-VAE encode/decode). Here they're
separate codec objects so the diffusion core stays pure math; the train loop
and sampler compose ``codec.encode`` / ``codec.decode`` around it.

The primary production workflow matches the reference's pre-encoded path
(`carla_no_traffic_2x_encoded`): videos are VAE-encoded offline and
normalized, so training streams latents directly and only `decode` touches
the VAE. The VAE itself is a Flax port behind ``VAECodec`` (weights converted
offline from diffusers; see lfvdm_tpu/models/vae.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


class PixelCodec:
    """Identity codec: diffusion runs directly in pixel space."""

    diffusion_space = "pixel"
    pre_encoded = False

    def encode(self, video, rng=None):
        return video

    def decode(self, video):
        return video


@dataclasses.dataclass
class PreEncodedLatentCodec:
    """Latents were produced offline; only de-normalization happens at decode.

    ``mean``/``std`` are the channel-wise train-split statistics saved by the
    offline encoder (reference: encode_latent.py:75-88 +
    gaussian_diffusion.py:938-939). ``vae`` (optional) maps de-normalized
    latents back to pixels at the end of sampling.
    """

    mean: np.ndarray  # (C,)
    std: np.ndarray  # (C,)
    vae: Optional["object"] = None  # VAECodec-like, for pixel decode

    diffusion_space = "latent"
    pre_encoded = True

    def __post_init__(self):
        self.mean = np.asarray(self.mean, dtype=np.float32).reshape(1, 1, -1, 1, 1)
        self.std = np.asarray(self.std, dtype=np.float32).reshape(1, 1, -1, 1, 1)

    def encode(self, video, rng=None):
        # Inputs are already normalized latents.
        return video

    def decode(self, video):
        video = video * jnp.asarray(self.std) + jnp.asarray(self.mean)
        if self.vae is not None:
            return self.vae.decode(video)
        return video


@dataclasses.dataclass
class VAECodec:
    """Online VAE encode/decode in latent space (non-pre-encoded training).

    Wraps a Flax autoencoder with ``encode(x, rng) -> latents`` sampling
    mean + eps*std from the latent distribution (reference
    gaussian_diffusion.py:913-928) and ``decode(z) -> pixels``, chunked to
    bound peak memory.
    """

    vae: "object"  # lfvdm_tpu.models.vae.FlaxAutoencoderKL bundle
    chunk_size: int = 10

    diffusion_space = "latent"
    pre_encoded = False

    def encode(self, video, rng=None):
        return self.vae.encode_video(video, rng=rng, chunk_size=self.chunk_size)

    def decode(self, video):
        return self.vae.decode_video(video, chunk_size=self.chunk_size)


@dataclasses.dataclass
class WaveletCodec:
    """Orthonormal Haar wavelet-packet diffusion space (live, beyond-reference).

    The reference sketches this space but ships only dead code — every
    wavelet touchpoint raises NotImplementedError
    (gaussian_diffusion.py:908-909,929-930,946-947; broken dwt.py). Here it
    works: encode packs (B,T,C,H,W) pixels into (B,T,C·4^L,H/2^L,W/2^L)
    subband channels via an isometry (diffusion/wavelet.py), so N(0,I) noise
    and the beta schedule transfer unchanged; decode is the exact inverse.
    The U-Net then runs at 1/4^L the spatial cost per level in exchange for
    4^L× channels — the trade the reference's scratch was reaching for.
    """

    levels: int = 1

    diffusion_space = "wavelet"
    pre_encoded = False

    def encode(self, video, rng=None):
        from .wavelet import wavelet_pack

        return wavelet_pack(video, self.levels)

    def decode(self, video):
        from .wavelet import wavelet_unpack

        return wavelet_unpack(video, self.levels)


def make_codec_from_config(config: dict, *, vae_weights: Optional[str] = None,
                           require_vae: bool = False):
    """Build the codec a checkpoint's embedded config implies.

    Used by eval-time entry points (scripts/video_sample.py) so that "eval
    needs only a checkpoint path" extends to latent-space checkpoints: the
    sampled video is decoded to pixels before being written, matching the
    reference's in-loop decode (gaussian_diffusion.py:932-947 driven by
    scripts/video_sample.py:72-79 — here once on the assembled video).

    Normalization stats resolve from, in order: config-embedded
    ``enc_stats_mean``/``enc_stats_std`` lists (written by video_train.py),
    then the dataset registry's stats file. ``vae_weights`` (or
    $LFVDM_VAE_WEIGHTS) names the ``<prefix>_{encoder,decoder}.npz`` pair
    from scripts/convert_svd_vae.py; without it the decode stops at
    de-normalized latents unless ``require_vae`` forces a (random-init,
    shape-correct) VAE.
    """
    import os

    space = config.get("diffusion_space", "pixel")
    if space in (None, "pixel"):
        return PixelCodec()
    if space != "latent":
        return make_codec(space,
                          wavelet_levels=int(config.get("wavelet_levels", 1)))

    vae = None
    vae_weights = vae_weights or os.environ.get("LFVDM_VAE_WEIGHTS")
    if vae_weights:
        from ..models.vae import load_svd_vae

        vae = load_svd_vae(vae_weights)
    elif require_vae:
        from ..models.vae import SVDVae

        vae = SVDVae()  # random init — shape-correct protocol, garbage pixels

    if config.get("pre_encoded"):
        stats = None
        if config.get("enc_stats_mean") is not None:
            stats = {"mean": np.asarray(config["enc_stats_mean"], np.float32),
                     "std": np.asarray(config["enc_stats_std"], np.float32)}
        else:
            from ..data.datasets import load_encoding_stats

            stats = load_encoding_stats(config.get("dataset"))
        if stats is None:
            print("warning: latent norm stats unavailable; decoding with identity stats")
            C = int(config.get("in_channels", 4))
            stats = {"mean": np.zeros(C, np.float32), "std": np.ones(C, np.float32)}
        return PreEncodedLatentCodec(mean=stats["mean"], std=stats["std"], vae=vae)
    assert vae is not None, (
        "non-pre-encoded latent checkpoint needs VAE weights "
        "(--vae_weights / $LFVDM_VAE_WEIGHTS; see scripts/convert_svd_vae.py)"
    )
    return VAECodec(vae=vae)


def make_codec(diffusion_space: str, *, pre_encoded: bool = False,
               pre_encoded_stats: Optional[dict] = None, vae=None, chunk_size: int = 10,
               wavelet_levels: int = 1):
    """Config-level codec factory (mirrors diffusion_space_kwargs wiring)."""
    if diffusion_space in (None, "pixel"):
        return PixelCodec()
    if diffusion_space == "latent":
        if pre_encoded:
            assert pre_encoded_stats is not None, "pre-encoded latent space needs norm stats"
            return PreEncodedLatentCodec(
                mean=pre_encoded_stats["mean"], std=pre_encoded_stats["std"], vae=vae
            )
        assert vae is not None, "online latent space needs a VAE"
        return VAECodec(vae=vae, chunk_size=chunk_size)
    if diffusion_space == "wavelet":
        # Live here, NotImplementedError upstream (gaussian_diffusion.py:908).
        return WaveletCodec(levels=wavelet_levels)
    raise ValueError(f"Unknown diffusion space: {diffusion_space}")
