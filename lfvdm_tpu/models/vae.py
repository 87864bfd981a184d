"""Stable Video Diffusion VAE (AutoencoderKL + temporal decoder) in Flax.

Capability parity: the diffusers SVD VAE the reference drives through
``StableVideoDiffusionPipeline`` (gaussian_diffusion.py:890-947): `encode`
samples ``mean + eps * std`` from the latent distribution of each frame;
`decode` maps latents back to pixels per-frame (the reference always calls
``vae.decode(chunk, num_frames=1)``).

Architecture follows diffusers' ``AutoencoderKLTemporalDecoder``:
  Encoder:  conv_in -> 4x DownEncoderBlock2D (128/256/512/512, 2 resnets,
            asymmetric-pad stride-2 downsample) -> mid (resnet, attention,
            resnet) -> GroupNorm/SiLU/conv_out(8ch) -> quant_conv(1x1)
  Decoder:  conv_in -> mid (SpatioTemporalResBlock x2 + attention) ->
            4x UpBlockTemporalDecoder (3 SpatioTemporalResBlocks + 2x
            upsample) -> GroupNorm/SiLU/conv_out -> time_conv_out (3,1,1).
  SpatioTemporalResBlock = spatial ResnetBlock2D + temporal (3,1,1)-conv
  ResnetBlock, blended by a learned sigmoid AlphaBlender.

Weights convert from the diffusers checkpoint via
scripts/convert_svd_vae.py (requires diffusers + egress; numeric validation
against torch happens there). Activations NHWC; GroupNorm eps 1e-6.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GN(nn.Module):
    """GroupNorm(32) with eps=1e-6 computed in f32 (diffusers convention)."""

    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        orig = x.dtype
        x = x.astype(jnp.float32)
        xg = x.reshape(x.shape[0], -1, self.groups, C // self.groups)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        x = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(x.shape)
        return (x * scale + bias).astype(orig)


class ResnetBlock2D(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(GN(name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv1")(h)
        h = nn.silu(GN(name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention with residual (diffusers Attention)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GN(name="group_norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(h)
        k = nn.Dense(C, name="to_k")(h)
        v = nn.Dense(C, name="to_v")(h)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits * (C ** -0.5), axis=-1).astype(h.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(C, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class Downsample2D(nn.Module):
    """Stride-2 conv with diffusers' asymmetric (0,1) padding."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding="SAME", name="conv")(x)


class Encoder(nn.Module):
    """2D VAE encoder -> (B, h, w, 2*latent_channels) moments."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding="SAME", name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(ch, name=f"down_{i}_res_{j}")(h)
            if i != len(self.block_out_channels) - 1:
                h = Downsample2D(ch, name=f"down_{i}_downsample")(h)
        ch = self.block_out_channels[-1]
        h = ResnetBlock2D(ch, name="mid_res_1")(h)
        h = AttnBlock(ch, name="mid_attn")(h)
        h = ResnetBlock2D(ch, name="mid_res_2")(h)
        h = nn.silu(GN(name="conv_norm_out")(h))
        h = nn.Conv(2 * self.latent_channels, (3, 3), padding="SAME", name="conv_out")(h)
        return nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")(h)


class TemporalResnetBlock(nn.Module):
    """ResnetBlock with (3,1,1) 3D convs over (T, H, W)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        # GroupNorm stats span (T, H, W) jointly — torch GroupNorm on the
        # 5-D (B, C, T, H, W) input (diffusers TemporalResnetBlock), NOT
        # per-frame stats; GN flattens all non-batch/channel dims already.
        h = nn.silu(GN(name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    name="conv1")(h)
        h2 = nn.silu(GN(name="norm2")(h))
        h2 = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                     name="conv2")(h2)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), name="conv_shortcut")(x)
        return x + h2


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet + temporal resnet, learned sigmoid blend."""

    out_channels: int

    @nn.compact
    def __call__(self, x, num_frames: int):  # x: (B*T, H, W, C)
        h_spatial = ResnetBlock2D(self.out_channels, name="spatial_res_block")(x)
        BT, H, W, C = h_spatial.shape
        B = BT // num_frames
        h_t = h_spatial.reshape(B, num_frames, H, W, C)
        h_temporal = TemporalResnetBlock(self.out_channels, name="temporal_res_block")(h_t)
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,), jnp.float32)
        alpha = jax.nn.sigmoid(mix)
        out = alpha * h_t + (1 - alpha) * h_temporal
        return out.reshape(BT, H, W, C)


class TemporalDecoder(nn.Module):
    """SVD temporal decoder: (B*T, h, w, 4) latents -> (B*T, H, W, 3) pixels."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3

    @nn.compact
    def __call__(self, z, num_frames: int = 1):
        ch = self.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", name="conv_in")(z)
        h = SpatioTemporalResBlock(ch, name="mid_res_1")(h, num_frames)
        h = AttnBlock(ch, name="mid_attn")(h)
        h = SpatioTemporalResBlock(ch, name="mid_res_2")(h, num_frames)
        for i, c in enumerate(reversed(self.block_out_channels)):
            for j in range(self.layers_per_block + 1):
                h = SpatioTemporalResBlock(c, name=f"up_{i}_res_{j}")(h, num_frames)
            if i != len(self.block_out_channels) - 1:
                h = Upsample2D(c, name=f"up_{i}_upsample")(h)
        h = nn.silu(GN(name="conv_norm_out")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_out")(h)
        # final temporal smoothing conv over (T,1,1)
        BT, H, W, C = h.shape
        ht = h.reshape(BT // num_frames, num_frames, H, W, C)
        ht = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                     name="time_conv_out")(ht)
        return ht.reshape(BT, H, W, C)


def encoder_config_from_params(variables) -> dict:
    """Infer Encoder config from a converted param tree (weights win over
    assumptions — a miniature or future-variant checkpoint builds a matching
    module instead of failing with an opaque shape error)."""
    p = variables.get("params", variables)
    blocks = []
    while f"down_{len(blocks)}_res_0" in p:
        blocks.append(int(p[f"down_{len(blocks)}_res_0"]["conv1"]["kernel"].shape[-1]))
    layers = 0
    while f"down_0_res_{layers}" in p:
        layers += 1
    latent = int(p["quant_conv"]["kernel"].shape[-1]) // 2
    return dict(block_out_channels=tuple(blocks), layers_per_block=layers,
                latent_channels=latent)


def decoder_config_from_params(variables) -> dict:
    """Infer TemporalDecoder config from a converted param tree."""
    p = variables.get("params", variables)
    rev = []
    while f"up_{len(rev)}_res_0" in p:
        rev.append(int(
            p[f"up_{len(rev)}_res_0"]["spatial_res_block"]["conv1"]["kernel"].shape[-1]))
    layers = 0
    while f"up_0_res_{layers}" in p:
        layers += 1
    out_ch = int(p["conv_out"]["kernel"].shape[-1])
    return dict(block_out_channels=tuple(reversed(rev)), layers_per_block=layers - 1,
                out_channels=out_ch)


class SVDVae:
    """Bundle: params + chunked video encode/decode (reference API shape).

    ``encode_video``: (B, T, 3, H, W) in [-1, 1] -> (B, T, 4, H/8, W/8)
    latents sampled as mean + eps*std (gaussian_diffusion.py:913-928; no
    scaling factor applied — the reference omits it symmetrically).
    ``decode_video``: inverse per-frame (num_frames=1, matching the
    reference's decode(chunk, num_frames=1)).
    """

    def __init__(self, variables=None, rng_seed: int = 0, image_size: int = 256,
                 dtype=jnp.bfloat16):
        self.dtype = dtype
        if variables is not None:
            self.enc_vars, self.dec_vars = variables
            # Module config comes from the WEIGHTS, not assumptions.
            self.encoder = Encoder(**encoder_config_from_params(self.enc_vars))
            self.decoder = TemporalDecoder(**decoder_config_from_params(self.dec_vars))
            self.pretrained = True
        else:
            print("SVD VAE weights unavailable — randomly initialized "
                  "(convert with scripts/convert_svd_vae.py).")
            self.encoder = Encoder()
            self.decoder = TemporalDecoder()
            key = jax.random.PRNGKey(rng_seed)
            dummy_img = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            dummy_lat = jnp.zeros((1, image_size // 8, image_size // 8, 4), jnp.float32)
            self.enc_vars = self.encoder.init(key, dummy_img)
            self.dec_vars = self.decoder.init(key, dummy_lat, num_frames=1)
            self.pretrained = False
        self._encode = jax.jit(partial(self.encoder.apply, self.enc_vars))
        self._decode = jax.jit(partial(self.decoder.apply, self.dec_vars, num_frames=1))

    def encode_video(self, video, rng=None, chunk_size: int = 10):
        video = jnp.asarray(video)
        B, T, C, H, W = video.shape
        frames = video.reshape(B * T, C, H, W).transpose(0, 2, 3, 1)
        outs = []
        for i in range(0, B * T, chunk_size):
            moments = self._encode(frames[i:i + chunk_size])
            mean, logvar = jnp.split(moments, 2, axis=-1)
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            if rng is not None:
                rng, key = jax.random.split(rng)
                eps = jax.random.normal(key, std.shape, std.dtype)
            else:
                eps = 0.0
            outs.append(mean + eps * std)
        z = jnp.concatenate(outs, axis=0)  # (B*T, h, w, 4)
        h, w = z.shape[1:3]
        return z.transpose(0, 3, 1, 2).reshape(B, T, 4, h, w)

    def decode_video(self, latents, chunk_size: int = 20):
        latents = jnp.asarray(latents)
        B, T, C, h, w = latents.shape
        z = latents.reshape(B * T, C, h, w).transpose(0, 2, 3, 1)
        outs = [self._decode(z[i:i + chunk_size]) for i in range(0, B * T, chunk_size)]
        x = jnp.concatenate(outs, axis=0)
        H, W = x.shape[1:3]
        return x.transpose(0, 3, 1, 2).reshape(B, T, 3, H, W)

    # Codec-facing aliases: PreEncodedLatentCodec calls ``vae.decode(video)``
    # on the de-normalized latents (and VAECodec-like callers ``encode``).
    def decode(self, video):
        return self.decode_video(video)

    def encode(self, video, rng=None):
        return self.encode_video(video, rng=rng)


def _unflatten(flat: dict) -> dict:
    tree = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def load_svd_vae(path_prefix: str, **kwargs) -> "SVDVae":
    """Load an SVDVae from the ``<prefix>_{encoder,decoder}.npz`` pair
    written by scripts/convert_svd_vae.py."""
    enc = np.load(f"{path_prefix}_encoder.npz")
    dec = np.load(f"{path_prefix}_decoder.npz")
    variables = ({"params": _unflatten(dict(enc))["params"]},
                 {"params": _unflatten(dict(dec))["params"]})
    return SVDVae(variables=variables, **kwargs)
