"""LPIPS perceptual embedder in JAX (AlexNet backbone).

Capability parity: the reference's ``LpipsEmbedder``
(/root/reference/improved_diffusion/sampling_schemes.py:7-29) — emits an
embedding whose *squared L2 distance* equals the LPIPS distance, used by the
adaptive sampling schemes to pick maximally-diverse conditioning frames.

Embedding construction per AlexNet stage l with LPIPS head weights w_l ≥ 0:
  e_l = sqrt(w_l) * (f_l / ||f_l||_channel) / sqrt(H_l W_l),  flattened
  embedding = concat_l e_l
so ||e(x) - e(y)||² = Σ_l mean_{hw} Σ_c w_l (f̂_l(x) - f̂_l(y))² = LPIPS(x, y).

Pretrained weights: pass an .npz path (converted offline from the ``lpips``
pip package via scripts/convert_lpips.py) or set LFVDM_LPIPS_WEIGHTS. With no
weights available (this image has no network egress) a deterministic
randomly-initialized backbone is used — functionally valid for the adaptive
schemes' max-min diversity selection, clearly logged as non-pretrained.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageNet scaling constants used by LPIPS's ScalingLayer.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature-stage channel widths tapped by LPIPS.
_STAGE_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision-AlexNet ``features`` trunk, returning the 5 relu taps."""

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3)
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)), name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class LpipsEmbedderModule(nn.Module):
    """AlexNet taps -> unit-normalized, head-weighted, flattened embedding."""

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, 3) in [-1, 1]
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        taps = AlexNetFeatures(name="net")(x)
        pieces = []
        for i, f in enumerate(taps):
            w = self.param(f"lin{i}", nn.initializers.ones, (_STAGE_CHANNELS[i],), jnp.float32)
            norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True)) + 1e-10
            fhat = f / norm
            scaled = jnp.sqrt(jnp.maximum(w, 0.0)) * fhat
            B, H, W, C = scaled.shape
            pieces.append(scaled.reshape(B, H * W * C) / np.sqrt(H * W))
        return jnp.concatenate(pieces, axis=-1)


class LpipsEmbedder:
    """Callable (B, C, H, W) [-1,1] numpy -> (B, E) numpy embedding."""

    def __init__(self, weights_path: Optional[str] = None, image_size: int = 64):
        self.module = LpipsEmbedderModule()
        self.pretrained = False
        weights_path = weights_path or os.environ.get("LFVDM_LPIPS_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.params = self._load_npz(weights_path)
            self.pretrained = True
        else:
            if weights_path:
                print(f"LPIPS weights not found at {weights_path}; using random backbone.")
            else:
                print("LPIPS weights unavailable; using deterministic random backbone "
                      "(set LFVDM_LPIPS_WEIGHTS for pretrained behavior).")
            dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            self.params = self.module.init(jax.random.PRNGKey(0), dummy)
        self._apply = jax.jit(partial(self.module.apply, self.params))

    @staticmethod
    def _load_npz(path: str):
        data = dict(np.load(path))
        params: dict = {"net": {}}
        for i in range(1, 6):
            params["net"][f"conv{i}"] = {
                "kernel": data[f"conv{i}.kernel"],
                "bias": data[f"conv{i}.bias"],
            }
        for i in range(5):
            params[f"lin{i}"] = data[f"lin{i}"]
        return {"params": params}

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(frames, np.float32)).transpose(0, 2, 3, 1)  # -> NHWC
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        elif x.shape[-1] != 3:
            # latent-space videos: embed the first 3 channels
            x = x[..., :3]
        return np.asarray(self._apply(x))


_default: Optional[LpipsEmbedder] = None


def default_lpips_embedder() -> LpipsEmbedder:
    global _default
    if _default is None:
        _default = LpipsEmbedder()
    return _default
