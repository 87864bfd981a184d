"""I3D (Inflated Inception-v1, Kinetics-400) in Flax for FVD features.

Capability parity: the TF-Hub ``deepmind/i3d-kinetics-400/1`` graph the
reference drives through TF1 sessions
(/root/reference/improved_diffusion/frechet_video_distance.py:41-111). The
400-d logits are the FVD feature vector.

Weights: convert the TF-Hub checkpoint offline to .npz (scripts/
convert_i3d.py, needs tensorflow_hub + egress) and pass the path here or via
LFVDM_I3D_WEIGHTS. FVD numbers are only comparable to published scores with
the pretrained weights; without them this module still runs (deterministic
random init) so the full pipeline is exercisable in CI.

Layout: NDHWC (batch, time, height, width, channels); all convs SAME-padded,
BatchNorm uses the TF slim convention (beta only, eps 1e-3, frozen moments).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Unit3D(nn.Module):
    """Conv3D (no bias) + frozen BatchNorm (beta only) + optional relu."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding="SAME", use_bias=not self.use_bn, name="conv_3d")(x)
        if self.use_bn:
            beta = self.param("beta", nn.initializers.zeros, (self.features,))
            mean = self.variable("batch_stats", "moving_mean",
                                 lambda: jnp.zeros((self.features,))).value
            var = self.variable("batch_stats", "moving_variance",
                                lambda: jnp.ones((self.features,))).value
            x = (x - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        if self.activation:
            x = nn.relu(x)
        return x


def max_pool_3d(x, window, strides):
    return nn.max_pool(x, tuple(window), strides=tuple(strides), padding="SAME")


class InceptionBlock(nn.Module):
    """Four-branch Inception-v1 block, inflated to 3D."""

    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3: int

    @nn.compact
    def __call__(self, x):
        br0 = Unit3D(self.b0, name="Branch_0/Conv3d_0a_1x1")(x)
        br1 = Unit3D(self.b1a, name="Branch_1/Conv3d_0a_1x1")(x)
        br1 = Unit3D(self.b1b, (3, 3, 3), name="Branch_1/Conv3d_0b_3x3")(br1)
        br2 = Unit3D(self.b2a, name="Branch_2/Conv3d_0a_1x1")(x)
        br2 = Unit3D(self.b2b, (3, 3, 3), name="Branch_2/Conv3d_0b_3x3")(br2)
        br3 = max_pool_3d(x, (3, 3, 3), (1, 1, 1))
        br3 = Unit3D(self.b3, name="Branch_3/Conv3d_0b_1x1")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


# (b0, b1a, b1b, b2a, b2b, b3) per mixed block — Inception-v1 table.
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class I3D(nn.Module):
    """Full I3D; returns (B, 400) kinetics logits (time-averaged)."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):  # x: (B, T, H, W, 3) in [-1, 1]
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = InceptionBlock(*_MIXED["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionBlock(*_MIXED["Mixed_3c"], name="Mixed_3c")(x)
        x = max_pool_3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionBlock(*_MIXED[name], name=name)(x)
        x = max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = InceptionBlock(*_MIXED["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionBlock(*_MIXED["Mixed_5c"], name="Mixed_5c")(x)
        # Logits head, hub-exact: the TF graph avg-pools with ksize (2,7,7),
        # STRIDE 1, VALID. For 224^2 inputs the spatial extent here is
        # exactly 7, so the spatial part equals a full mean; the temporal
        # part is a window-2 stride-1 moving average (T' -> T'-1), which for
        # T' > 2 weights interior frames more than the endpoints — a plain
        # time-mean would deviate from published FVD features on long clips.
        x = jnp.mean(x, axis=(2, 3), keepdims=True)  # (B, T', 1, 1, C)
        if x.shape[1] > 1:
            x = (x[:, :-1] + x[:, 1:]) / 2  # (B, T'-1, 1, 1, C)
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   name="Logits/Conv3d_0c_1x1")(x)
        x = jnp.squeeze(x, axis=(2, 3))  # (B, T'-1, 400)
        return jnp.mean(x, axis=1)


class I3DFeatureExtractor:
    """Callable: float32 (B, T, 224, 224, 3) in [-1,1] -> (B, 400) numpy.

    ``mesh``: optional single-process device mesh — feature batches shard
    their batch axis across it (weights replicated), so FVD extraction for
    a 100-video eval runs data-parallel on a TPU slice. Non-divisible
    batches fall back to replicated execution.
    """

    def __init__(self, weights_path: Optional[str] = None, mesh=None):
        self.module = I3D()
        self.mesh = mesh
        self.pretrained = False
        weights_path = weights_path or os.environ.get("LFVDM_I3D_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.variables = self._load_npz(weights_path)
            self.pretrained = True
        else:
            if weights_path:
                print(f"I3D weights not found at {weights_path}; random backbone.")
            else:
                print("I3D weights unavailable; FVD values will not match published "
                      "numbers (set LFVDM_I3D_WEIGHTS to a converted checkpoint).")
            dummy = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
            self.variables = self.module.init(jax.random.PRNGKey(0), dummy)
        if mesh is not None:
            from ..parallel.sharding import replicated

            assert jax.process_count() == 1, (
                "mesh-sharded I3D extraction supports single-process meshes "
                "only (put_batch_array would treat each process's identical "
                "batch as distinct local rows on a pod)"
            )
            self.variables = jax.device_put(self.variables, replicated(mesh))
        self._apply = jax.jit(partial(self.module.apply, self.variables))

    @staticmethod
    def _load_npz(path: str):
        """Flat 'collection/slash/path' npz -> nested variables dict.

        Flax scope names here CONTAIN slashes ("Branch_0/Conv3d_0a_1x1",
        "Logits/Conv3d_0c_1x1" are single dict keys), so those path pairs
        must be re-joined rather than nested — splitting on every slash
        produces a tree Flax cannot find parameters in.
        """
        flat = dict(np.load(path))
        variables: dict = {}
        for key, val in flat.items():
            parts = key.split("/")
            merged = []
            i = 0
            while i < len(parts):
                if parts[i].startswith("Branch_") or parts[i] == "Logits":
                    merged.append(parts[i] + "/" + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            node = variables
            for p in merged[:-1]:
                node = node.setdefault(p, {})
            node[merged[-1]] = jnp.asarray(val)
        return variables

    def __call__(self, videos: np.ndarray) -> np.ndarray:
        videos = np.asarray(videos)
        if self.mesh is not None:
            from ..parallel.sharding import put_batch_array, replicated

            if videos.shape[0] % self.mesh.size:
                x = jax.device_put(videos, replicated(self.mesh))
            else:
                x = put_batch_array(self.mesh, videos)
            return np.asarray(self._apply(x))
        return np.asarray(self._apply(jnp.asarray(videos)))
