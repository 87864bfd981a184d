"""CARLA Town01 world-coordinate metrics: ResNet-152 classifier + regressor.

Capability parity: /root/reference/improved_diffusion/carla_regressor.py —
frame -> world-coordinate regression used for the paper's WD/PO metrics: a
ResNet-152 classifier picks one of 100 grid cells (10x10 histogram over
[-10, 400]^2), and a 100-headed ResNet-152 regressor maps the frame to
(x, y) given the cell. ``predict_coords`` chains them batched.

Flax implementation; torch .pth checkpoints of the reference models convert
via :func:`convert_resnet152_state_dict` (torchvision layout).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageNet normalization used by base_data_transform (carla_regressor.py:112-115).
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

GRID_RANGE = ((-10, 400), (-10, 400))  # Town01 histogram range
GRID_BINS = 10


def get_cell(coord: np.ndarray) -> int:
    """Map an (x, y) world coordinate to its 10x10 grid cell index."""
    count, _, _ = np.histogram2d([coord[0]], [coord[1]], bins=GRID_BINS,
                                 range=[list(GRID_RANGE[0]), list(GRID_RANGE[1])])
    nz = count.flatten().nonzero()[0]
    return int(nz[0]) if len(nz) else 0


def BatchNorm(features, name=None, train: bool = False):
    """torchvision BatchNorm semantics: eval mode uses running stats;
    train mode normalizes by batch stats and updates running stats with
    torch's momentum=0.1 (flax ``momentum`` = 1 - torch momentum).

    Variable layout (params scale/bias, batch_stats mean/var) matches
    :func:`convert_resnet152_state_dict`.
    """
    del features  # inferred from the input by flax
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(self.features, name="bn1", train=train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(y)
        y = BatchNorm(self.features, name="bn2", train=train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(self.features * 4, name="bn3", train=train)(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(self.features * 4, name="downsample_bn",
                                 train=train)(residual)
        return nn.relu(y + residual)


class ResNet152Trunk(nn.Module):
    """torchvision resnet152 up to global average pooling -> (B, 2048)."""

    stage_sizes: Sequence[int] = (3, 8, 36, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, 3), ImageNet-normalized
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = BatchNorm(64, name="bn1", train=train)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2**stage)
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(features, strides=strides,
                               downsample=(block == 0),
                               name=f"layer{stage + 1}_{block}")(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


class ResNet152Classifier(nn.Module):
    num_classes: int = 100

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = ResNet152Trunk(name="trunk")(x, train=train)
        return nn.Dense(self.num_classes, name="fc")(emb)


class MultiHeadResNet152(nn.Module):
    """100 per-cell regression heads over a shared trunk."""

    num_heads: int = 100

    @nn.compact
    def __call__(self, x, cells, train: bool = False):
        emb = ResNet152Trunk(name="trunk")(x, train=train)  # (B, 2048)
        kernels = self.param("head_kernels", nn.initializers.lecun_normal(),
                             (self.num_heads, 2048, 2))
        biases = self.param("head_biases", nn.initializers.zeros, (self.num_heads, 2))
        # jnp.asarray: converted checkpoints hand flax host-numpy params,
        # and numpy arrays cannot be indexed by a traced cell id under jit.
        k = jnp.asarray(kernels)[cells]  # (B, 2048, 2) — one-gather head dispatch
        b = jnp.asarray(biases)[cells]
        return jnp.einsum("bf,bfo->bo", emb, k) + b


def normalize_frames(frames: np.ndarray) -> np.ndarray:
    """uint8/float (B, C, H, W) [0,255]/[0,1] -> ImageNet-normalized NHWC."""
    x = np.asarray(frames, np.float32)
    if x.max() > 2.0:
        x = x / 255.0
    x = x.transpose(0, 2, 3, 1)
    return (x - _MEAN) / _STD


class CoordPredictor:
    """classifier -> cell; multi-head regressor -> (x, y). Batched + jitted."""

    def __init__(self, classifier_vars, regressor_vars, batch_size: int = 64):
        self.classifier = ResNet152Classifier()
        self.regressor = MultiHeadResNet152()
        self.classifier_vars = classifier_vars
        self.regressor_vars = regressor_vars
        self.batch_size = batch_size
        self._cls = jax.jit(partial(self.classifier.apply, classifier_vars))
        self._reg = jax.jit(partial(self.regressor.apply, regressor_vars))

    def predict_coord_batch(self, frames: np.ndarray) -> np.ndarray:
        x = jnp.asarray(normalize_frames(frames))
        cells = jnp.argmax(self._cls(x), axis=1)
        return np.asarray(self._reg(x, cells))

    def predict_coords(self, frames: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(frames), self.batch_size):
            out.append(self.predict_coord_batch(frames[i:i + self.batch_size]))
        return np.concatenate(out, axis=0)


def convert_resnet152_state_dict(sd: dict, multi_head: bool = False) -> dict:
    """torchvision resnet152 (+heads) state_dict -> Flax variables.

    Handles both the classifier (``fc`` -> Dense(100)) and the multi-head
    regressor (``resnet.*`` prefix + ``regressors.{i}``) layouts saved by the
    reference (carla_regressor.py:163-184).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    prefix = "resnet." if multi_head else ""
    params: dict = {"trunk": {}}
    stats: dict = {"trunk": {}}

    def conv(src):
        return {"kernel": sd[f"{src}.weight"].transpose(2, 3, 1, 0)}

    def bn(src):
        return (
            {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]},
            {"mean": sd[f"{src}.running_mean"], "var": sd[f"{src}.running_var"]},
        )

    params["trunk"]["conv1"] = conv(f"{prefix}conv1")
    params["trunk"]["bn1"], stats["trunk"]["bn1"] = bn(f"{prefix}bn1")
    for stage, n_blocks in enumerate((3, 8, 36, 3)):
        for block in range(n_blocks):
            src = f"{prefix}layer{stage + 1}.{block}"
            dst = f"layer{stage + 1}_{block}"
            p, s = {}, {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = conv(f"{src}.conv{i}")
                p[f"bn{i}"], s[f"bn{i}"] = bn(f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample_conv"] = conv(f"{src}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = bn(f"{src}.downsample.1")
            params["trunk"][dst] = p
            stats["trunk"][dst] = s

    if multi_head:
        params["head_kernels"] = np.stack(
            [sd[f"regressors.{i}.weight"].T for i in range(100)]
        )
        params["head_biases"] = np.stack([sd[f"regressors.{i}.bias"] for i in range(100)])
    else:
        params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return {"params": params, "batch_stats": stats}


def load_classifier_regressor_like_paper(classifier_path: str, regressor_path: str,
                                         batch_size: int = 64) -> CoordPredictor:
    """Load the paper's released torch checkpoints (carla_regressor.py:290-297)."""
    import torch

    cls_sd = torch.load(classifier_path, map_location="cpu", weights_only=False)
    reg_sd = torch.load(regressor_path, map_location="cpu", weights_only=False)
    cls_vars = convert_resnet152_state_dict({k: v.numpy() for k, v in cls_sd.items()})
    reg_vars = convert_resnet152_state_dict({k: v.numpy() for k, v in reg_sd.items()},
                                            multi_head=True)
    return CoordPredictor(cls_vars, reg_vars, batch_size=batch_size)
