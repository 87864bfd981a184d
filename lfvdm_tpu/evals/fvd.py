"""Fréchet Video Distance (FVD) and KID metric math.

Capability parity: /root/reference/improved_diffusion/frechet_video_distance.py
— I3D (Kinetics-400) feature extraction + Fréchet distance with the same
eps-diagonal sqrtm fallback, and the polynomial-kernel KID/MMD variant.

The feature extractor is a Flax I3D (lfvdm_tpu/evals/i3d.py) fed with
bilinear-resized 224x224 frames scaled to [-1, 1], matching the reference's
TF-graph preprocessing (frechet_video_distance.py:41-134). Weights are
loaded from a converted .npz (no network egress in this environment); the
metric math below is backbone-independent and exactly reproduces the
reference formulas.
"""

from __future__ import annotations

import numpy as np


def frechet_distance(feats1: np.ndarray, feats2: np.ndarray, eps: float = 1e-10) -> float:
    """Fréchet distance between Gaussian fits of two feature sets.

    |mu1 - mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)), with the reference's
    eps-diagonal retry when sqrtm is singular
    (frechet_video_distance.py:142-199).
    """
    from scipy import linalg

    feats1 = np.asarray(feats1, np.float64)
    feats2 = np.asarray(feats2, np.float64)
    mu1, mu2 = feats1.mean(axis=0), feats2.mean(axis=0)
    sigma1 = np.cov(feats1, rowvar=False)
    sigma2 = np.cov(feats2, rowvar=False)

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"sqrtm returned complex values: imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def polynomial_kernel(X: np.ndarray, Y: np.ndarray, degree: int = 3,
                      gamma: float | None = None, coef0: float = 1.0) -> np.ndarray:
    if gamma is None:
        gamma = 1.0 / X.shape[1]
    return (gamma * X @ Y.T + coef0) ** degree


def kid(feats1: np.ndarray, feats2: np.ndarray, n_subsets: int = 100,
        max_subset_size: int = 1000, seed: int = 0) -> float:
    """Kernel Inception Distance (unbiased MMD², polynomial kernel).

    Parity with the reference's KID (frechet_video_distance.py:210-301).
    """
    rng = np.random.default_rng(seed)
    n = min(len(feats1), len(feats2), max_subset_size)
    total = 0.0
    for _ in range(n_subsets):
        x = feats1[rng.choice(len(feats1), n, replace=False)]
        y = feats2[rng.choice(len(feats2), n, replace=False)]
        k_xx = polynomial_kernel(x, x)
        k_yy = polynomial_kernel(y, y)
        k_xy = polynomial_kernel(x, y)
        m = n
        mmd = (
            (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
            + (k_yy.sum() - np.trace(k_yy)) / (m * (m - 1))
            - 2 * k_xy.mean()
        )
        total += mmd
    return float(total / n_subsets)


def preprocess_videos(videos: np.ndarray, target_resolution: int = 224) -> np.ndarray:
    """uint8 (B, T, H, W, C) -> float32 (B, T, 224, 224, C) in [-1, 1].

    Bilinear resize + scale, matching the reference's `preprocess`
    (frechet_video_distance.py:112-134).
    """
    import jax
    import jax.numpy as jnp

    videos = np.asarray(videos)
    assert videos.dtype == np.uint8, "FVD preprocessing expects uint8 videos"
    B, T, H, W, C = videos.shape
    x = jnp.asarray(videos, jnp.float32).reshape(B * T, H, W, C)
    x = jax.image.resize(x, (B * T, target_resolution, target_resolution, C), "bilinear")
    x = x.reshape(B, T, target_resolution, target_resolution, C)
    return np.asarray(2.0 * x / 255.0 - 1.0)


class FVD:
    """End-to-end FVD: preprocess -> I3D features -> Fréchet distance."""

    def __init__(self, i3d_weights: str | None = None, batch_size: int = 16,
                 mesh=None):
        from .i3d import I3DFeatureExtractor

        self.extractor = I3DFeatureExtractor(weights_path=i3d_weights, mesh=mesh)
        self.batch_size = batch_size
        self.mesh = mesh
        self._fused = None

    def _fused_features(self, chunk: np.ndarray) -> np.ndarray:
        """One jitted uint8 (B,T,H,W,C) -> (B,400) call: resize + scale + I3D
        all on device. The previous two-step path (preprocess_videos ->
        extractor) fetched the resized float32 tensor to host and re-uploaded
        it — ~2 GB of transfer per 16-video batch on a tunneled runtime,
        which dominated FVD wall clock 10x over (round-5 measurement: 35-45
        min per 200-video scoring vs ~3 min fused). Same ops, same numerics.
        """
        import jax
        import jax.numpy as jnp

        if self._fused is None:
            ext = self.extractor

            def fn(v):
                B, T, H, W, C = v.shape
                x = v.astype(jnp.float32).reshape(B * T, H, W, C)
                x = jax.image.resize(x, (B * T, 224, 224, C), "bilinear")
                x = 2.0 * x.reshape(B, T, 224, 224, C) / 255.0 - 1.0
                return ext.module.apply(ext.variables, x)

            self._fused = jax.jit(fn)
        return np.asarray(self._fused(jnp.asarray(chunk)))

    def extract_features(self, videos: np.ndarray) -> np.ndarray:
        """uint8 (B, T, H, W, C) -> (B, 400) logit features (reference taps
        the 400-d kinetics logits, frechet_video_distance.py:72-111)."""
        feats = []
        for i in range(0, len(videos), self.batch_size):
            if self.mesh is None:
                feats.append(self._fused_features(videos[i:i + self.batch_size]))
            else:
                # mesh path: batch-sharded device_put happens inside the
                # extractor; preprocessing stays host-visible per shard
                chunk = preprocess_videos(videos[i:i + self.batch_size])
                feats.append(self.extractor(chunk))
        return np.concatenate(feats, axis=0)

    def compute(self, videos_fake: np.ndarray, videos_real: np.ndarray) -> float:
        return frechet_distance(
            self.extract_features(videos_fake), self.extract_features(videos_real)
        )
