"""Orthonormal Haar wavelet-packet transform — a live `wavelet` diffusion space.

The reference *intends* a wavelet diffusion space but never ships one:
`diffusion_space="wavelet"` raises NotImplementedError at every touchpoint
(reference gaussian_diffusion.py:908-909,929-930,946-947) and its `dwt.py`
is broken scratch (duplicate definitions, missing numpy import, lossy `//4`
integer math, and an inverse that doesn't invert). This module supplies the
capability the dead code sketches: a multi-level 2-D transform that packs an
(…, C, H, W) frame into (…, C·4^L, H/2^L, W/2^L) subband channels — the same
packed shape as the scratch's 16×-channel 2-level layout — done right:

- **Orthonormal**: one level is the 4×4 symmetric orthogonal matrix with
  entries ±1/2 applied across each 2×2 polyphase block, so the transform is
  an isometry. That matters for diffusion: N(0, I) noise in pixel space is
  exactly N(0, I) in wavelet space, so q_sample/posterior math and the noise
  schedule transfer unchanged.
- **Self-inverse per level**: the matrix is symmetric orthogonal (H = Hᵀ =
  H⁻¹), so encode and decode share one kernel.
- **Packet-form recursion**: every subband (not just LL) is re-transformed at
  each level, keeping the output a plain channel stack with uniform spatial
  size — static shapes, pure reshapes/adds, fuses entirely into neighbours
  under XLA (no gather, no conv).

Channel layout per level: [LL | LH | HL | HH], each a full copy of the
previous level's channel stack.
"""

from __future__ import annotations

import jax.numpy as jnp


def haar_dwt2(x):
    """One orthonormal 2-D Haar level: (..., C, H, W) -> (..., 4C, H/2, W/2)."""
    *lead, C, H, W = x.shape
    assert H % 2 == 0 and W % 2 == 0, f"Haar DWT needs even H, W; got {(H, W)}"
    a = x[..., 0::2, 0::2]
    b = x[..., 0::2, 1::2]
    c = x[..., 1::2, 0::2]
    d = x[..., 1::2, 1::2]
    ll = (a + b + c + d) * 0.5
    lh = (a - b + c - d) * 0.5
    hl = (a + b - c - d) * 0.5
    hh = (a - b - c + d) * 0.5
    return jnp.concatenate([ll, lh, hl, hh], axis=-3)


def haar_idwt2(y):
    """Exact inverse of :func:`haar_dwt2`: (..., 4C, H, W) -> (..., C, 2H, 2W)."""
    *lead, C4, H, W = y.shape
    assert C4 % 4 == 0, f"idwt2 needs 4k channels; got {C4}"
    C = C4 // 4
    ll, lh, hl, hh = (y[..., i * C:(i + 1) * C, :, :] for i in range(4))
    # The level matrix is symmetric orthogonal, so the inverse reuses it.
    a = (ll + lh + hl + hh) * 0.5
    b = (ll - lh + hl - hh) * 0.5
    c = (ll + lh - hl - hh) * 0.5
    d = (ll - lh - hl + hh) * 0.5
    x = jnp.zeros((*lead, C, 2 * H, 2 * W), y.dtype)
    x = x.at[..., 0::2, 0::2].set(a)
    x = x.at[..., 0::2, 1::2].set(b)
    x = x.at[..., 1::2, 0::2].set(c)
    x = x.at[..., 1::2, 1::2].set(d)
    return x


def wavelet_pack(x, levels: int = 1):
    """L packet levels: (..., C, H, W) -> (..., C*4^L, H/2^L, W/2^L)."""
    assert levels >= 1
    for _ in range(levels):
        x = haar_dwt2(x)
    return x


def wavelet_unpack(y, levels: int = 1):
    """Exact inverse of :func:`wavelet_pack`."""
    assert levels >= 1
    for _ in range(levels):
        y = haar_idwt2(y)
    return y
