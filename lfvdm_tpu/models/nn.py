"""NN primitives for the TPU video U-Net.

Capability parity: /root/reference/improved_diffusion/nn.py (SiLU,
GroupNorm32, zero_module, timestep_embedding). TPU-first choices:

  * Activations are NHWC (channels-last) — XLA's native conv layout.
  * GroupNorm statistics are always computed in float32 and cast back
    (matches GroupNorm32 nn.py:17-19), which is required for bf16 stability.
  * "zero modules" (reference nn.py:68-74) are zero-initialized Dense/Conv
    layers rather than post-hoc parameter zeroing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, [cos | sin] ordering (nn.py:105-123).

    ``timesteps``: (N,) possibly-fractional values. Returns (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics, channels-last.

    Input (N, ..., C): statistics are computed per (sample, group) over all
    middle axes and the group's channels — identical to torch GroupNorm on
    (N, C, *spatial). The attention pre-norm feeds (N, tokens, C), so tokens
    participate in the statistics, matching the reference exactly
    (rpe.py:133-137).
    """

    groups: int = 32
    eps: float = 1e-5
    # Output dtype; None = input dtype. The normalize pass computes in f32
    # regardless, so emitting f32 costs only write bandwidth, not a copy —
    # used by the output head, which must stay f32 (see unet.py).
    out_dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, precomputed_sums=None,
                 coeffs_only: bool = False) -> jnp.ndarray:
        """``coeffs_only=True`` (requires ``precomputed_sums``): return the
        per-(sample, channel) affine pair (mul, add), both (N, C) f32, with
        y = x·mul + add, WITHOUT touching ``x``'s values — so a consumer can
        apply the normalization to unconcatenated parts of x (the up path's
        no-concat fast path) while this module still owns the scale/bias
        params. ``x`` may then be a never-materialized concat; only its
        shape/dtype are read here."""
        C = x.shape[-1]
        G = self.groups if C % self.groups == 0 else math.gcd(self.groups, C)
        N = x.shape[0]
        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        # TPU-friendly statistics: reduce the big tensor over the middle axes
        # FIRST (C stays on the lanes; the f32 convert fuses into the reduce),
        # then aggregate groups on the tiny (N, C) result. Reshaping the full
        # activation to (N, -1, G, C/G) — the torch-style formulation — forces
        # XLA into multi-ms relayout copies at 128² resolution.
        red_axes = tuple(range(1, x.ndim - 1))
        n_red = C // G
        for a in red_axes:
            n_red *= x.shape[a]
        bshape = (N,) + (1,) * len(red_axes) + (C,)

        # One-pass variance E[(x−a)²] − E[x−a]² anchored at a cheap per-group
        # mean estimate from the first slice along the first middle axis, so
        # large-|mean| f32 activations don't cancel catastrophically the way
        # raw E[x²]−E[x]² does (relative variance error ≈ (mean/std)²·2⁻²³).
        # For bf16 inputs the anchor is skipped: bf16 quantization noise
        # inflates the variance ~100x sooner ((mean/std)²·2⁻¹⁶) than f32
        # accumulation cancels, so anchoring buys nothing and the extra
        # slice-reduce + fused subtract cost ~7% of the forward pass.
        # NB: each reduce gets its own cast/subtract EXPRESSION — a shared
        # intermediate makes XLA materialize the f32 tensor (a multi-ms HBM
        # round trip at 128²) instead of fusing the convert into each reduce.
        if precomputed_sums is not None:
            # Stats handed in as per-channel (Σx, Σx²) f32 pairs of shape
            # (N, C), computed by ``channel_sums`` AT EACH PRODUCER. Used for
            # the U-Net up path's in_norm over a skip-concat: a reduce over
            # the concat cannot fuse anywhere (its two inputs come from far-
            # apart producers → a standalone multi-hundred-MB read pass,
            # 0.5-0.8 ms each at 128² on v5e), while per-part reduces fuse
            # into each part's producing conv as sibling outputs — XLA emits
            # that pattern for every other GroupNorm in the net. Variance is
            # unanchored E[x²]−E[x]² here (see anchor note above: exact for
            # the bf16 production path's regime; for f32 the relative error
            # is (mean/std)²·2⁻²³ — negligible until |mean| ≳ 300σ).
            a_g = jnp.zeros((N, G), jnp.float32)
            s1, s2 = precomputed_sums
        elif x.dtype.itemsize >= 4:
            a_slice = x[:, :1].astype(jnp.float32)
            a_c = jnp.mean(a_slice, axis=red_axes)  # (N, C)
            a_g = a_c.reshape(N, G, C // G).mean(-1)  # (N, G)
            a_bcast = a_g.repeat(C // G, axis=-1).reshape(bshape)
            s1 = jnp.sum(x.astype(jnp.float32) - a_bcast, axis=red_axes)
            s2 = jnp.sum(jnp.square(x.astype(jnp.float32) - a_bcast), axis=red_axes)
        else:
            a_g = jnp.zeros((N, G), jnp.float32)
            s1 = jnp.sum(x.astype(jnp.float32), axis=red_axes)  # (N, C)
            s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=red_axes)
        g_m = s1.reshape(N, G, C // G).sum(-1) / n_red  # E[x] − a, (N, G)
        g_s2 = s2.reshape(N, G, C // G).sum(-1) / n_red
        g_var = jnp.maximum(g_s2 - jnp.square(g_m), 0.0)
        # Named so the U-Net's remat policy can SAVE the (N, G) f32 stats
        # across the remat boundary instead of re-reducing the full
        # activation in the recompute pass (unet.py GN_STATS_REMAT_POLICY;
        # measured ~neutral at 256px — see the policy's comment).
        g_mean = checkpoint_name(g_m + a_g, "gn_stats")
        g_rstd = checkpoint_name(jax.lax.rsqrt(g_var + self.eps), "gn_stats")

        # Per-channel affine folded into the group stats: y = x·a + b with
        # a = rstd·scale, b = bias − mean·rstd·scale — ONE fused pass over x.
        c_mean = jnp.repeat(g_mean, C // G, axis=-1)  # (N, C)
        c_rstd = jnp.repeat(g_rstd, C // G, axis=-1)
        mul = c_rstd * scale[None]
        add = bias[None] - c_mean * mul
        if coeffs_only:
            assert precomputed_sums is not None, (
                "coeffs_only needs precomputed_sums — otherwise the stats "
                "pass itself would read x"
            )
            return mul, add
        y = x.astype(jnp.float32) * mul.reshape(bshape) + add.reshape(bshape)
        return y.astype(self.out_dtype or orig_dtype)


def channel_sums(x: jnp.ndarray):
    """Per-channel f32 (Σx, Σx²) over all non-channel axes except batch.

    Returns two (N, C) arrays — the precomputed-stats input of
    ``GroupNorm32``. Each reduce keeps its own cast/square EXPRESSION so XLA
    fuses the convert into the reduce and (crucially) can fuse the whole
    reduce into ``x``'s producer as a sibling output instead of re-reading
    ``x`` from HBM.
    """
    red_axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(x.astype(jnp.float32), axis=red_axes)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=red_axes)
    return s1, s2


def zero_init_dense(features: int, dtype=jnp.float32, name=None) -> nn.Dense:
    """Dense layer with zero-initialized kernel and bias (a "zero module")."""
    return nn.Dense(
        features,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def zero_init_conv(features: int, kernel_size=(3, 3), dtype=jnp.float32, name=None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size,
        padding="SAME",
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def torch_style_conv_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=√5) fan-in init, torch's Conv/Linear default.

    Kept so trained-parameter statistics match the reference's
    initialization regime (matters for training-dynamics parity).
    ``shape`` is flax's (kh, kw, in, out) for conv or (in, out) for dense.

    torch's reset_parameters: gain = sqrt(2/(1+a²)) = sqrt(1/3) with
    a = √5; std = gain/√fan_in; bound = √3·std — which collapses to
    exactly 1/√fan_in.
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_style_bias_init_for(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_default_conv(features: int, kernel_size, in_features: int, *,
                       strides=None, padding="SAME", dtype=jnp.float32,
                       name=None) -> nn.Conv:
    """Conv with torch's default init (the reference's conv_nd regime), so
    trained-parameter statistics match the reference's initialization.
    ``in_features`` is the input channel count (bias fan-in needs it)."""
    fan_in = in_features
    for k in kernel_size:
        fan_in *= k
    return nn.Conv(
        features, kernel_size, strides=strides, padding=padding,
        kernel_init=torch_style_conv_init,
        bias_init=torch_style_bias_init_for(fan_in),
        dtype=dtype, name=name,
    )


def torch_default_dense(features: int, in_features: int, *, dtype=jnp.float32,
                        name=None) -> nn.Dense:
    """Dense with torch's nn.Linear default init."""
    return nn.Dense(
        features,
        kernel_init=torch_style_conv_init,
        bias_init=torch_style_bias_init_for(in_features),
        dtype=dtype, name=name,
    )
