"""Frame-indexed video U-Net (Flax), TPU-native.

Capability parity: /root/reference/improved_diffusion/unet.py:24-464 —
2-D U-Net applied per-frame with factorized spatio-temporal attention,
obs-indicator input channel, frame-index conditioned relative-position
temporal attention, two-group attention masking.

TPU-first design:
  * NHWC activations end-to-end; (B, T, C, H, W) only at the public API
    boundary (reference-compatible).
  * bf16 compute / f32 params via the ``dtype`` field; GroupNorm and softmax
    always reduce in f32 (matches the fp16-torso + f32-norm reference split,
    unet.py:405-426, nn.py:17-19).
  * Static shapes everywhere: timesteps broadcast (B,)->(B·T) with reshape,
    frame gathers happen outside the model, attention length T = max_frames
    is a compile-time constant.
  * ``use_remat`` wraps ResBlock/attention in ``jax.checkpoint`` (the
    reference's gradient checkpointing, nn.py:126-172).

The vestigial ``get_feature_vectors`` (unet.py:466-493, broken in the
reference) is intentionally not reproduced.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .nn import (GroupNorm32, channel_sums, timestep_embedding,
                 torch_default_conv, torch_default_dense, zero_init_conv,
                 torch_style_bias_init_for, torch_style_conv_init)
from .rpe import RPEAttention
from ..ops import skipconv as _skipconv
from ..ops.skipconv import skip_conv_stats

# Remat policy for ``use_remat``: rematerialize everything EXCEPT the
# GroupNorm group statistics (named "gn_stats" in nn.GroupNorm32) — each a
# (N, groups) f32 pair (kilobytes), so saving them skips the stat re-reduce
# over the full activation in the recompute pass. Measured at the 256px
# train step: ~neutral (132.40 → 132.25 ms/step) — the 20 ms of
# convert+reduce fusions there are dominated by GroupNorm's INHERENT
# backward reductions (Σdy, Σdy·x̂ over the activation), which no amount of
# forward-stat saving can remove; XLA was already folding most of the stat
# recompute into adjacent fusions. Kept because it is free (KBs of saves),
# measurably not worse, and pins the checkpoint_name plumbing under test
# (test_unet_fastpaths.py::test_remat_gn_stats_policy_grad_parity).
GN_STATS_REMAT_POLICY = jax.checkpoint_policies.save_only_these_names(
    "gn_stats")


def remat_policy():
    """Remat-policy ladder for ``use_remat`` (``LFVDM_REMAT_POLICY``, read at
    trace time so benchmarks/ab_train_envflag.py can A/B the arms in one
    process):

      * ``gn_stats`` (default) — save only GroupNorm statistics (see above).
      * ``nothing``  — pure remat, recompute everything in the backward pass.
      * ``dots``     — additionally save every dot_general result (attention
        qk/av and dense layers; TPU convs are conv_general_dilated and are
        NOT covered — XLA decides those).
      * ``everything`` — save all residuals: remat becomes a formal no-op,
        giving the no-remat arm of the ladder without a config change.
    """
    name = os.environ.get("LFVDM_REMAT_POLICY", "gn_stats")
    return {
        "gn_stats": GN_STATS_REMAT_POLICY,
        "nothing": jax.checkpoint_policies.nothing_saveable,
        "dots": jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable, GN_STATS_REMAT_POLICY),
        "everything": jax.checkpoint_policies.everything_saveable,
    }[name]


class _FusedSkipConv(nn.Module):
    """Up-path 1x1 skip projection + residual add + next-block GN stats.

    OPT-IN (``LFVDM_PALLAS_SKIPCONV``, default off): measured in-model on
    v5e this loses to the conv-on-concat emitter — see
    ``ops.skipconv.mode`` for the numbers and why (custom-call layout and
    fusion barriers). Kept wired so the measurement stays reproducible.

    Parameter tree identical to the 1x1 ``nn.Conv`` it replaces (kernel
    (1, 1, C, F) + bias (F,), torch default init), so checkpoints and the
    reference converter are unaffected. Compute goes through
    ``ops.skipconv.skip_conv_stats`` — one Pallas kernel on TPU (flat tiled
    matmul at HBM bandwidth, emitting the output's per-sample channel
    (Σy, Σy²) for the NEXT ResBlock's GroupNorm, since a custom call is a
    fusion barrier XLA can't reduce through), plain XLA elsewhere.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, resid):
        N, H, W, c1 = x1.shape
        c2 = x2.shape[-1]
        F = self.features
        w = self.param("kernel", torch_style_conv_init,
                       (1, 1, self.in_features, F), jnp.float32)
        b = self.param("bias", torch_style_bias_init_for(self.in_features),
                       (F,), jnp.float32)
        M = N * H * W
        y, s1, s2 = skip_conv_stats(
            x1.reshape(M, c1).astype(self.dtype),
            x2.reshape(M, c2).astype(self.dtype),
            w.reshape(self.in_features, F).astype(self.dtype),
            b.astype(self.dtype),
            resid.reshape(M, F).astype(self.dtype),
            N, _skipconv.mode() == "pallas")
        return y.reshape(N, H, W, F), (s1, s2)


def split_uppath_enabled() -> bool:
    """No-concat up path (LFVDM_SPLIT_UPPATH, default ON on TPU).

    conv(concat(a, b), W) = conv(a, W[..., :c1, :]) + conv(b, W[..., c1:, :])
    along the input-channel axis, and the skip-concat GroupNorm's affine is
    per-channel once its stats exist (which the per-part ``channel_sums``
    already provide) — so BOTH consumers of the up-path skip concat (the 3x3
    in_conv and the 1x1 skip projection) can read the two parts directly and
    the multi-hundred-MB concat buffers never materialize. Measured on v5e
    (flagship 128², analyze_hlo.py): forward 23.31 → 21.21 ms device-busy;
    every concatenate > 1 MB gone from the hot op list. Pure XLA — no
    custom-call boundary, works under GSPMD/remat (unlike the Pallas
    skip-conv, which stays opt-in and measured-slower).
    """
    flag = os.environ.get("LFVDM_SPLIT_UPPATH", "")
    if flag in ("0", "off"):
        return False
    if flag in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


class _PartConv(nn.Module):
    """Conv over a two-part channel concat WITHOUT materializing the concat.

    Parameter tree identical to the single nn.Conv it replaces (kernel
    (kh, kw, c1+c2, F) + bias (F,), torch default init), so checkpoints and
    the reference converter are unaffected; the kernel is sliced per part at
    trace time (weights are small — the slice folds into the conv).
    ``extra`` adds a residual in the same fusion (the skip-projection use).
    """

    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b, extra=None):
        kh, kw = self.kernel_size
        w = self.param("kernel", torch_style_conv_init,
                       (kh, kw, self.in_features, self.features), jnp.float32)
        bias = self.param("bias",
                          torch_style_bias_init_for(kh * kw * self.in_features),
                          (self.features,), jnp.float32)
        c1 = a.shape[-1]
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        dn = ("NHWC", "HWIO", "NHWC")
        w = w.astype(self.dtype)
        y = jax.lax.conv_general_dilated(a, w[:, :, :c1], (1, 1), pad,
                                         dimension_numbers=dn)
        y = y + jax.lax.conv_general_dilated(b, w[:, :, c1:], (1, 1), pad,
                                             dimension_numbers=dn)
        y = y + bias.astype(self.dtype)
        if extra is not None:
            y = y + extra
        return y


class ResBlock(nn.Module):
    """Residual block with timestep-embedding conditioning (unet.py:117-207)."""

    out_channels: int
    dropout: float = 0.0
    use_conv: bool = False  # 3x3 skip projection instead of 1x1
    use_scale_shift_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    train: bool = False
    emit_stats: bool = False  # also return the output's (Σy, Σy²) or None
    split_parts: bool = False  # no-concat input path (split_uppath_enabled)

    @nn.compact
    def __call__(self, x, emb, in_stats=None, parts=None):
        """``in_stats``: optional per-channel (Σx, Σx²) f32 pair for the
        in_norm statistics, computed at ``x``'s producers (see
        ``nn.channel_sums``). Used by the up path, where ``x`` is a skip
        concat: per-part sums fuse into each part's producing conv, while an
        internal reduce over the concat cannot fuse anywhere and costs a
        standalone full read of the concat per block.

        ``parts``: the two unconcatenated halves of ``x`` (up path). With a
        1x1 skip projection this routes through ``_FusedSkipConv`` — on TPU
        one Pallas kernel for projection + residual add that also emits the
        output's channel sums (returned when ``emit_stats``)."""
        train = self.train
        in_ch = x.shape[-1]
        split = self.split_parts and parts is not None and in_stats is not None
        if split:
            # No-concat path: the in_norm affine is per-(sample, channel)
            # once the stats exist, so each part is normalized and convolved
            # (with its kernel slice) straight from its producer's buffer —
            # ``x`` (the concat) is never read and DCEs away entirely.
            pa, pb = parts
            c1 = pa.shape[-1]
            N = pa.shape[0]
            mul, addc = GroupNorm32(name="in_norm")(
                x, precomputed_sums=in_stats, coeffs_only=True)

            def normed(part, lo, hi):
                m = mul[:, lo:hi].reshape(N, 1, 1, hi - lo)
                ad = addc[:, lo:hi].reshape(N, 1, 1, hi - lo)
                return nn.silu((part.astype(jnp.float32) * m + ad)
                               .astype(self.dtype))

            h = _PartConv(features=self.out_channels, in_features=in_ch,
                          kernel_size=(3, 3), dtype=self.dtype,
                          name="in_conv")(normed(pa, 0, c1),
                                          normed(pb, c1, in_ch))
        else:
            h = GroupNorm32(name="in_norm")(x, precomputed_sums=in_stats)
            h = nn.silu(h)
            h = torch_default_conv(self.out_channels, (3, 3), in_ch,
                                   dtype=self.dtype, name="in_conv")(h)

        emb_out = torch_default_dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            emb.shape[-1],
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))  # (N, C') ; broadcast over H, W
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = zero_init_conv(self.out_channels, dtype=self.dtype, name="out_conv")(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = zero_init_conv(self.out_channels, dtype=self.dtype, name="out_conv")(h)

        out_stats = None
        if self.out_channels == in_ch:
            # (never a split-path case: an up-path concat is always wider
            # than the block's output channels)
            out = x + h
        elif self.use_conv:
            out = torch_default_conv(self.out_channels, (3, 3), in_ch,
                                     dtype=self.dtype, name="skip_conv")(x) + h
        elif split:
            out = _PartConv(features=self.out_channels, in_features=in_ch,
                            kernel_size=(1, 1), dtype=self.dtype,
                            name="skip_conv")(pa, pb, extra=h)
        elif parts is not None:
            out, out_stats = _FusedSkipConv(
                features=self.out_channels, in_features=in_ch,
                dtype=self.dtype, name="skip_conv")(parts[0], parts[1], h)
        else:
            out = torch_default_conv(self.out_channels, (1, 1), in_ch,
                                     dtype=self.dtype, name="skip_conv")(x) + h
        if self.emit_stats:
            return out, out_stats
        return out


class Downsample(nn.Module):
    """Stride-2 spatial downsample: 3x3 conv or average pool (unet.py:91-114)."""

    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return torch_default_conv(
                x.shape[-1], (3, 3), x.shape[-1], strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


def upsample_m4():
    """The per-axis phase-combination matrix of the transposed-conv upsample:
    nearest_up(x) ⋆ w == zero_stuff(x) ⋆ (M₄ w M₄ᵀ)."""
    return jnp.array([[1.0, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]],
                     jnp.float32)


def naive_upsample_conv(x, w):
    """Reference form: materialized nearest-2x broadcast + SAME 3x3 conv.

    Canonical definition shared by the model tests and the FLOP-fairness
    accounting in bench.py — keep in sync with ``dilated_upsample_conv``.
    """
    u = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return jax.lax.conv_general_dilated(
        u, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dilated_upsample_conv(x, w):
    """The transposed-conv form _UpsampleConv uses: ONE lhs-dilation-2 conv
    with the folded 4x4 kernel M₄ w M₄ᵀ. Exactly equals
    ``naive_upsample_conv(x, w)``."""
    m4 = upsample_m4().astype(jnp.float32)
    k4 = jnp.einsum("rk,cl,klif->rcif", m4, m4,
                    w.astype(jnp.float32)).astype(w.dtype)
    return jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _UpsampleConv(nn.Module):
    """Nearest-2x-upsample + 3x3 conv as ONE transposed conv (every level).

    With u = nearest_up(x) and z = zero-stuffed x, u = z ⋆ ones(2,2), so
    u ⋆ w = z ⋆ K4 with K4 = M₄ w M₄ᵀ (M₄ = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]]
    applied per axis) — one lhs-dilation-2 conv writing the upsampled output
    directly, never materializing the 4x broadcast. Mathematically exact.

    Measured in-model on v5e (analyze_hlo.py): the dilated form wins at
    EVERY level, including the largest — upsample_1 (64→128, C=128)
    1.34 → 0.48 ms, full forward 24.17 → 23.31 ms. (An earlier standalone
    microbench "showed" the big level losing 2.8 ms, but that was the scan
    harness copying its carry — harness artifact, see
    microbench_upsample.py. An explicit phase-decomposed 2x2 conv +
    depth-to-space interleave does lose in-model to layout copies.)

    The parameter is stored as the ordinary (3, 3, C, F) kernel (+ bias),
    identical tree/init to the nn.Conv it replaces, so reference-checkpoint
    conversion and existing checkpoints are unaffected.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        F = self.features
        w = self.param("kernel", torch_style_conv_init, (3, 3, C, F), jnp.float32)
        fan_in = 9 * self.in_features
        b = self.param("bias", torch_style_bias_init_for(fan_in), (F,), jnp.float32)

        y = dilated_upsample_conv(x.astype(self.dtype), w.astype(self.dtype))
        return y + b.astype(self.dtype)


class _NCHWOutConv(nn.Module):
    """Zero-init 3x3 conv (a "zero module") whose output is logically NCHW.

    Parameter tree/shapes identical to the ``nn.Conv`` it replaces
    (kernel (3, 3, C, F) + bias (F,), both zero-init), f32 compute.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w = self.param("kernel", nn.initializers.zeros, (3, 3, C, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
        )
        return y + b[None, :, None, None]


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample + optional 3x3 conv (unet.py:60-88)."""

    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        if self.use_conv:
            return _UpsampleConv(features=C, in_features=C,
                                 dtype=self.dtype, name="conv")(x)
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FactorizedAttentionBlock(nn.Module):
    """Temporal (RPE, masked) then spatial attention (unet.py:210-243).

    ``T`` (frames per sample) and ``return_attn`` are compile-time module
    attributes so the block stays remat-friendly (array-only call args).
    """

    num_heads: int
    use_rpe_net: bool
    T: int = 1
    return_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, frame_indices, attn_mask):
        T = self.T
        return_attn = self.return_attn
        BT, H, W, C = x.shape
        B = BT // T
        if os.environ.get("LFVDM_AB_SKIP_ATTN", "0") == "1":
            # DIAGNOSTIC ONLY (benchmarks/ab_envflag.py): bypass the whole
            # factorized attention stack to measure its true wall-clock
            # share inside the sampler scan. Never a valid model.
            return x, None
        # Temporal: tokens = frames, batched over spatial sites.
        xt = x.reshape(B, T, H * W, C).transpose(0, 2, 1, 3)  # (B, HW, T, C)
        xt, attn_t = RPEAttention(
            channels=C, num_heads=self.num_heads, use_rpe_net=self.use_rpe_net,
            dtype=self.dtype, name="temporal_attention",
        )(xt, temb=temb, frame_indices=frame_indices, attn_mask=attn_mask, return_attn=return_attn)

        # Spatial: tokens = pixels, batched over frames. No RPE, no mask.
        xs = xt.transpose(0, 2, 1, 3)  # (B, T, HW, C)
        xs, attn_s = RPEAttention(
            channels=C, num_heads=self.num_heads,
            use_rpe_q=False, use_rpe_k=False, use_rpe_v=False,
            dtype=self.dtype, name="spatial_attention",
        )(xs, return_attn=return_attn)
        out = xs.reshape(B * T, H, W, C)

        attns = None
        if return_attn:
            # Per-layer (B, T, T) / (B, HW, HW): |mean over heads and sites|
            # — matches the reference's logging reduction (rpe.py:126-131,
            # gaussian_diffusion.py:448-469).
            attns = {
                "temporal": jnp.abs(attn_t.mean(axis=(1, 2))),
                "spatial": jnp.abs(attn_s.mean(axis=(1, 2))),
            }
        return out, attns


class UNetVideoModel(nn.Module):
    """The full video U-Net.

    Public call signature (reference-compatible, unet.py:428-464):
      x:             (B, T, C, H, W) noisy frames
      timesteps:     (B,) or (B, T) diffusion steps (may be fractional)
      x0:            (B, T, C, H, W) clean frames (observed content)
      frame_indices: (B, T) int — absolute frame positions in the video
      obs_mask:      (B, T, 1, 1, 1) — 1 where the frame is observed
      latent_mask:   (B, T, 1, 1, 1) — 1 where the frame is being generated
    Returns (out, attns): out (B, T, out_C, H, W); attns is None unless
    ``return_attn_weights``.
    """

    in_channels: int  # data channels, WITHOUT the obs-indicator channel
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]  # downsample factors, e.g. (4, 8)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_rpe_net: bool = True
    dtype: jnp.dtype = jnp.float32
    use_remat: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        timesteps,
        *,
        x0,
        frame_indices,
        obs_mask,
        latent_mask,
        train: bool = False,
        return_attn_weights: bool = False,
        features=None,
        return_features: bool = False,
    ):
        """See class docstring. Two extra (static) inference knobs implement
        encoder reuse (arXiv:2312.09608 — down+middle features drift slowly
        across adjacent diffusion steps, so the decoder can be refreshed
        alone): ``return_features=True`` additionally returns
        ``(middle_h, skip_tuple)``; passing that tuple back as ``features``
        skips the stem/down/middle computation and runs only the up path +
        head with CURRENT timestep conditioning. ``features=None`` is the
        exact full forward."""
        B, T, C, Hs, Ws = x.shape
        num_heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample

        if timesteps.ndim == 1:
            timesteps = jnp.broadcast_to(timesteps[:, None], (B, T))
        attn_mask = jnp.clip(obs_mask + latent_mask, 0, 1).reshape(B, T)

        # Observed frames bypass noising; an indicator channel marks them.
        obs = obs_mask.astype(x.dtype)
        indicator = jnp.ones_like(x[:, :, :1]) * obs
        if os.environ.get("LFVDM_BREAK_OBS_INDICATOR", "0") == "1":
            # DIAGNOSTIC ONLY — zeroes the indicator so the network cannot
            # tell observed frames from latents (the mask-semantics bug
            # class of unet.py:443-448). The quality gate's broken-arm
            # calibration scores a healthy checkpoint under this flag to
            # prove the gate catches conditioning-surface regressions
            # (BASELINE.md round 5). Never use in production.
            print("WARNING: LFVDM_BREAK_OBS_INDICATOR=1 — obs-indicator "
                  "channel ZEROED (diagnostic broken-arm)")
            indicator = jnp.zeros_like(indicator)
        x_in = jnp.concatenate([x * (1 - obs) + x0 * obs, indicator], axis=2)

        # -> NHWC, compute dtype.
        h = x_in.transpose(0, 1, 3, 4, 2).reshape(B * T, Hs, Ws, C + 1).astype(self.dtype)

        # Timestep embedding MLP (per frame).
        ted = self.model_channels * 4
        emb = timestep_embedding(timesteps.reshape(B * T), self.model_channels)
        emb = torch_default_dense(ted, self.model_channels, dtype=self.dtype,
                                  name="time_embed_1")(emb.astype(self.dtype))
        emb = torch_default_dense(ted, ted, dtype=self.dtype,
                                  name="time_embed_2")(nn.silu(emb))
        temb_bt = emb.reshape(B, T, ted)  # for RPENet

        if self.use_remat:
            policy = remat_policy()
            res_block_cls = nn.remat(ResBlock, policy=policy)
            attn_block_cls = nn.remat(FactorizedAttentionBlock, policy=policy)
        else:
            res_block_cls, attn_block_cls = ResBlock, FactorizedAttentionBlock

        split_skip = split_uppath_enabled()

        def res_block(name, out_channels, emit_stats=False):
            return res_block_cls(
                out_channels=out_channels, dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                dtype=self.dtype, train=train, emit_stats=emit_stats,
                split_parts=split_skip, name=name,
            )

        attns = {"temporal": [], "spatial": []} if return_attn_weights else None

        def apply_attn(h, heads, name):
            h, a = attn_block_cls(
                num_heads=heads, use_rpe_net=self.use_rpe_net, T=T,
                return_attn=return_attn_weights, dtype=self.dtype, name=name,
            )(h, temb_bt, frame_indices, attn_mask)
            if return_attn_weights and a is not None:
                attns["temporal"].append(a["temporal"])
                attns["spatial"].append(a["spatial"])
            return h

        if features is None:
            # --- Down path ---
            ch = self.model_channels
            h = torch_default_conv(ch, (3, 3), h.shape[-1], dtype=self.dtype,
                                   name="stem")(h)
            hs = [h]
            ds = 1
            for level, mult in enumerate(self.channel_mult):
                for i in range(self.num_res_blocks):
                    ch = mult * self.model_channels
                    h = res_block(f"down_{level}_{i}", ch)(h, emb)
                    if ds in self.attention_resolutions:
                        h = apply_attn(h, self.num_heads, f"down_attn_{level}_{i}")
                    hs.append(h)
                if level != len(self.channel_mult) - 1:
                    h = Downsample(use_conv=self.conv_resample, dtype=self.dtype,
                                   name=f"downsample_{level}")(h)
                    hs.append(h)
                    ds *= 2

            # --- Middle ---
            h = res_block("middle_res_1", ch)(h, emb)
            h = apply_attn(h, self.num_heads, "middle_attn")
            h = res_block("middle_res_2", ch)(h, emb)
        else:
            # Encoder reuse: features from a previous step's full forward.
            h, skips = features
            hs = list(skips)
        out_features = (h, tuple(hs)) if return_features else None
        ds = 2 ** (len(self.channel_mult) - 1)

        # --- Up path ---
        # Opt-in fused skip projection (measured slower in-model — see
        # ops.skipconv.mode); trace-time constant, default graph unchanged.
        fused_skip = _skipconv.mode() is not None
        prev_stats = None  # (Σh, Σh²) of the current h, when a producer emitted it
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                ch = self.model_channels * mult
                # in_norm stats from per-part sums: each (N, C) reduce fuses
                # into its part's producer; a reduce over the concat would be
                # a standalone full-concat read (~0.5 ms/block at 128²). The
                # h-part sums come from the previous block's fused skip-conv
                # kernel when it ran (a custom call is a fusion barrier, so
                # recomputing them here would be a standalone read of h).
                h_s1, h_s2 = prev_stats if prev_stats is not None else channel_sums(h)
                k_s1, k_s2 = channel_sums(skip)
                in_stats = (jnp.concatenate([h_s1, k_s1], axis=-1),
                            jnp.concatenate([h_s2, k_s2], axis=-1))
                h, prev_stats = res_block(f"up_{level}_{i}", ch, emit_stats=True)(
                    jnp.concatenate([h, skip], axis=-1), emb, in_stats,
                    parts=(h, skip) if (fused_skip or split_skip) else None)
                if ds in self.attention_resolutions:
                    h = apply_attn(h, num_heads_up, f"up_attn_{level}_{i}")
                    prev_stats = None
                if level and i == self.num_res_blocks:
                    h = Upsample(use_conv=self.conv_resample, dtype=self.dtype,
                                 name=f"upsample_{level}")(h)
                    ds //= 2
                    prev_stats = None
        assert not hs

        # --- Output head (f32 — REQUIRED for sampling correctness) ---
        # At high t the useful signal in the eps prediction is √ᾱ_t·x0
        # (~1e-3 of the output magnitude at t≈T); a bf16 head quantizes it
        # away (~0.4% ulp) and the ancestral chain locks onto wrong content
        # in its first steps even for a memorized video. The reference's
        # fp32 head (unet.py:399-403) is precision-critical, not just an
        # fp16-overflow guard. GroupNorm32 emits f32 straight from its fused
        # normalize pass, so this costs write bandwidth only.
        h = GroupNorm32(name="out_norm", out_dtype=jnp.float32)(h)
        h = nn.silu(h)
        # The head conv emits NCHW directly: the public output is channels-
        # before-spatial, and an NHWC conv output with out_channels≈3 puts a
        # 3-wide dim on the 128 lanes (measured 0.64 ms vs a ~0.25 ms floor
        # for this op at 128²). Params identical to the nn.Conv it replaces.
        h = _NCHWOutConv(features=self.out_channels, name="out_conv")(h)

        out = h.reshape(B, T, self.out_channels, Hs, Ws)
        if return_features:
            return out, attns, out_features
        return out, attns
