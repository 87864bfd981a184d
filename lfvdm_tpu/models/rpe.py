"""Relative-position (frame-distance) attention for video diffusion.

Capability parity: /root/reference/improved_diffusion/rpe.py (iRPE-style
relative position on q/k/v, arXiv:2107.14222 Eq. 16; continuous RPENet
conditioned on diffusion time; two-group masked softmax).

TPU-first design notes:
  * Token axis is -2, channels last: x is (B, D, T, C) — einsums contract on
    the minor dims the MXU likes; attention math runs in float32 via
    ``preferred_element_type`` regardless of the bf16 torso.
  * The two-group masked softmax (frames with mask=1 attend only among
    themselves, mask=0 only among themselves — rpe.py:154-163) is fused into
    the same fp32 softmax; padding frames can never contaminate real frames.
  * K = max_frames ≤ 20, so the R tensor (B,T,T,H,F) is tiny; the einsum
    path is already MXU-bound. A fused Pallas kernel lives in
    lfvdm_tpu/ops/attention.py for the large-D spatial path.

Reference bug NOT replicated: the lookup-table branch (use_rpe_net=False)
references an undefined ``self.beta`` (rpe.py:49-52) and crashes; here it is
a working clipped-distance table with window ``rpe_beta``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import (
    pallas_available,
    spatial_attention,
    temporal_rpe_attention,
)
from .nn import GroupNorm32, torch_default_dense, zero_init_dense


class RPENet(nn.Module):
    """Continuous relative-position network.

    Maps (diffusion-time embedding, signed frame distance) to a per-head
    bias table R of shape (B, T, T, heads, C/heads). Distance features are
    [log1p(d⁺), log1p(d⁻), 1(d=0)] (rpe.py:20-31). The output projection is
    zero-initialized so RPE starts as a no-op.
    """

    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb: jnp.ndarray, relative_distances: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = relative_distances.shape
        d = relative_distances.astype(jnp.float32)
        distance_embs = jnp.stack(
            [
                jnp.log1p(jnp.maximum(d, 0.0)),
                jnp.log1p(jnp.maximum(-d, 0.0)),
                (d == 0.0).astype(jnp.float32),
            ],
            axis=-1,
        ).astype(self.dtype)  # (B, T, T, 3)
        emb = (
            torch_default_dense(self.channels, temb.shape[-1], dtype=self.dtype,
                                name="embed_diffusion_time")(temb)[
                :, :, None, :
            ]
            + torch_default_dense(self.channels, 3, dtype=self.dtype,
                                  name="embed_distances")(distance_embs)
        )  # (B, T, T, C)
        out = zero_init_dense(self.channels, dtype=self.dtype, name="out")(nn.silu(emb))
        return out.reshape(B, T, T, self.num_heads, self.channels // self.num_heads)


class RPE(nn.Module):
    """Relative-position bias provider: RPENet or a clipped lookup table."""

    channels: int
    num_heads: int
    use_rpe_net: bool
    rpe_beta: int = 64  # lookup-table window when use_rpe_net=False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pairwise_distances: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self.use_rpe_net:
            return RPENet(self.channels, self.num_heads, dtype=self.dtype, name="rpe_net")(
                temb, pairwise_distances
            )
        table = self.param(
            "lookup_table_weight",
            nn.initializers.zeros,
            (2 * self.rpe_beta + 1, self.num_heads, self.channels // self.num_heads),
            jnp.float32,
        )
        idx = jnp.clip(pairwise_distances, -self.rpe_beta, self.rpe_beta) + self.rpe_beta
        return table[idx].astype(self.dtype)  # (B, T, T, H, F)


def two_group_softmax(logits: jnp.ndarray, attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with two-group connectivity.

    ``logits``: (B, D, H, T, S); ``attn_mask``: (B, T) in {0, 1}. Tokens with
    mask=1 attend only among themselves; tokens with mask=0 (padding frames)
    only among themselves. Always computed in float32 (rpe.py:156-163).
    """
    logits = logits.astype(jnp.float32)
    if os.environ.get("LFVDM_BREAK_TWO_GROUP", "0") == "1":
        # DIAGNOSTIC ONLY — deliberately reintroduces the mask-semantics bug
        # class the two-group softmax exists to prevent (real frames attend
        # to padding frames). Used by the quality gate's broken-arm
        # calibration (BASELINE.md): a model TRAINED under this flag must
        # score measurably worse, proving the gate catches mask-semantics
        # regressions, not just undertraining (VERDICT r4 item 4).
        print("WARNING: LFVDM_BREAK_TWO_GROUP=1 — two-group masked softmax "
              "DISABLED (diagnostic broken-arm; never use in production)")
        attn_mask = None
    if attn_mask is not None:
        m = attn_mask.astype(jnp.float32)
        allowed = m[:, :, None] * m[:, None, :] + (1 - m[:, :, None]) * (1 - m[:, None, :])
        logits = jnp.where(
            (allowed > 0)[:, None, None, :, :], logits, jnp.finfo(jnp.float32).min
        )
    return jax.nn.softmax(logits, axis=-1)


class RPEAttention(nn.Module):
    """Pre-norm multi-head attention with optional RPE on q/k/v.

    Input/output: (B, D, T, C) — attention over axis T, batched over (B, D).
    The residual adds the attention output to the *normalized* input
    (matching the reference's post-norm quirk, rpe.py:171-172).

    Returns (out, attn) where attn is the (B, D, H, T, T) softmax weights
    (for attention-heatmap logging) — pass ``return_attn=False`` to skip.
    """

    channels: int
    num_heads: int
    use_rpe_q: bool = True
    use_rpe_k: bool = True
    use_rpe_v: bool = True
    use_rpe_net: bool = False
    dtype: jnp.dtype = jnp.float32
    # None = auto: fused Pallas kernels (lfvdm_tpu/ops/attention.py) on TPU,
    # einsum path elsewhere / when attention weights are requested.
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        frame_indices: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        return_attn: bool = False,
    ):
        B, D, T, C = x.shape
        H = self.num_heads
        F = C // H
        scale = F**-0.5

        h = GroupNorm32(name="norm")(x.reshape(B * D, T, C)).reshape(B, D, T, C)
        qkv = torch_default_dense(3 * C, C, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, D, T, 3, H, F)
        # Natural layout: (B, D, T, H, F) — the head split is a free view of
        # the channel axis (F stays minor). LFVDM_ATTN_NATURAL=1 keeps the
        # einsums on this layout so XLA decides where (or whether) to
        # transpose, instead of materializing explicit (B, D, H, T, F)
        # copies; measured A/B in BASELINE.md.
        natural = os.environ.get("LFVDM_ATTN_NATURAL", "0") == "1"
        qn, kn, vn = (qkv[:, :, :, i] for i in range(3))  # each (B, D, T, H, F)

        use_any_rpe = self.use_rpe_q or self.use_rpe_k or self.use_rpe_v
        all_rpe = self.use_rpe_q and self.use_rpe_k and self.use_rpe_v
        if use_any_rpe:
            assert frame_indices is not None
            # d[t, s] = frame_indices[t] - frame_indices[s]  (rpe.py:146)
            pd = frame_indices[:, :, None] - frame_indices[:, None, :]

        def make_rpe(name):
            return RPE(
                channels=C, num_heads=H, use_rpe_net=self.use_rpe_net,
                dtype=self.dtype, name=name,
            )

        use_pallas = self.use_pallas
        # Hard safety guards regardless of field/env overrides: the fused
        # kernels cannot return attention weights, and the spatial kernel
        # has no mask support (the reference never masks spatial attention,
        # unet.py:236-241, but an explicit caller might).
        if return_attn or (not use_any_rpe and attn_mask is not None):
            use_pallas = False
        if use_pallas is None:
            # Measured policy (benchmarks/microbench_attention.py +
            # bench_256px.py, v5e): XLA's fused attention wins or ties the
            # Pallas kernels in every full-model config measured — including
            # the spatial kernel's motivating 256px/1024-token shape
            # (einsum 369.9 ms/fwd vs 414.2 spatial-kernel, 0.89x; round-2
            # re-measure with the policy flags correctly toggled) and the
            # temporal kernel's 1.17x standalone win at 1024 sites (eaten
            # by its layout transposes in-model, 0.99x). Default OFF; the
            # kernels stay available via LFVDM_PALLAS_{TEMPORAL,SPATIAL}=1
            # or the use_pallas field for shapes where they pay.
            kind = "TEMPORAL" if use_any_rpe else "SPATIAL"
            flag = os.environ.get(f"LFVDM_PALLAS_{kind}", "0")
            use_pallas = (
                flag == "1"
                and pallas_available()
                and not return_attn
                and (all_rpe or not use_any_rpe)
            )

        if use_pallas or not natural:
            q, k, v = (jnp.moveaxis(a, -2, 2) for a in (qn, kn, vn))  # (B, D, H, T, F)

        if use_pallas and not use_any_rpe:
            # Fused spatial kernel: (B, D, H, T, F) is already the kernel's
            # (batch, batch, heads, tokens, features) layout.
            out = spatial_attention(q * scale, k, v)
            out = jnp.moveaxis(out.astype(self.dtype), 2, -2).reshape(B, D, T, C)
            out = zero_init_dense(C, dtype=self.dtype, name="proj_out")(out)
            return h + out, None

        if use_pallas and all_rpe:
            R_k = make_rpe("rpe_k")(pd, temb)   # (B, T, S, H, F)
            R_q = make_rpe("rpe_q")(pd, temb)
            R_v = make_rpe("rpe_v")(pd, temb)
            qk = (q * scale).transpose(0, 2, 3, 4, 1)  # (B, H, T, F, D)
            kk = k.transpose(0, 2, 3, 4, 1)
            vk = v.transpose(0, 2, 3, 4, 1)
            r_k = R_k.transpose(0, 3, 1, 2, 4)                  # (B, H, T, S, F)
            r_q_t = R_q.transpose(0, 3, 2, 1, 4) * scale        # r_q_t[t,s] = R_q[s,t]·scale
            r_v_t = R_v.transpose(0, 3, 1, 4, 2)                # (B, H, T, F, S)
            if attn_mask is not None:
                m = attn_mask.astype(jnp.float32)
            else:
                m = jnp.ones((B, T), jnp.float32)
            out = temporal_rpe_attention(qk, kk, vk, r_k, r_q_t, r_v_t, m)
            out = out.transpose(0, 4, 1, 2, 3)  # -> (B, D, H, T, F)
            out = jnp.moveaxis(out.astype(self.dtype), 2, -2).reshape(B, D, T, C)
            out = zero_init_dense(C, dtype=self.dtype, name="proj_out")(out)
            return h + out, None

        if natural:
            # Same contractions, operands left in their producer layout
            # (head axis at -2, F minor); the output comes back as
            # (B, D, T, H, F) so the final reshape to (B, D, T, C) is free.
            logits = jnp.einsum(
                "bdthf,bdshf->bdhts", qn * scale, kn, preferred_element_type=jnp.float32
            )
            if self.use_rpe_k:
                R_k = make_rpe("rpe_k")(pd, temb)
                logits = logits + jnp.einsum(
                    "bdthf,btshf->bdhts", qn * scale, R_k, preferred_element_type=jnp.float32
                )
            if self.use_rpe_q:
                R_q = make_rpe("rpe_q")(pd, temb)
                logits = logits + jnp.einsum(
                    "bdshf,bsthf->bdhts", kn * scale, R_q, preferred_element_type=jnp.float32
                )
            attn = two_group_softmax(logits, attn_mask)
            attn_c = attn.astype(self.dtype)
            out = jnp.einsum(
                "bdhts,bdshf->bdthf", attn_c, vn, preferred_element_type=jnp.float32
            )
            if self.use_rpe_v:
                R_v = make_rpe("rpe_v")(pd, temb)
                out = out + jnp.einsum(
                    "bdhts,btshf->bdthf", attn_c, R_v, preferred_element_type=jnp.float32
                )
            out = out.astype(self.dtype).reshape(B, D, T, C)
            out = zero_init_dense(C, dtype=self.dtype, name="proj_out")(out)
            result = h + out
            if return_attn:
                return result, attn
            return result, None

        logits = jnp.einsum(
            "bdhtf,bdhsf->bdhts", q * scale, k, preferred_element_type=jnp.float32
        )

        if self.use_rpe_k:
            R_k = make_rpe("rpe_k")(pd, temb)
            logits = logits + jnp.einsum(
                "bdhtf,btshf->bdhts", q * scale, R_k, preferred_element_type=jnp.float32
            )
        if self.use_rpe_q:
            # Contribution(t, s) = (k_s * scale) · R_q[s, t]  (rpe.py:151-152)
            R_q = make_rpe("rpe_q")(pd, temb)
            logits = logits + jnp.einsum(
                "bdhsf,bsthf->bdhts", k * scale, R_q, preferred_element_type=jnp.float32
            )

        attn = two_group_softmax(logits, attn_mask)
        attn_c = attn.astype(self.dtype)
        out = jnp.einsum("bdhts,bdhsf->bdhtf", attn_c, v, preferred_element_type=jnp.float32)
        if self.use_rpe_v:
            R_v = make_rpe("rpe_v")(pd, temb)
            out = out + jnp.einsum(
                "bdhts,btshf->bdhtf", attn_c, R_v, preferred_element_type=jnp.float32
            )

        out = jnp.moveaxis(out.astype(self.dtype), 2, -2).reshape(B, D, T, C)
        out = zero_init_dense(C, dtype=self.dtype, name="proj_out")(out)
        result = h + out  # residual on the normalized input (reference quirk)
        if return_attn:
            return result, attn
        return result, None
