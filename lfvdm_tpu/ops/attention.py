"""Fused Pallas TPU attention kernels for the video U-Net.

Two kernels stand in for the reference's cuDNN/PyTorch attention math
(/root/reference/improved_diffusion/rpe.py:133-174):

* ``spatial_attention`` — plain multi-head attention over the H·W pixel
  tokens of each frame (no RPE, no mask). One grid cell per (batch, frame,
  head); the whole (D, D) softmax lives in VMEM, so the (B, T, H, D, D)
  logits tensor never round-trips through HBM (it is the largest
  intermediate of the einsum path: ~42 MB at 128px).

* ``temporal_rpe_attention`` — attention over the T=max_frames (≤20) frame
  tokens at every spatial site, with iRPE q/k/v biases and the two-group
  masked softmax (rpe.py:148-169). T is far below the 128-lane MXU tile, so
  a batched-matmul formulation wastes >97% of the MXU; instead the kernel
  puts the spatial-site axis D on the VPU lanes and walks the T query frames
  with a fori_loop — every elementwise/reduce op then runs at full 8×128
  VPU occupancy, and the (T, S, D) logits never leave VMEM.

Both ops carry a ``jax.custom_vjp`` whose backward differentiates the
einsum reference implementation (bitwise-equivalent math, verified by the
parity tests in tests/test_pallas_ops.py), so the fused forward composes
with grad/remat/scan.

Layouts (kernel-native, minor-to-major chosen for the TPU tiling rules):
  spatial:  q, k, v        (B, T, H, D, F)   — F on lanes, D on sublanes
  temporal: q, k, v        (B, H, T, F, D)   — D on lanes, F on sublanes
            r_k, r_q_t     (B, H, T, S, F)   — r_q_t[t, s] = R_q[s, t]·scale
            r_v_t          (B, H, T, F, S)   — r_v_t[t] = R_v[t].T
            mask           (B, T)            — per-frame group in {0, 1}; the
                           two-group connectivity is rebuilt in-kernel (a
                           precomputed (T, T) table would need a dynamic
                           lane-dim slice, which the TPU tiling forbids)
``q`` (and ``r_q_t``) arrive pre-scaled by F**-0.5.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only installs
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _PALLAS_IMPORT_OK = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORT_OK = False

NEG_INF = float(jnp.finfo(jnp.float32).min)


def pallas_available() -> bool:
    """True when the fused kernels should run compiled (TPU backend).

    ``LFVDM_PALLAS=0`` disables the kernels; ``LFVDM_PALLAS=interpret``
    forces interpreter mode (CPU-testable).
    """
    flag = os.environ.get("LFVDM_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "interpret":
        return True
    return _PALLAS_IMPORT_OK and jax.default_backend() == "tpu"


def _interpret() -> bool:
    return os.environ.get("LFVDM_PALLAS", "auto") == "interpret" or (
        jax.default_backend() != "tpu"
    )


# ---------------------------------------------------------------------------
# Spatial attention: softmax(q kᵀ) v, one (D, D) tile per (b, t, h)
# ---------------------------------------------------------------------------


def _spatial_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0, 0].astype(jnp.float32)  # (D, F), pre-scaled
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    logits = jax.lax.dot_general(
        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, D)
    attn = jax.nn.softmax(logits, axis=-1)
    # The einsum path casts attn to the compute dtype before attn@v
    # (rpe.py:166); match it so both paths are numerically interchangeable.
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, 0] = out.astype(o_ref.dtype)


def spatial_attention_reference(q, k, v):
    """Einsum oracle (same math as rpe.py:148,154,166 without RPE/mask)."""
    logits = jnp.einsum("bthdf,bthef->bthde", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bthde,bthef->bthdf", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _spatial_pallas(q, k, v):
    B, T, H, D, F = q.shape
    spec = pl.BlockSpec((1, 1, 1, D, F), lambda b, t, h: (b, t, h, 0, 0))
    return pl.pallas_call(
        _spatial_kernel,
        grid=(B, T, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v)


@jax.custom_vjp
def spatial_attention(q, k, v):
    """Fused softmax(q kᵀ) v over tokens D. q: (B, T, H, D, F), pre-scaled."""
    return _spatial_pallas(q, k, v)


def _spatial_fwd(q, k, v):
    return _spatial_pallas(q, k, v), (q, k, v)


def _spatial_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(spatial_attention_reference, q, k, v)
    return vjp(g.astype(q.dtype))


spatial_attention.defvjp(_spatial_fwd, _spatial_bwd)


# ---------------------------------------------------------------------------
# Temporal masked-RPE attention: D on lanes, fori_loop over query frames
# ---------------------------------------------------------------------------


def _temporal_kernel(q_ref, k_ref, v_ref, rk_ref, rqt_ref, rvt_ref,
                     mcol_ref, o_ref):
    # Keep k/v in the storage dtype; elementwise ops promote to f32 against
    # the f32 operands below without materializing f32 copies in VMEM.
    k_all = k_ref[0, 0]  # (S, F, D)
    v_all = v_ref[0, 0]  # (S, F, D)
    T = q_ref.shape[2]
    out_dtype = o_ref.dtype
    # Key-side mask as a column vector (S, 1). The query-side scalar m_t is
    # recovered per step via a one-hot reduction (dynamic lane/sublane slices
    # of a (T, T) table are illegal under the TPU tiling rules).
    m_col = mcol_ref[0][:, 0:1].astype(jnp.float32)  # (S, 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, m_col.shape, 0)  # (S, 1)

    def body(t, _):
        qt = q_ref[0, 0, pl.ds(t, 1)][0].astype(jnp.float32)  # (F, D), pre-scaled
        # q·k logits on the VPU: full-lane over D, reduce over F.
        logits = jnp.sum(k_all * qt[None, :, :], axis=1)  # (S, D)
        # RPE-k: q_t · R_k[t, s]  -> (S, F) @ (F, D) on the MXU.
        rk_t = rk_ref[0, 0, pl.ds(t, 1)][0].astype(jnp.float32)  # (S, F)
        logits += jax.lax.dot_general(
            rk_t, qt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # RPE-q: (k_s·scale) · R_q[s, t], scale pre-folded into r_q_t.
        rqt_t = rqt_ref[0, 0, pl.ds(t, 1)][0].astype(jnp.float32)  # (S, F)
        logits += jnp.sum(k_all * rqt_t[:, :, None], axis=1)

        # Two-group mask (rpe.py:154-163): allowed(t,s) = m_t·m_s+(1-m_t)(1-m_s).
        m_t = jnp.sum(jnp.where(s_iota == t, m_col, 0.0))
        allow_t = m_t * m_col + (1.0 - m_t) * (1.0 - m_col)  # (S, 1)
        logits = jnp.where(allow_t > 0.5, logits, NEG_INF)

        m = jnp.max(logits, axis=0, keepdims=True)
        e = jnp.exp(logits - m)
        attn = e / jnp.sum(e, axis=0, keepdims=True)  # (S, D), f32
        attn_c = attn.astype(out_dtype).astype(jnp.float32)  # match einsum cast

        out_t = jnp.sum(attn_c[:, None, :] * v_all, axis=0)  # (F, D)
        # RPE-v: R_v[t]ᵀ @ attn -> (F, S) @ (S, D) on the MXU.
        rvt_t = rvt_ref[0, 0, pl.ds(t, 1)][0].astype(jnp.float32)  # (F, S)
        out_t += jax.lax.dot_general(
            rvt_t, attn_c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, 0, pl.ds(t, 1)] = out_t[None].astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def temporal_rpe_attention_reference(q, k, v, r_k, r_q_t, r_v_t, mask):
    """Einsum oracle in kernel layout (math of rpe.py:144-169).

    ``mask``: (B, T) per-frame group membership in {0, 1}; tokens attend only
    within their own group (two-group semantics, rpe.py:154-163).
    """
    logits = jnp.einsum("bhtfd,bhsfd->bhtsd", q, k, preferred_element_type=jnp.float32)
    logits += jnp.einsum("bhtsf,bhtfd->bhtsd", r_k, q, preferred_element_type=jnp.float32)
    logits += jnp.einsum("bhtsf,bhsfd->bhtsd", r_q_t, k, preferred_element_type=jnp.float32)
    m = mask.astype(jnp.float32)
    allowed = m[:, :, None] * m[:, None, :] + (1 - m[:, :, None]) * (1 - m[:, None, :])
    logits = jnp.where(allowed[:, None, :, :, None] > 0.5, logits.astype(jnp.float32), NEG_INF)
    attn = jax.nn.softmax(logits, axis=3).astype(q.dtype)
    out = jnp.einsum("bhtsd,bhsfd->bhtfd", attn, v, preferred_element_type=jnp.float32)
    out += jnp.einsum("bhtfs,bhtsd->bhtfd", r_v_t, attn, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _temporal_pallas(q, k, v, r_k, r_q_t, r_v_t, mask, d_block):
    B, H, T, F, D = q.shape
    db = min(d_block, D)
    grid = (B, H, pl.cdiv(D, db))
    m_col = jnp.broadcast_to(mask.astype(jnp.float32)[:, :, None], (B, T, 128))
    qkv_spec = pl.BlockSpec((1, 1, T, F, db), lambda b, h, d: (b, h, 0, 0, d))
    r_spec = pl.BlockSpec((1, 1, T, T, F), lambda b, h, d: (b, h, 0, 0, 0))
    rv_spec = pl.BlockSpec((1, 1, T, F, T), lambda b, h, d: (b, h, 0, 0, 0))
    mcol_spec = pl.BlockSpec((1, T, 128), lambda b, h, d: (b, 0, 0))
    return pl.pallas_call(
        _temporal_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, r_spec, r_spec, rv_spec, mcol_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, r_k, r_q_t, r_v_t, m_col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def temporal_rpe_attention(q, k, v, r_k, r_q_t, r_v_t, mask, d_block=256):
    """Fused two-group-masked RPE attention over frames.

    q/k/v: (B, H, T, F, D) with q pre-scaled; r_k/r_q_t: (B, H, T, S, F)
    (r_q_t transposed + pre-scaled); r_v_t: (B, H, T, F, S); mask: (B, T)
    per-frame group in {0, 1}. Returns (B, H, T, F, D).
    """
    return _temporal_pallas(q, k, v, r_k, r_q_t, r_v_t, mask, d_block)


def _temporal_fwd(q, k, v, r_k, r_q_t, r_v_t, mask, d_block):
    out = _temporal_pallas(q, k, v, r_k, r_q_t, r_v_t, mask, d_block)
    return out, (q, k, v, r_k, r_q_t, r_v_t, mask)


def _temporal_bwd(d_block, res, g):
    q, k, v, r_k, r_q_t, r_v_t, mask = res
    _, vjp = jax.vjp(
        lambda *a: temporal_rpe_attention_reference(*a, mask), q, k, v, r_k, r_q_t, r_v_t
    )
    grads = vjp(g.astype(q.dtype))
    return grads + (jnp.zeros_like(mask),)


temporal_rpe_attention.defvjp(_temporal_fwd, _temporal_bwd)
