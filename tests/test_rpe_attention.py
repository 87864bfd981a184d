"""RPE attention: mask semantics, naive-oracle einsums, torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfvdm_tpu.models.rpe import RPEAttention, RPENet, two_group_softmax


def test_two_group_softmax_group_isolation():
    """mask=1 tokens attend only among themselves; same for mask=0."""
    B, D, H, T = 2, 3, 2, 6
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, D, H, T, T)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1, 0, 1, 0, 1, 0]], np.float32))
    attn = np.asarray(two_group_softmax(logits, mask))
    m = np.asarray(mask)
    for b in range(B):
        same_group = (m[b][:, None] == m[b][None, :])
        assert np.all(attn[b][..., ~same_group] == 0)
        np.testing.assert_allclose(attn[b].sum(-1), 1.0, rtol=1e-6)


def test_two_group_softmax_none_mask_is_softmax():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((1, 1, 1, 4, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(two_group_softmax(logits, None)),
        np.asarray(jax.nn.softmax(logits, axis=-1)),
        rtol=1e-6,
    )


def test_padding_frames_cannot_contaminate_real_frames():
    """Attention-level isolation: swapping the contents of two padding
    frames (attn_mask=0) must not change real-frame outputs.

    NOTE: padding frames DO influence real frames through the attention
    pre-norm GroupNorm statistics (computed over all T tokens — the
    reference has the identical property, rpe.py:133-137). Swapping two
    padding frames preserves those statistics exactly, so any leakage seen
    here would come from the masked softmax — which must be zero.
    """
    B, D, T, C, H = 1, 4, 6, 32, 4
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, D, T, C)).astype(np.float32)
    x2 = x.copy()
    x2[:, :, 4], x2[:, :, 5] = x[:, :, 5], x[:, :, 4]  # swap padding frames
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.float32)
    fi = np.arange(T)[None].astype(np.int32)
    temb = rng.standard_normal((B, T, 16)).astype(np.float32)

    attn = RPEAttention(channels=C, num_heads=H, use_rpe_net=True)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb),
                       jnp.asarray(fi), jnp.asarray(mask))
    # Give the zero-init projections signal so contamination would show.
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.default_rng(3).standard_normal(p.shape).astype(p.dtype),
        params,
    )
    out1, _ = attn.apply(params, jnp.asarray(x), jnp.asarray(temb), jnp.asarray(fi), jnp.asarray(mask))
    out2, _ = attn.apply(params, jnp.asarray(x2), jnp.asarray(temb), jnp.asarray(fi), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1)[:, :, :4], np.asarray(out2)[:, :, :4],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(out1)[:, :, 4:], np.asarray(out2)[:, :, 4:])


def test_rpe_qk_einsum_vs_naive_oracle():
    """Vectorized RPE-on-keys einsum vs an explicit 5-deep loop oracle
    (fills the role of the reference's RPE.forward_safe_qk, rpe.py:85-96)."""
    B, D, Hh, T, F = 2, 3, 2, 5, 4
    rng = np.random.default_rng(4)
    q = rng.standard_normal((B, D, Hh, T, F)).astype(np.float32)
    R = rng.standard_normal((B, T, T, Hh, F)).astype(np.float32)

    fast = np.einsum("bdhtf,btshf->bdhts", q, R)
    slow = np.zeros((B, D, Hh, T, T), np.float32)
    for b in range(B):
        for d in range(D):
            for h in range(Hh):
                for i in range(T):
                    for j in range(T):
                        slow[b, d, h, i, j] = q[b, d, h, i] @ R[b, i, j, h]
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_rpe_v_einsum_vs_naive_oracle():
    B, D, Hh, T, F = 1, 2, 2, 5, 4
    rng = np.random.default_rng(5)
    attn = rng.standard_normal((B, D, Hh, T, T)).astype(np.float32)
    R = rng.standard_normal((B, T, T, Hh, F)).astype(np.float32)
    fast = np.einsum("bdhts,btshf->bdhtf", attn, R)
    slow = np.zeros((B, D, Hh, T, F), np.float32)
    for b in range(B):
        for d in range(D):
            for h in range(Hh):
                for i in range(T):
                    for j in range(T):
                        slow[b, d, h, i] += attn[b, d, h, i, j] * R[b, i, j, h]
    np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-5)


def test_rpenet_parity_with_reference(reference):
    import torch
    from improved_diffusion.rpe import RPENet as RefRPENet

    from lfvdm_tpu.utils.torch_convert import _lin

    C, Hh, TED = 32, 4, 16
    B, T = 2, 5
    ref_net = RefRPENet(C, Hh, TED)
    with torch.no_grad():
        for p in ref_net.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    sd = {k: v.numpy() for k, v in ref_net.state_dict().items()}
    params = {"params": {
        "embed_distances": _lin(sd, "embed_distances"),
        "embed_diffusion_time": _lin(sd, "embed_diffusion_time"),
        "out": _lin(sd, "out"),
    }}
    rng = np.random.default_rng(6)
    temb = rng.standard_normal((B, T, TED)).astype(np.float32)
    fi = rng.integers(0, 100, (B, T)).astype(np.int64)
    pd = fi[:, :, None] - fi[:, None, :]

    ref_out = ref_net(torch.tensor(temb.reshape(B * T, TED)), torch.tensor(pd)).detach().numpy()
    our_out = np.asarray(RPENet(C, Hh).apply(params, jnp.asarray(temb), jnp.asarray(pd)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_rpe_attention_parity_with_reference(reference, with_mask):
    import torch
    from improved_diffusion.rpe import RPEAttention as RefRPEAttention

    from lfvdm_tpu.utils.torch_convert import _rpe_attention

    C, Hh, TED = 32, 4, 16
    B, D, T = 2, 3, 5
    ref_attn = RefRPEAttention(C, Hh, time_embed_dim=TED, use_rpe_net=True)
    with torch.no_grad():
        for p in ref_attn.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    sd = {k: v.numpy() for k, v in ref_attn.state_dict().items()}
    params = {"params": _rpe_attention({f"x.{k}": v for k, v in sd.items()}, "x")}

    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, D, T, C)).astype(np.float32)
    temb = rng.standard_normal((B, T, TED)).astype(np.float32)
    fi = rng.integers(0, 50, (B, T)).astype(np.int64)
    mask = (rng.random((B, T)) > 0.4).astype(np.float32) if with_mask else None

    ref_out, _ = ref_attn._forward(
        torch.tensor(x.transpose(0, 1, 3, 2)),  # reference layout (B, D, C, T)
        torch.tensor(temb.reshape(B * T, TED)),
        torch.tensor(fi),
        None if mask is None else torch.tensor(mask),
    )
    ref_out = ref_out.detach().numpy().transpose(0, 1, 3, 2)  # -> (B, D, T, C)

    ours = RPEAttention(channels=C, num_heads=Hh, use_rpe_net=True)
    our_out, _ = ours.apply(
        params, jnp.asarray(x), jnp.asarray(temb), jnp.asarray(fi),
        None if mask is None else jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(our_out), ref_out, rtol=1e-4, atol=1e-4)
