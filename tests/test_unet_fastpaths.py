"""Exactness tests for the TPU fast paths in models/unet.py and models/nn.py.

Each rewrite (transposed-conv upsample, producer-fused GroupNorm statistics,
NCHW-output head conv) must compute the SAME function as the plain form it
replaces — these tests pin that equivalence on CPU at small shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from lfvdm_tpu.models.nn import GroupNorm32, channel_sums, torch_default_conv
from lfvdm_tpu.models.unet import ResBlock, Upsample, _NCHWOutConv


class _NaiveUp(nn.Module):
    """Reference form: materialized nearest-2x broadcast + SAME 3x3 conv."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return torch_default_conv(C, (3, 3), C, name="conv")(x)


@pytest.mark.parametrize("hw", [5, 8, 32])
def test_upsample_dilated_matches_naive(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, hw, hw, 16)), jnp.float32)
    up = Upsample(use_conv=True)
    params = up.init(jax.random.PRNGKey(1), x)
    got = up.apply(params, x)
    want = _NaiveUp().apply(params, x)
    assert got.shape == (3, 2 * hw, 2 * hw, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_upsample_large_level_uses_same_params():
    # the dilated form applies at every level (incl. >32² inputs) with the
    # same (3,3,C,F) parameter tree as the nn.Conv it replaces.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 40, 40, 8)), jnp.float32)
    up = Upsample(use_conv=True)
    params = up.init(jax.random.PRNGKey(2), x)
    got = up.apply(params, x)
    want = _NaiveUp().apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_groupnorm_precomputed_sums(dtype):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 9, 9, 64)) * 3 + 1.5, dtype)
    gn = GroupNorm32()
    p = gn.init(jax.random.PRNGKey(3), x)
    internal = np.asarray(gn.apply(p, x), np.float32)
    pre = np.asarray(gn.apply(p, x, precomputed_sums=channel_sums(x)), np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(pre, internal, rtol=tol, atol=tol)


def test_resblock_in_stats_matches_plain():
    rng = np.random.default_rng(3)
    xcat = jnp.asarray(rng.standard_normal((4, 9, 9, 96)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((4, 48)), jnp.float32)
    rb = ResBlock(out_channels=32)
    pr = rb.init(jax.random.PRNGKey(4), xcat, emb)
    o1 = rb.apply(pr, xcat, emb)
    s1a, s2a = channel_sums(xcat[..., :64])
    s1b, s2b = channel_sums(xcat[..., 64:])
    stats = (jnp.concatenate([s1a, s1b], -1), jnp.concatenate([s2a, s2b], -1))
    o2 = rb.apply(pr, xcat, emb, stats)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_resblock_parts_path_matches_concat_conv():
    # The opt-in fused skip projection (LFVDM_PALLAS_SKIPCONV, ResBlock
    # ``parts``) must equal the default 1x1-conv-on-concat + residual form.
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
    xcat = jnp.concatenate([a, b], axis=-1)
    rb = ResBlock(out_channels=32, emit_stats=True)
    pr = rb.init(jax.random.PRNGKey(6), xcat, emb)
    out_plain, st_plain = rb.apply(pr, xcat, emb)
    assert st_plain is None
    out_parts, st = rb.apply(pr, xcat, emb, parts=(a, b))
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_parts),
                               rtol=1e-5, atol=1e-5)
    s1_ref, s2_ref = channel_sums(out_plain)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(s1_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(st[1]), np.asarray(s2_ref),
                               rtol=1e-4, atol=1e-3)


def test_resblock_split_parts_matches_concat(monkeypatch):
    """The no-concat up path (split_parts: per-part GN affine + kernel-sliced
    in_conv/skip_conv) must equal the default concat form with the SAME
    params — including when part widths don't align with GN group
    boundaries (c1=48 vs group size (48+80)/32 = 4... exercise c1 not a
    multiple of the group count split)."""
    rng = np.random.default_rng(7)
    for c1, c2 in ((64, 64), (48, 80)):
        a = jnp.asarray(rng.standard_normal((2, 8, 8, c1)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2, 8, 8, c2)), jnp.float32)
        emb = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
        xcat = jnp.concatenate([a, b], axis=-1)
        s1a, s2a = channel_sums(a)
        s1b, s2b = channel_sums(b)
        stats = (jnp.concatenate([s1a, s1b], -1), jnp.concatenate([s2a, s2b], -1))

        rb = ResBlock(out_channels=32, emit_stats=True)
        pr = rb.init(jax.random.PRNGKey(8), xcat, emb)
        out_plain, _ = rb.apply(pr, xcat, emb, stats)

        rb_split = ResBlock(out_channels=32, emit_stats=True, split_parts=True)
        out_split, st = rb_split.apply(pr, xcat, emb, stats, parts=(a, b))
        assert st is None  # caller computes channel_sums at the add fusion
        np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_split),
                                   rtol=2e-5, atol=2e-5)


def test_unet_split_uppath_matches_default(monkeypatch):
    """Full-model parity of LFVDM_SPLIT_UPPATH=1 vs the default path."""
    from lfvdm_tpu.config import create_model_and_diffusion

    cfg = dict(image_size=32, in_channels=3, num_channels=32, num_res_blocks=1,
               attention_resolutions="16,8", diffusion_steps=8,
               noise_schedule="cosine", compute_dtype="float32")
    model, _ = create_model_and_diffusion(cfg)
    B, K = 1, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, 3, 32, 32)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    fi = jnp.asarray(np.arange(K)[None], jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, :1].set(1.0)
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=1 - obs)
    params = model.init(jax.random.PRNGKey(0), x, t, **kw)
    params = jax.tree.map(  # randomize the zero-init head: non-vacuous compare
        lambda p: p + 0.01 * np.random.default_rng(1)
        .standard_normal(p.shape).astype(p.dtype), params)

    monkeypatch.setenv("LFVDM_SPLIT_UPPATH", "0")
    out0 = np.asarray(model.apply(params, x, t, **kw)[0])
    monkeypatch.setenv("LFVDM_SPLIT_UPPATH", "1")
    out1 = np.asarray(model.apply(params, x, t, **kw)[0])
    np.testing.assert_allclose(out0, out1, rtol=2e-5, atol=2e-5)


def test_unet_attn_natural_layout_matches_default(monkeypatch):
    """Full-model parity of LFVDM_ATTN_NATURAL=1 (attention einsums on the
    producer (B,D,T,H,F) layout, no explicit moveaxis) vs the default."""
    from lfvdm_tpu.config import create_model_and_diffusion

    cfg = dict(image_size=32, in_channels=3, num_channels=32, num_res_blocks=1,
               attention_resolutions="16,8", diffusion_steps=8,
               noise_schedule="cosine", compute_dtype="float32")
    model, _ = create_model_and_diffusion(cfg)
    B, K = 1, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, 3, 32, 32)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    fi = jnp.asarray(np.arange(K)[None], jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, :1].set(1.0)
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=1 - obs)
    params = model.init(jax.random.PRNGKey(0), x, t, **kw)
    params = jax.tree.map(  # randomize the zero-init head: non-vacuous compare
        lambda p: p + 0.01 * np.random.default_rng(1)
        .standard_normal(p.shape).astype(p.dtype), params)

    monkeypatch.setenv("LFVDM_ATTN_NATURAL", "0")
    out0 = np.asarray(model.apply(params, x, t, **kw)[0])
    monkeypatch.setenv("LFVDM_ATTN_NATURAL", "1")
    out1 = np.asarray(model.apply(params, x, t, **kw)[0])
    np.testing.assert_allclose(out0, out1, rtol=2e-5, atol=2e-5)


def test_nchw_out_conv_matches_nn_conv():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 7, 7, 16)), jnp.float32)
    mod = _NCHWOutConv(features=3)
    params = mod.init(jax.random.PRNGKey(5), x)
    # zero-init → randomize to make the comparison non-vacuous
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype), params)
    got = mod.apply(params, x)  # (N, 3, H, W)
    ref_conv = nn.Conv(3, (3, 3), padding="SAME")
    want = ref_conv.apply({"params": params["params"]}, x)  # (N, H, W, 3)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want.transpose(0, 3, 1, 2)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_remat_gn_stats_policy_grad_parity():
    """use_remat's save-gn-stats policy must not change gradients.

    The policy (unet.GN_STATS_REMAT_POLICY) saves the (N, G) GroupNorm
    statistics across the remat boundary instead of re-reducing the full
    activation in backward (measured 16% of the 256px train step). Same
    function, different schedule: gradients must match the no-remat build
    to within remat-compilation rounding noise.
    """
    from lfvdm_tpu.config import create_model_and_diffusion

    cfg = dict(image_size=32, in_channels=3, num_channels=32,
               num_res_blocks=1, attention_resolutions="16,8",
               diffusion_steps=32)
    rng = np.random.default_rng(0)
    B, K, H = 2, 5, 32
    x = jnp.asarray(rng.standard_normal((B, K, 3, H, H)), jnp.float32)
    t = jnp.asarray([3, 17], jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, :2].set(1.0)
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)

    def grads(remat):
        model, _ = create_model_and_diffusion(
            {**cfg, "use_checkpoint": remat})
        params = model.init(jax.random.PRNGKey(0), x, t, **kw)
        # zero-init output head → perturb params so grads are non-vacuous
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                      for l, k in zip(leaves, keys)])

        def loss(p):
            return jnp.mean(jnp.square(model.apply(p, x, t, **kw)[0] - 0.3))

        return jax.jit(jax.grad(loss))(params)

    g0, g1 = grads(False), grads(True)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    total = sum(float(np.abs(a).sum()) for a in flat0)
    assert total > 1.0  # non-vacuous
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["nothing", "dots", "everything"])
def test_remat_policy_ladder_grad_parity(policy, monkeypatch):
    """Every LFVDM_REMAT_POLICY ladder arm computes the same gradients.

    The ladder (unet.remat_policy) exists so benchmarks/ab_train_envflag.py
    can A/B schedule variants; each arm is the same function with a
    different rematerialization schedule, so gradients must agree with the
    default gn_stats arm to rounding noise.
    """
    from lfvdm_tpu.config import create_model_and_diffusion

    cfg = dict(image_size=32, in_channels=3, num_channels=32,
               num_res_blocks=1, attention_resolutions="16,8",
               diffusion_steps=32, use_checkpoint=True)
    rng = np.random.default_rng(0)
    B, K, H = 2, 5, 32
    x = jnp.asarray(rng.standard_normal((B, K, 3, H, H)), jnp.float32)
    t = jnp.asarray([3, 17], jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, :2].set(1.0)
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    model, _ = create_model_and_diffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), x, t, **kw)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

    def loss(p):
        return jnp.mean(jnp.square(model.apply(p, x, t, **kw)[0] - 0.3))

    def grads(arm):
        monkeypatch.setenv("LFVDM_REMAT_POLICY", arm)
        return jax.jit(jax.grad(loss))(params)  # env read at trace time

    base = jax.tree_util.tree_leaves(grads("gn_stats"))
    arm = jax.tree_util.tree_leaves(grads(policy))
    assert sum(float(np.abs(a).sum()) for a in base) > 1.0  # non-vacuous
    for a, b in zip(base, arm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
