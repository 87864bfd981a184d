"""GaussianDiffusion numerics vs the reference (torch CPU) oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfvdm_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    mean_flat,
)
from lfvdm_tpu.diffusion.losses import discretized_gaussian_log_likelihood, normal_kl
from lfvdm_tpu.diffusion.schedules import get_named_beta_schedule

RTOL = 1e-5
ATOL = 1e-6


def make_ref_diffusion(reference, steps=50, **kw):
    import improved_diffusion.gaussian_diffusion as gd

    defaults = dict(
        betas=get_named_beta_schedule("linear", steps),
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        diffusion_space_kwargs={"diffusion_space": "pixel", "pre_encoded": False},
    )
    defaults.update(kw)
    return gd.GaussianDiffusion(**defaults)


def make_ours(steps=50, schedule="linear", **kw):
    defaults = dict(
        betas=get_named_beta_schedule(schedule, steps),
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=ModelVarType.FIXED_LARGE,
        loss_type=LossType.MSE,
        rescale_timesteps=False,
    )
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


def test_tables_match_reference(reference):
    ref = make_ref_diffusion(reference)
    ours = make_ours()
    for name in [
        "alphas_cumprod", "alphas_cumprod_prev", "alphas_cumprod_next",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(ours.table(name), getattr(ref, name), rtol=1e-12,
                                   err_msg=name)


def test_q_sample_parity(reference):
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    t = np.array([0, 10, 25, 49])
    ref_xt = ref.q_sample(torch.tensor(x0), torch.tensor(t), torch.tensor(noise)).numpy()
    our_xt = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(our_xt, ref_xt, rtol=RTOL, atol=ATOL)


def test_q_posterior_parity(reference):
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    xt = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    t = np.array([1, 5, 20, 49])
    ref_out = ref.q_posterior_mean_variance(torch.tensor(x0), torch.tensor(xt), torch.tensor(t))
    our_out = ours.q_posterior_mean_variance(jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    for r, o in zip(ref_out, our_out):
        np.testing.assert_allclose(np.broadcast_to(np.asarray(o), r.shape), r.numpy(),
                                   rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("var_type", ["FIXED_LARGE", "FIXED_SMALL", "LEARNED_RANGE"])
@pytest.mark.parametrize("mean_type", ["EPSILON", "START_X"])
def test_p_mean_variance_parity(reference, var_type, mean_type):
    """Model inversion parity with a deterministic fake model, image shapes."""
    import improved_diffusion.gaussian_diffusion as gd
    import torch

    ref = make_ref_diffusion(
        reference,
        model_var_type=getattr(gd.ModelVarType, var_type),
        model_mean_type=getattr(gd.ModelMeanType, mean_type),
    )
    ours = make_ours(
        model_var_type=getattr(ModelVarType, var_type),
        model_mean_type=getattr(ModelMeanType, mean_type),
    )
    rng = np.random.default_rng(2)
    B, C, H, W = 4, 3, 8, 8
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    out_C = 2 * C if var_type.startswith("LEARNED") else C
    fake_out = (0.1 * rng.standard_normal((B, out_C, H, W))).astype(np.float32)
    t = np.array([0, 7, 30, 49])

    def ref_model(x_, ts, return_attn_weights=False, **kw):
        return torch.tensor(fake_out), None

    ref_res = ref.p_mean_variance(ref_model, torch.tensor(x), torch.tensor(t))
    our_res = ours.p_mean_variance_from_output(
        jnp.asarray(fake_out), jnp.asarray(x), jnp.asarray(t)
    )
    for key in ["mean", "variance", "log_variance", "pred_xstart"]:
        np.testing.assert_allclose(
            np.asarray(our_res[key]),
            np.broadcast_to(ref_res[key].numpy(), our_res[key].shape),
            rtol=RTOL, atol=1e-5, err_msg=f"{key} ({var_type}/{mean_type})",
        )


def test_vb_terms_parity(reference):
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(3)
    B, C, H, W = 4, 3, 8, 8
    x0 = np.clip(rng.standard_normal((B, C, H, W)), -1, 1).astype(np.float32)
    xt = rng.standard_normal((B, C, H, W)).astype(np.float32)
    fake_out = (0.1 * rng.standard_normal((B, C, H, W))).astype(np.float32)
    t = np.array([0, 1, 25, 49])
    mask = (rng.random((B, C, H, W)) > 0.5).astype(np.float32)

    def ref_model(x_, ts, return_attn_weights=False, **kw):
        return torch.tensor(fake_out), None

    ref_res = ref._vb_terms_bpd(
        ref_model, torch.tensor(x0), torch.tensor(xt), torch.tensor(t),
        latent_mask=torch.tensor(mask),
    )
    our_res = ours._vb_terms_bpd_from_output(
        jnp.asarray(fake_out), jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t),
        latent_mask=jnp.asarray(mask),
    )
    # fp32 reduction-order noise dominates at t=0 (decoder NLL has exp/tanh).
    np.testing.assert_allclose(
        np.asarray(our_res["output"]), ref_res["output"].numpy(), rtol=1e-3, atol=1e-5
    )


def test_training_losses_mse_parity(reference):
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(4)
    B, T, C, H, W = 2, 5, 3, 8, 8
    x0 = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    noise = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    t = np.array([3, 40])
    latent_mask = np.zeros((B, T, 1, 1, 1), np.float32)
    latent_mask[:, 2:] = 1.0

    # Fake model: epsilon-prediction as a linear function of input and t.
    w = rng.standard_normal((1,)).astype(np.float32)

    def ref_model(x_, timesteps=None, **kw):
        return x_ * torch.tensor(w) + 0.01 * timesteps.float().view(-1, 1, 1, 1, 1), None

    def our_model(x_, ts, **kw):
        return x_ * jnp.asarray(w) + 0.01 * ts.astype(jnp.float32).reshape(-1, 1, 1, 1, 1)

    ref_terms = ref.training_losses(
        ref_model, torch.tensor(x0), torch.tensor(t),
        noise=torch.tensor(noise), latent_mask=torch.tensor(latent_mask),
        eval_mask=torch.tensor(latent_mask),
    )
    our_terms = ours.training_losses(
        our_model, jnp.asarray(x0), jnp.asarray(t), jax.random.PRNGKey(0),
        noise=jnp.asarray(noise), latent_mask=jnp.asarray(latent_mask),
        eval_mask=jnp.asarray(latent_mask),
    )
    for key in ["mse", "eval-mse", "loss"]:
        np.testing.assert_allclose(
            np.asarray(our_terms[key]), ref_terms[key].numpy(), rtol=1e-4, atol=1e-6,
            err_msg=key,
        )


def test_ddim_step_parity(reference):
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(5)
    B, C, H, W = 4, 3, 8, 8
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    fake_out = (0.1 * rng.standard_normal((B, C, H, W))).astype(np.float32)
    t = np.array([5, 10, 20, 49])  # all nonzero -> eta=0 deterministic

    def ref_model(x_, ts, return_attn_weights=False, **kw):
        return torch.tensor(fake_out), None

    ref_res = ref.ddim_sample(ref_model, torch.tensor(x), torch.tensor(t), eta=0.0)

    def our_model(x_, ts, **kw):
        return jnp.asarray(fake_out)

    our_res = ours.ddim_sample(our_model, jnp.asarray(x), jnp.asarray(t),
                               jax.random.PRNGKey(0), eta=0.0)
    np.testing.assert_allclose(
        np.asarray(our_res["sample"]), ref_res["sample"].numpy(), rtol=1e-4, atol=1e-5
    )


def test_respaced_model_t_mapping():
    ours = GaussianDiffusion.create(
        steps=100, timestep_respacing="ddim10", rescale_timesteps=True
    )
    assert ours.num_timesteps == 10
    t = jnp.arange(10)
    mapped = np.asarray(ours._model_t(t))
    np.testing.assert_allclose(mapped, np.arange(0, 100, 10) * (1000.0 / 100))


def test_mean_flat_mask_semantics():
    x = jnp.ones((2, 3, 4))
    mask = jnp.zeros((2, 3, 1)).at[:, 0].set(1.0)
    # No renormalization: mean includes masked-out zeros.
    np.testing.assert_allclose(np.asarray(mean_flat(x, mask)), [1 / 3, 1 / 3], rtol=1e-6)


def test_losses_match_reference(reference):
    import improved_diffusion.losses as ref_losses
    import torch

    rng = np.random.default_rng(6)
    a, b = rng.standard_normal((2, 16)).astype(np.float32)
    lv1, lv2 = rng.standard_normal((2, 16)).astype(np.float32)
    ref_kl = ref_losses.normal_kl(
        torch.tensor(a), torch.tensor(lv1), torch.tensor(b), torch.tensor(lv2)
    ).numpy()
    np.testing.assert_allclose(np.asarray(normal_kl(a, lv1, b, lv2)), ref_kl,
                               rtol=1e-4, atol=1e-6)

    # Well-conditioned regime (means ≈ x): the far-tail log(cdf_delta) is
    # fp32-ill-conditioned identically in both implementations.
    x = np.clip(rng.standard_normal(16), -1, 1).astype(np.float32)
    means = (x + 0.1 * rng.standard_normal(16)).astype(np.float32)
    log_scales = (-1 + 0.1 * rng.standard_normal(16)).astype(np.float32)
    ref_ll = ref_losses.discretized_gaussian_log_likelihood(
        torch.tensor(x), means=torch.tensor(means), log_scales=torch.tensor(log_scales)
    ).numpy()
    ours_ll = np.asarray(
        discretized_gaussian_log_likelihood(
            jnp.asarray(x), means=jnp.asarray(means), log_scales=jnp.asarray(log_scales)
        )
    )
    np.testing.assert_allclose(ours_ll, ref_ll, rtol=1e-3, atol=1e-5)


def test_p_sample_loop_scan_matches_progressive():
    """The fused lax.scan sampler must equal the step-by-step generator."""
    ours = make_ours(steps=8, schedule="cosine")
    B, T, C, H, W = 1, 2, 3, 4, 4

    def model_fn(x, ts, **kw):
        return 0.05 * x  # deterministic eps model

    rng = jax.random.PRNGKey(42)
    fused = ours.p_sample_loop(model_fn, (B, T, C, H, W), rng)
    gen = None
    for out in ours.p_sample_loop_progressive(model_fn, (B, T, C, H, W), rng):
        gen = out["sample"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(gen), rtol=1e-5, atol=1e-6)


def test_calc_bpd_loop_shapes():
    ours = make_ours(steps=8, schedule="cosine")
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4)), -1, 1)

    def model_fn(x, ts, **kw):
        return 0.05 * x

    out = ours.calc_bpd_loop(model_fn, x0, jax.random.PRNGKey(1))
    assert out["vb"].shape == (2, 8)
    assert out["total_bpd"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(out["total_bpd"])))


def test_ddim_reverse_step_parity(reference):
    """ddim_reverse_sample (the deterministic encoder,
    gaussian_diffusion.py:524-560 reverse ODE step) matches the reference."""
    import torch

    ref, ours = make_ref_diffusion(reference), make_ours()
    rng = np.random.default_rng(6)
    B, C, H, W = 4, 3, 8, 8
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    fake_out = (0.1 * rng.standard_normal((B, C, H, W))).astype(np.float32)
    t = np.array([0, 5, 20, 48])

    def ref_model(x_, ts, return_attn_weights=False, **kw):
        return torch.tensor(fake_out), None

    ref_res = ref.ddim_reverse_sample(ref_model, torch.tensor(x), torch.tensor(t))

    def our_model(x_, ts, **kw):
        return jnp.asarray(fake_out)

    our_res = ours.ddim_reverse_sample(our_model, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(our_res["sample"]), ref_res["sample"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(our_res["pred_xstart"]), ref_res["pred_xstart"].numpy(),
        rtol=1e-4, atol=1e-5
    )
