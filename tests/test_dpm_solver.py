"""DPM-Solver++(2M) fast sampler (lfvdm_tpu/diffusion/dpm_solver.py).

The key correctness evidence is analytic: for Gaussian data x0 ~ N(0, s^2 I)
the Bayes-optimal eps model is linear in x_t,

    eps*(x, t) = sqrt(1 - abar_t) * x / (s^2 * abar_t + 1 - abar_t),

and the 1000-step DDIM trajectory from a fixed terminal noise is a
numerically-exact probability-flow ODE solution to compare against. The
solver must (a) beat DDIM at an equal 10-call budget by a wide margin and
(b) converge at second order (error ratio ~4x from 10 -> 20 calls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfvdm_tpu.diffusion.dpm_solver import (
    dpm_solver_pp_coefficients,
    dpm_solver_pp_sample_loop,
)
from lfvdm_tpu.diffusion.gaussian import GaussianDiffusion

S = 2.0  # Gaussian data scale


def make_diffusion(respacing=""):
    return GaussianDiffusion.create(
        steps=1000, noise_schedule="linear", timestep_respacing=respacing
    )


def optimal_eps_model(full_acp):
    """Bayes-optimal eps predictor for x0 ~ N(0, S^2 I).

    ``ts`` arrive as ORIGINAL schedule indices (the respacing timestep_map
    is applied inside call_model, gaussian.py:192-206)."""
    acp = jnp.asarray(full_acp, jnp.float32)

    def model_fn(x, ts, **kw):
        a = acp[ts.astype(jnp.int32)].reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.sqrt(1.0 - a) * x / (S**2 * a + (1.0 - a))

    return model_fn


def test_coefficient_invariants():
    diff = make_diffusion("25")
    co = dpm_solver_pp_coefficients(diff)
    N = diff.num_timesteps
    assert list(co.ts) == list(range(N - 1, -1, -1))
    # Final step: exact projection to the clean boundary (abar=1 limit).
    assert (co.c_x[-1], co.c_d[-1], co.d0[-1], co.d1[-1]) == (0.0, 1.0, 1.0, 0.0)
    # First step has no history: first-order D = x0.
    assert (co.d0[0], co.d1[0]) == (1.0, 0.0)
    # 2M extrapolation weights are affine (sum to 1) at every step.
    np.testing.assert_allclose(co.d0 + co.d1, 1.0, rtol=1e-6)
    # Interior steps match the closed forms from the (f64) tables.
    acp = diff.table("alphas_cumprod")
    sigma = np.sqrt(1 - acp)
    lam = 0.5 * np.log(acp / (1 - acp))
    for i in range(N - 1):
        s, t = N - 1 - i, N - 2 - i
        h = lam[t] - lam[s]
        np.testing.assert_allclose(co.c_x[i], sigma[t] / sigma[s], rtol=1e-5)
        np.testing.assert_allclose(
            co.c_d[i], np.sqrt(acp[t]) * -np.expm1(-h), rtol=1e-5)


def _solve(diffusion, loop, noise, **kw):
    model = optimal_eps_model(make_diffusion().table("alphas_cumprod"))
    return np.asarray(
        loop(model, noise.shape, jax.random.PRNGKey(0), noise=noise,
             clip_denoised=False, **kw)
    )


def test_beats_ddim_and_second_order_convergence():
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)

    full = make_diffusion()
    truth = _solve(full, full.ddim_sample_loop, noise, eta=0.0)
    assert np.isfinite(truth).all()
    # sanity: the ODE maps N(0,1) to ~N(0, S^2)
    assert 0.7 * S < truth.std() < 1.3 * S

    def rel_err(x):
        return np.linalg.norm(x - truth) / np.linalg.norm(truth)

    # DDIM on its native uniform-t lattice; the solver on its native
    # lambda-uniform "dpmN" lattice — each at an equal model-call budget.
    d10 = make_diffusion("10")
    p10 = make_diffusion("dpm10")
    p20 = make_diffusion("dpm20")
    assert p10.num_timesteps == 10 and p20.num_timesteps == 20
    err_ddim10 = rel_err(_solve(d10, d10.ddim_sample_loop, noise, eta=0.0))
    err_dpm10 = rel_err(
        _solve(p10, lambda *a, **k: dpm_solver_pp_sample_loop(p10, *a, **k), noise))
    err_dpm20 = rel_err(
        _solve(p20, lambda *a, **k: dpm_solver_pp_sample_loop(p20, *a, **k), noise))

    # (a) at the same 10-call budget the 2nd-order solver wins big
    assert err_dpm10 < err_ddim10 / 3, (err_dpm10, err_ddim10)
    assert err_dpm10 < 0.05, err_dpm10
    # (b) second-order convergence: halving h cuts the error ~4x
    assert err_dpm10 / err_dpm20 > 2.0, (err_dpm10, err_dpm20)


def test_lambda_uniform_lattice():
    from lfvdm_tpu.diffusion.schedules import (
        get_named_beta_schedule,
        space_timesteps_lambda_uniform,
    )

    betas = get_named_beta_schedule("linear", 1000)
    idx = space_timesteps_lambda_uniform(betas, 10)
    assert len(idx) == 10
    assert {0, 999} <= idx
    # lambda-gaps are far more even than the uniform-t lattice's: the
    # uniform-t terminal hop spans most of the lambda range.
    acp = np.cumprod(1.0 - betas)
    lam = 0.5 * (np.log(acp) - np.log1p(-acp))
    gaps = np.abs(np.diff(lam[np.array(sorted(idx))]))
    t_gaps = np.abs(np.diff(lam[np.arange(0, 1000, 100)]))
    assert gaps.max() < t_gaps.max() / 2


def test_deterministic_given_noise():
    d10 = make_diffusion("dpm10")
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    a = _solve(d10, lambda *a_, **k: dpm_solver_pp_sample_loop(d10, *a_, **k), noise)
    model = optimal_eps_model(make_diffusion().table("alphas_cumprod"))
    b = np.asarray(dpm_solver_pp_sample_loop(
        d10, model, noise.shape, jax.random.PRNGKey(123), noise=noise,
        clip_denoised=False))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_driver_use_dpm_full_video():
    """VideoSampler(use_dpm=True) samples a full video through a tiny U-Net."""
    from lfvdm_tpu.config import create_model_and_diffusion
    from lfvdm_tpu.sampling.driver import VideoSampler

    cfg = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
               attention_resolutions="8", diffusion_steps=1000,
               noise_schedule="cosine", timestep_respacing="4",
               compute_dtype="float32")
    model, diffusion = create_model_and_diffusion(cfg)
    assert diffusion.num_timesteps == 4
    B, T, C, H, W = 2, 16, 2, 32, 32
    x = np.zeros((B, 4, C, H, W), np.float32)
    fi = np.tile(np.arange(4)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, 4, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32), x0=x,
                        frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape).astype(np.float32),
        params,
    )
    s = VideoSampler(model, diffusion, params, use_dpm=True)
    batch = np.random.default_rng(2).standard_normal((B, T, C, H, W)).astype(np.float32)
    samples, _ = s.sample_video(batch, scheme_name="autoreg", n_obs=4,
                                max_frames=4, step_size=2,
                                rng=jax.random.PRNGKey(3))
    assert samples.shape == batch.shape
    np.testing.assert_array_equal(samples[:, :4], batch[:, :4])
    assert np.isfinite(samples).all()
    assert np.abs(samples[:, 4:]).max() > 0


def test_guards():
    from lfvdm_tpu.sampling.driver import VideoSampler

    with pytest.raises(AssertionError):
        VideoSampler(None, None, None, use_ddim=True, use_dpm=True)
    with pytest.raises(AssertionError):
        VideoSampler(None, None, None, use_dpm=True, encoder_reuse=2)
