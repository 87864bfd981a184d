"""DPM-Solver++(2M): fast deterministic sampling beyond the reference.

The reference's only fast-sampling lever is DDIM + timestep respacing
(/root/reference/improved_diffusion/respace.py, gaussian_diffusion.py:524-685)
— a first-order probability-flow solver, so its quality collapses below
~50-100 steps. DPM-Solver++(2M) (Lu et al., arXiv:2211.01095) is a
second-order multistep solver in the data-prediction parametrization: at 10-25
model calls it matches what DDIM needs hundreds of calls for, directly cutting
the production 1000-step sampler wall-clock by ~40-100x per window.

TPU-native structure: every per-step solver coefficient is precomputed on the
host in float64 from the (possibly respaced) discrete ``alphas_cumprod``
tables and enters the compiled program as f32 constants consumed by ONE
``lax.scan`` — the whole trajectory is a single device launch, exactly like
``p_sample_loop`` / ``ddim_sample_loop`` (docs/DESIGN.md §1). The model-output
inversion reuses ``p_mean_variance_from_output`` (clip_denoised, learned-sigma
channel split, eps/x0/xprev mean types) so every model configuration the
ancestral sampler supports works here unchanged.

Math (data-prediction form; alpha_t = sqrt(abar_t), sigma_t = sqrt(1-abar_t),
lambda_t = log(alpha_t/sigma_t)); going down the lattice s -> t (less noise):

    h   = lambda_t - lambda_s                      (> 0)
    x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) D
    D   = (1 + 1/(2r)) x0(x_s, s) - 1/(2r) x0(x_prev, prev),  r = h_prev / h

First step uses D = x0 (no history). The final step targets the clean
boundary abar = 1 (sigma = 0, lambda = +inf): the update degenerates to
``x = x0(x_{t_0}, t_0)`` — the exact limit of the first-order step, matching
the reference samplers' t=0 convention (``alphas_cumprod_prev[0] == 1``).

Step count selection composes with the existing respacing machinery: build
the diffusion with ``timestep_respacing="20"`` and this loop runs 20 model
calls (the ``timestep_map`` remap inside ``call_model`` handles what the
model sees, gaussian.py:192-206).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPMSolverCoefficients:
    """Per-step scan constants, float64-precomputed. Arrays of length N
    (N = diffusion.num_timesteps = number of model calls).

    Step i calls the model at lattice index ``ts[i]`` and updates the state
    to the next (less noisy) level as ``x <- c_x[i]*x + c_d[i]*D`` with
    ``D = d0[i]*x0_i + d1[i]*x0_{i-1}``.
    """

    ts: np.ndarray   # int32, descending lattice indices (N-1 .. 0)
    c_x: np.ndarray  # f32 multiplier of the current state
    c_d: np.ndarray  # f32 multiplier of D
    d0: np.ndarray   # f32 weight of the current x0 prediction in D
    d1: np.ndarray   # f32 weight of the previous x0 prediction in D


def dpm_solver_pp_coefficients(diffusion) -> DPMSolverCoefficients:
    """Precompute DPM-Solver++(2M) per-step constants for ``diffusion``.

    All math in float64 on the host (same policy as the schedule tables,
    diffusion/schedules.py); the returned arrays are f32 scan constants.
    """
    acp = np.asarray(diffusion.table("alphas_cumprod"), np.float64)
    N = len(acp)
    ts = np.arange(N - 1, -1, -1)

    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha) - np.log(sigma)

    c_x = np.zeros(N)
    c_d = np.zeros(N)
    d0 = np.zeros(N)
    d1 = np.zeros(N)

    h_prev = None
    for i in range(N):
        s = ts[i]
        if i == N - 1:
            # Final step: clean boundary abar=1 (sigma=0, h=inf). Limits:
            # sigma_t/sigma_s -> 0, alpha_t*(-expm1(-h)) -> 1, 1/(2r) -> 0.
            c_x[i], c_d[i], d0[i], d1[i] = 0.0, 1.0, 1.0, 0.0
            continue
        t = ts[i + 1]
        h = lam[t] - lam[s]
        assert h > 0, f"lambda must increase toward t=0 (step {s}->{t})"
        c_x[i] = sigma[t] / sigma[s]
        c_d[i] = alpha[t] * -np.expm1(-h)  # == -alpha_t (e^{-h} - 1)
        if i == 0 or h_prev is None:
            d0[i], d1[i] = 1.0, 0.0  # first step: no history, first order
        else:
            r = h_prev / h
            d0[i] = 1.0 + 1.0 / (2.0 * r)
            d1[i] = -1.0 / (2.0 * r)
        h_prev = h

    return DPMSolverCoefficients(
        ts=ts.astype(np.int32),
        c_x=c_x.astype(np.float32),
        c_d=c_d.astype(np.float32),
        d0=d0.astype(np.float32),
        d1=d1.astype(np.float32),
    )


def dpm_solver_pp_sample_loop(
    diffusion,
    model_fn,
    shape,
    rng,
    *,
    noise=None,
    clip_denoised=True,
    denoised_fn=None,
    model_kwargs=None,
    dtype=jnp.float32,
):
    """Full DPM-Solver++(2M) trajectory as one ``lax.scan``.

    Deterministic given the terminal noise (probability-flow ODE solver);
    ``rng`` only draws the terminal noise when ``noise`` is None. One model
    call per lattice step — choose the step count with
    ``timestep_respacing`` exactly as for DDIM.
    """
    co = dpm_solver_pp_coefficients(diffusion)
    if noise is None:
        _, init_rng = jax.random.split(rng)
        noise = jax.random.normal(init_rng, shape, dtype=dtype)
    B = shape[0]

    def step(carry, per_step):
        x, x0_prev = carry
        s, c_x, c_d, d0, d1 = per_step
        t = jnp.full((B,), s, dtype=jnp.int32)
        out = diffusion.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, model_kwargs=model_kwargs,
        )
        x0 = out["pred_xstart"]
        d = d0 * x0 + d1 * x0_prev
        x_next = c_x * x + c_d * d
        return (x_next, x0), None

    per_step = (
        jnp.asarray(co.ts),
        jnp.asarray(co.c_x),
        jnp.asarray(co.c_d),
        jnp.asarray(co.d0),
        jnp.asarray(co.d1),
    )
    (img, _), _ = jax.lax.scan(step, (noise, jnp.zeros_like(noise)), per_step)
    return img
