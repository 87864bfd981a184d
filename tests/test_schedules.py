"""Schedule tables, respacing, and table math vs closed form + reference."""

import numpy as np
import pytest

from lfvdm_tpu.diffusion.schedules import (
    betas_for_alpha_bar,
    get_named_beta_schedule,
    respaced_betas,
    space_timesteps,
)


def test_linear_schedule_closed_form():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert np.isclose(betas[0], 0.0001)
    assert np.isclose(betas[-1], 0.02)
    assert np.all(np.diff(betas) > 0)
    # scale-invariance property: 100-step schedule spans 10x the beta range
    betas100 = get_named_beta_schedule("linear", 100)
    assert np.isclose(betas100[0], 0.001)
    assert np.isclose(betas100[-1], 0.2)


def test_cosine_schedule_properties():
    betas = get_named_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # alpha_bar implied by betas matches the analytic alpha_bar at midpoints
    import math

    acp = np.cumprod(1 - betas)
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    t = 500
    assert np.isclose(acp[t - 1], f(t / 1000) / f(0), rtol=1e-6)


def test_betas_for_alpha_bar_capped():
    betas = betas_for_alpha_bar(10, lambda t: max(1e-9, 1 - t * 2), max_beta=0.999)
    assert (betas <= 0.999).all()


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim25")
    assert len(steps) == 25
    assert steps == set(range(0, 1000, 40))


def test_space_timesteps_sections():
    steps = space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45
    assert min(steps) == 0 and max(steps) < 300


def test_space_timesteps_full_identity():
    assert space_timesteps(100, [100]) == set(range(100))


def test_respaced_betas_reconstruct_alpha_bar():
    betas = get_named_beta_schedule("linear", 100)
    use = space_timesteps(100, "ddim10")
    new_betas, tmap = respaced_betas(betas, use)
    assert len(new_betas) == 10 and len(tmap) == 10
    # The spaced process must hit the same alpha_bar at each retained step.
    acp_orig = np.cumprod(1 - betas)
    acp_new = np.cumprod(1 - new_betas)
    np.testing.assert_allclose(acp_new, acp_orig[tmap], rtol=1e-12)


@pytest.mark.parametrize("name,steps", [("linear", 1000), ("cosine", 1000), ("linear", 32)])
def test_schedule_parity_with_reference(reference, name, steps):
    ref_betas = reference.gaussian_diffusion.get_named_beta_schedule(name, steps)
    np.testing.assert_allclose(get_named_beta_schedule(name, steps), ref_betas, rtol=1e-12)


def test_respacing_parity_with_reference(reference):
    from improved_diffusion.respace import space_timesteps as ref_space

    for spec in ["ddim25", "100", "10,20,30"]:
        assert space_timesteps(1000, spec) == ref_space(1000, spec)
