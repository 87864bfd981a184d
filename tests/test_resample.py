"""Schedule-sampler parity (diffusion/resample.py vs reference resample.py).

Pins the UniformSampler's importance weighting and the
LossSecondMomentResampler's exact state machine: uniform until EVERY
timestep has a full history (warmup), then weights ∝ sqrt(mean(loss²))
with the 0.001 uniform floor, FIFO history eviction, and sample()'s
importance weights 1/(N·p[t]).
Reference: /root/reference/improved_diffusion/resample.py:36-58,123-169.
"""

import numpy as np
import pytest

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.diffusion.resample import (LossSecondMomentResampler,
                                          UniformSampler,
                                          create_named_schedule_sampler)

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=8, noise_schedule="cosine",
           compute_dtype="float32")


@pytest.fixture(scope="module")
def diffusion():
    return create_model_and_diffusion(CFG)[1]


def test_registry_names(diffusion):
    assert isinstance(create_named_schedule_sampler("uniform", diffusion),
                      UniformSampler)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", diffusion),
        LossSecondMomentResampler)
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", diffusion)


def test_uniform_sample_weights_are_inverse_prob(diffusion):
    s = UniformSampler(diffusion)
    rng = np.random.default_rng(0)
    ts, w = s.sample(64, rng)
    T = diffusion.num_timesteps
    assert ts.shape == (64,) and (0 <= ts).all() and (ts < T).all()
    # p uniform -> importance weight 1/(T * (1/T)) = 1 for every draw
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_warmup_then_weighting(diffusion):
    T = diffusion.num_timesteps
    s = LossSecondMomentResampler(diffusion, history_per_term=3,
                                  uniform_prob=0.001)
    # not warmed up -> uniform weights
    np.testing.assert_allclose(s.weights(), np.ones(T))
    s.update_with_all_losses([0, 1], [5.0, 1.0])
    np.testing.assert_allclose(s.weights(), np.ones(T))  # still cold

    # fill every term's history with known losses: loss(t) = t + 1
    for _ in range(3):
        s.update_with_all_losses(list(range(T)), [float(t + 1) for t in range(T)])
    w = s.weights()
    # reference formula: sqrt(mean(history^2)) normalized, 0.001 uniform mix
    hist = s._loss_history
    expect = np.sqrt(np.mean(hist ** 2, axis=-1))
    expect = expect / expect.sum() * (1 - 0.001) + 0.001 / T
    np.testing.assert_allclose(w, expect)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    assert w[-1] > w[0]  # larger losses upweighted


def test_loss_history_fifo_eviction(diffusion):
    s = LossSecondMomentResampler(diffusion, history_per_term=2)
    s.update_with_all_losses([3, 3, 3], [1.0, 2.0, 3.0])
    # history depth 2: first value evicted, newest kept in order
    np.testing.assert_allclose(s._loss_history[3], [2.0, 3.0])
    assert s._loss_counts[3] == 2


def test_sample_importance_weights_match_distribution(diffusion):
    T = diffusion.num_timesteps
    s = LossSecondMomentResampler(diffusion, history_per_term=1)
    s.update_with_all_losses(list(range(T)), [float(t + 1) for t in range(T)])
    rng = np.random.default_rng(1)
    ts, w = s.sample(256, rng)
    p = s.weights() / s.weights().sum()
    np.testing.assert_allclose(w, 1.0 / (T * p[ts]))
    # the high-loss tail must actually be drawn more often than the head
    assert (ts >= T // 2).mean() > 0.5


def test_update_with_local_losses_single_process_applies(diffusion):
    s = LossSecondMomentResampler(diffusion, history_per_term=1)
    s.update_with_local_losses(np.array([2, 5]), np.array([1.5, 2.5]))
    assert s._loss_counts[2] == 1 and s._loss_counts[5] == 1
    np.testing.assert_allclose(s._loss_history[5, 0], 2.5)
