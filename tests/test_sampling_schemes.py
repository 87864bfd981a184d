"""Sampling schemes: golden parity vs reference iterators + invariants."""

import numpy as np
import pytest

from lfvdm_tpu.sampling.schemes import sampling_schemes

NON_ADAPTIVE = ["autoreg", "long-range", "hierarchy-2", "hierarchy-3", "hierarchy-4", "hierarchy-5"]


def run_scheme(scheme, video_length):
    seq = []
    it = iter(scheme)
    while True:
        try:
            obs, latent = next(it)
        except StopIteration:
            break
        seq.append((list(obs), list(latent)))
        assert len(seq) < 10 * video_length, "scheme failed to terminate"
    return seq


@pytest.mark.parametrize("name", NON_ADAPTIVE)
@pytest.mark.parametrize("video_length,num_obs,max_frames,step_size", [
    (100, 36, 20, 10),
    (100, 0, 20, 10),   # unconditional first step
    (57, 5, 10, 5),
    (300, 36, 20, 10),
])
def test_scheme_parity_with_reference(reference, name, video_length, num_obs,
                                      max_frames, step_size):
    from improved_diffusion.sampling_schemes import sampling_schemes as ref_schemes

    ref = ref_schemes[name](video_length=video_length, num_obs=num_obs,
                            max_frames=max_frames, step_size=step_size)
    ours = sampling_schemes[name](video_length=video_length, num_obs=num_obs,
                                  max_frames=max_frames, step_size=step_size)
    ref_seq = run_scheme(ref, video_length)
    our_seq = run_scheme(ours, video_length)
    assert len(ref_seq) == len(our_seq)
    for step, (r, o) in enumerate(zip(ref_seq, our_seq)):
        assert r == o, f"{name} step {step}: ref {r} vs ours {o}"


@pytest.mark.parametrize("name", NON_ADAPTIVE)
def test_scheme_generates_all_frames(name):
    T, n_obs, K, S = 64, 8, 12, 6
    scheme = sampling_schemes[name](video_length=T, num_obs=n_obs,
                                    max_frames=K, step_size=S)
    done = set(range(n_obs))
    for obs, latent in run_scheme(scheme, T):
        assert all(i in done for i in obs), "conditioned on an ungenerated frame"
        assert len(obs) + len(latent) <= K
        done.update(latent)
    assert done == set(range(T))


def test_batched_index_broadcast():
    scheme = sampling_schemes["autoreg"](video_length=30, num_obs=4,
                                         max_frames=8, step_size=4)
    scheme.set_videos(np.zeros((3, 30, 3, 8, 8)))
    obs, latent = next(iter(scheme))
    assert len(obs) == 3 and len(latent) == 3
    assert obs[0] == obs[1] == obs[2]


class MockEmbedder:
    """Deterministic embedder: embeds frames by their mean intensity."""

    def __call__(self, frames):
        B = frames.shape[0]
        return frames.reshape(B, -1)[:, :8].astype(np.float32)


@pytest.mark.parametrize("name", ["adaptive-autoreg", "adaptive-hierarchy-2", "adaptive-hierarchy-3"])
def test_adaptive_schemes_complete_and_valid(name):
    T, n_obs, K, S = 40, 6, 10, 5
    rng = np.random.default_rng(0)
    videos = rng.standard_normal((2, T, 3, 8, 8)).astype(np.float32)
    scheme = sampling_schemes[name](video_length=T, num_obs=n_obs, max_frames=K,
                                    step_size=S, embedder=MockEmbedder())
    done = set(range(n_obs))
    it = iter(scheme)
    steps = 0
    while True:
        scheme.set_videos(videos)
        try:
            obs, latent = next(it)
        except StopIteration:
            break
        steps += 1
        assert steps < 10 * T
        # per-batch-element obs lists, shared latent list
        assert len(obs) == 2 and len(latent) == 2
        for obs_b in obs:
            assert all(i in done for i in obs_b)
        done.update(latent[0])
    assert done == set(range(T))


def test_adaptive_select_obs_indices_max_min():
    """Greedy max-min selection picks the farthest frame first."""
    from lfvdm_tpu.sampling.schemes import AdaptiveAutoregressive

    scheme = AdaptiveAutoregressive(video_length=10, num_obs=3, max_frames=4,
                                    step_size=1, embedder=MockEmbedder())
    # frames 0,1 nearly identical; frame 2 very different
    videos = np.zeros((1, 10, 3, 8, 8), np.float32)
    videos[0, 1] += 0.01
    videos[0, 2] += 10.0
    scheme.set_videos(videos)
    sel = scheme.select_obs_indices([0, 1, 2], n=2)
    assert sel[0][0] == 0  # always starts with the first possible index
    assert sel[0][1] == 2  # farthest in embedding space


def test_optimal_schedule_override():
    sched = {0: [0, 1], 1: [2]}
    scheme = sampling_schemes["autoreg"](video_length=16, num_obs=4, max_frames=8,
                                         step_size=4, optimal_schedule=sched)
    it = iter(scheme)
    obs0, _ = next(it)
    assert obs0 == [0, 1]
    obs1, _ = next(it)
    assert obs1 == [2]
