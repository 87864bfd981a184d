"""Training-time mask/frame sampler invariants."""

import numpy as np

from lfvdm_tpu.training.masks import (
    prepare_training_batch,
    sample_all_masks,
    sample_some_indices,
    sample_training_batch,
)


def test_sample_some_indices_ranges():
    rng = np.random.default_rng(0)
    for _ in range(200):
        idx = sample_some_indices(rng, 10, 50)
        assert 1 <= len(idx) <= 10
        assert all(0 <= i < 50 for i in idx)
        assert idx == sorted(idx)


def test_sample_all_masks_invariants():
    rng = np.random.default_rng(1)
    for _ in range(50):
        obs, latent = sample_all_masks(rng, B=4, T=100, max_frames=20)
        assert obs.shape == latent.shape == (4, 100)
        overlap = (obs * latent).sum()
        assert overlap == 0, "obs and latent masks must be disjoint"
        total = (obs + latent).sum(axis=1)
        assert (total <= 20).all()
        assert (latent.sum(axis=1) >= 1).all(), "every row needs latent frames"


def test_sample_all_masks_set_masks_override():
    rng = np.random.default_rng(2)
    fixed_obs = np.zeros((2, 50), np.float32)
    fixed_obs[:, :3] = 1
    fixed_lat = np.zeros((2, 50), np.float32)
    fixed_lat[:, 3:6] = 1
    obs, latent = sample_all_masks(rng, B=4, T=50, max_frames=10,
                                   set_masks={"obs": fixed_obs, "latent": fixed_lat})
    np.testing.assert_array_equal(obs[:2], fixed_obs)
    np.testing.assert_array_equal(latent[:2], fixed_lat)


def test_prepare_training_batch_compaction():
    rng = np.random.default_rng(3)
    B, T, C, H, W = 2, 20, 3, 4, 4
    batch1 = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    batch2 = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
    obs = np.zeros((B, T), np.float32)
    latent = np.zeros((B, T), np.float32)
    obs[0, [2, 7]] = 1
    latent[0, [11, 15, 19]] = 1
    obs[1, [0]] = 1
    latent[1, [5]] = 1
    K = 8
    b, fi, om, lm = prepare_training_batch(rng, batch1, obs, latent, K, batch2=batch2)
    assert b.shape == (B, K, C, H, W) and fi.shape == (B, K)
    assert om.shape == lm.shape == (B, K, 1, 1, 1)
    # row 0: 5 selected frames compacted to front, correct content + masks
    np.testing.assert_array_equal(fi[0, :5], [2, 7, 11, 15, 19])
    np.testing.assert_allclose(b[0, :5], batch1[0, [2, 7, 11, 15, 19]])
    np.testing.assert_array_equal(om[0, :5, 0, 0, 0], [1, 1, 0, 0, 0])
    np.testing.assert_array_equal(lm[0, :5, 0, 0, 0], [0, 0, 1, 1, 1])
    # padding: indices in range, content from batch2, masks gathered
    assert ((fi[0, 5:] >= 0) & (fi[0, 5:] < T)).all()
    for j in range(5, K):
        np.testing.assert_allclose(b[0, j], batch2[0, fi[0, j]])
        assert om[0, j, 0, 0, 0] == obs[0, fi[0, j]]
        assert lm[0, j, 0, 0, 0] == latent[0, fi[0, j]]


def test_prepare_training_batch_no_padding():
    rng = np.random.default_rng(4)
    B, T = 2, 20
    batch1 = rng.standard_normal((B, T, 3, 4, 4)).astype(np.float32)
    obs = np.zeros((B, T), np.float32)
    latent = np.zeros((B, T), np.float32)
    obs[0, :2] = 1
    latent[0, 2:5] = 1
    latent[1, 10:12] = 1
    b, fi, om, lm = prepare_training_batch(rng, batch1, obs, latent, 8,
                                           pad_with_random_frames=False)
    assert b.shape[1] == 5  # max selected across rows
    # row 1 has only 2 selected; remainder is zero-padded with index 0
    np.testing.assert_array_equal(fi[1], [10, 11, 0, 0, 0])


def test_sample_training_batch_end_to_end():
    rng = np.random.default_rng(5)
    batch1 = rng.standard_normal((4, 100, 3, 4, 4)).astype(np.float32)
    batch2 = rng.standard_normal((4, 100, 3, 4, 4)).astype(np.float32)
    b, fi, om, lm = sample_training_batch(rng, batch1, 20, batch2=batch2)
    assert b.shape == (4, 20, 3, 4, 4)
    assert ((om + lm) <= 1 + 1e-6).all()
    # training loss mask is (1 - obs) when padding: padding frames train too
    train_mask = 1 - om
    assert train_mask.min() >= 0
