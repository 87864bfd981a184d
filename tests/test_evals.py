"""Metric math (Fréchet/KID), logger, paths, locks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.evals.fvd import frechet_distance, kid, preprocess_videos
from lfvdm_tpu.utils.logger import Logger
from lfvdm_tpu.utils.paths import get_eval_run_identifier, get_model_results_path


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16))
    assert abs(frechet_distance(x, x.copy())) < 1e-6


def test_frechet_distance_mean_shift_closed_form():
    """For equal covariances, FD reduces to |mu1 - mu2|^2."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20000, 4))
    shift = np.array([1.0, 0.0, -2.0, 0.5])
    d = frechet_distance(x, x + shift)
    assert abs(d - shift @ shift) < 0.05


def test_frechet_distance_parity_with_reference(reference):
    import torch

    pytest.importorskip("tensorflow_hub")  # the reference module imports it at top
    from improved_diffusion.frechet_video_distance import fid_features_to_metric

    rng = np.random.default_rng(2)
    f1 = rng.standard_normal((256, 32)).astype(np.float32)
    f2 = (rng.standard_normal((256, 32)) * 1.3 + 0.2).astype(np.float32)
    ref = fid_features_to_metric(torch.tensor(f1), torch.tensor(f2))
    ours = frechet_distance(f1, f2)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


def test_kid_discriminates_distributions():
    """Unbiased MMD²: ≈0 for same-distribution sets, large for shifted."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((500, 8))
    y = rng.standard_normal((500, 8))
    near = kid(x, y, n_subsets=20)
    far = kid(x, y + 2.0, n_subsets=20)
    assert abs(near) < 0.5
    assert far > 10 * abs(near)


def test_preprocess_videos_shape_and_range():
    vids = (np.random.default_rng(4).random((2, 3, 32, 32, 3)) * 255).astype(np.uint8)
    out = preprocess_videos(vids)
    assert out.shape == (2, 3, 224, 224, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_logger_kv_semantics():
    lg = Logger()
    lg.logkv("a", 3.0)
    lg.logkv_mean("b", 1.0)
    lg.logkv_mean("b", 3.0)
    out = lg.dumpkvs()
    assert out["a"] == 3.0
    assert out["b"] == 2.0
    assert lg.dumpkvs() == {}  # cleared


def test_results_paths():
    p = get_model_results_path(
        "/scratch/checkpoints/abcdefg/ema_0.9999_550000.pt",
        use_ddim=True, timestep_respacing="25",
    )
    assert str(p) == "results/abcdefg/ema_0.9999_550000_ddim_respace25"
    ident = get_eval_run_identifier("hierarchy-2", 20, 10, 1000, 36)
    assert ident == "hierarchy-2_20_10_1000_36"


def test_protect_lock(tmp_path):
    from lfvdm_tpu.utils.locks import Protect

    target = tmp_path / "shared.txt"
    with Protect(target):
        target.write_text("x")
    assert target.read_text() == "x"


def test_i3d_runs_without_weights():
    from lfvdm_tpu.evals.i3d import I3DFeatureExtractor

    ext = I3DFeatureExtractor()
    out = ext(np.zeros((1, 16, 224, 224, 3), np.float32))
    assert out.shape == (1, 400)
    assert np.all(np.isfinite(out))


def test_lpips_embedder_distance_properties():
    from lfvdm_tpu.evals.lpips import LpipsEmbedder

    emb = LpipsEmbedder(image_size=32)
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ea = emb(a)
    eb = emb(a + 0.5)
    assert ea.shape[0] == 2
    d_same = ((ea - ea) ** 2).sum()
    d_diff = ((ea - eb) ** 2).sum()
    assert d_same == 0 and d_diff > 0


def test_fvd_protocol_end_to_end(tmp_path, monkeypatch):
    """The full sample-files -> paired-batches -> I3D features -> Fréchet
    pipeline of scripts/video_fvd.py runs green and is ~0 when the samples
    ARE the test set (pins the protocol; reference video_fvd.py:34-85)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from video_fvd import compute_fvd

    import lfvdm_tpu.data.datasets as D

    T, H = 6, 32
    test_ds = D.SyntheticVideoDataset(num_videos=4, T=T, C=3, H=H, W=H)
    test_ds.set_test()
    monkeypatch.setattr(D, "get_test_dataset", lambda name, T=None: test_ds)
    monkeypatch.setattr(sys.modules["video_fvd"], "get_test_dataset",
                        lambda name, T=None: test_ds)

    samples_dir = tmp_path / "samples"
    samples_dir.mkdir()
    for i in range(4):
        vid = ((np.asarray(test_ds[i]) + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        np.save(samples_dir / f"sample_{i:04d}-0.npy", vid)

    score = compute_fvd(tmp_path, "synthetic", num_videos=4, sample_idx=0, T=T)
    assert np.isfinite(score)
    # identical distributions -> tiny FVD (numerical noise only)
    assert score < 1.0, score


def test_fvd_real_side_dataset_mapping():
    """Latent checkpoints decode samples to pixels, so the REAL features
    come from the pixel dataset; pixel datasets map to themselves."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from video_fvd import real_dataset_name

    assert real_dataset_name("carla_no_traffic_2x_encoded") == "carla_no_traffic_2x"
    assert real_dataset_name("carla_no_traffic") == "carla_no_traffic"
    assert real_dataset_name("synthetic") == "synthetic"


def test_i3d_mesh_sharded_matches_unsharded():
    """FVD feature extraction over the 8-device mesh: batch-sharded I3D
    features equal the single-device ones (weights replicated); a
    non-divisible batch falls back to replicated execution."""
    import jax

    from lfvdm_tpu.evals.i3d import I3DFeatureExtractor
    from lfvdm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16, 224, 224, 3)).astype(np.float32)
    plain = I3DFeatureExtractor()
    mesh = make_mesh(devices=jax.devices()[:8])
    sharded = I3DFeatureExtractor(mesh=mesh)
    np.testing.assert_allclose(sharded(x), plain(x), rtol=2e-4, atol=2e-4)
    out = sharded(x[:3])  # replicated fallback
    assert out.shape == (3, 400) and np.isfinite(out).all()
