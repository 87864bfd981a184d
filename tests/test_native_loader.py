"""Tests for the native C++ video batch loader (lfvdm_tpu/native/).

Builds the shared library with g++ (skips if unavailable), writes tiny
.npy-per-video datasets to tmp, and checks window reads, batch assembly,
determinism semantics, and the load_data() integration against the Python
loader path.
"""

import numpy as np
import pytest

from lfvdm_tpu.data.native_loader import (
    NativeVideoLoader,
    native_loader_available,
    native_loader_error,
)


def _write_videos(tmp_path, n=6, T=12, H=8, W=8, C=3, dtype=np.uint8):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        if dtype == np.uint8:
            vid = rng.integers(0, 256, (T + i, H, W, C), dtype=np.uint8)
        else:
            vid = rng.standard_normal((T + i, H, W, C)).astype(np.float32)
        p = tmp_path / f"{i}.npy"
        np.save(p, vid)
        paths.append(str(p))
    return paths


needs_native = pytest.mark.skipif(
    not native_loader_available(),
    reason=f"native loader unavailable: {native_loader_error()}",
)


@needs_native
def test_deterministic_iteration_matches_files(tmp_path):
    paths = _write_videos(tmp_path, n=4, T=10)
    loader = NativeVideoLoader(paths, T=6, batch_size=2, deterministic=True,
                               test_mode=True, seed=1)
    b0 = next(loader)
    b1 = next(loader)
    loader.close()
    assert b0.shape == (2, 6, 8, 8, 3) and b0.dtype == np.uint8
    for i, batch, k in [(0, b0, 0), (1, b0, 1), (2, b1, 0), (3, b1, 1)]:
        expect = np.load(paths[i])[:6]
        np.testing.assert_array_equal(batch[k], expect)


@needs_native
def test_random_windows_are_valid_subsequences(tmp_path):
    paths = _write_videos(tmp_path, n=3, T=16)
    loader = NativeVideoLoader(paths, T=4, batch_size=3, deterministic=False, seed=7)
    videos = [np.load(p) for p in paths]
    for _ in range(4):
        batch = next(loader)
        for item in batch:
            found = any(
                any(np.array_equal(item, v[s:s + 4]) for s in range(len(v) - 3))
                for v in videos
            )
            assert found, "batch item is not a contiguous window of any source video"
    loader.close()


@needs_native
def test_float32_videos(tmp_path):
    paths = _write_videos(tmp_path, n=3, T=9, dtype=np.float32)
    loader = NativeVideoLoader(paths, T=5, batch_size=2, deterministic=True,
                               test_mode=True)
    batch = next(loader)
    loader.close()
    assert batch.dtype == np.float32
    np.testing.assert_array_equal(batch[0], np.load(paths[0])[:5])


@needs_native
def test_vl_open_rejects_item_bytes_aliasing(tmp_path):
    """u8 (T,8,8,3) and f4 (T,4,4,3) have identical per-frame BYTES — the
    loader must reject the mix on shape/dtype, not accept it on size."""
    np.save(tmp_path / "a.npy",
            np.zeros((20, 8, 8, 3), np.uint8))
    np.save(tmp_path / "b.npy",
            np.zeros((20, 4, 4, 3), np.float32))
    with pytest.raises(RuntimeError):
        NativeVideoLoader([str(tmp_path / "a.npy"), str(tmp_path / "b.npy")],
                          T=4, batch_size=1)


@needs_native
def test_vl_open_rejects_batch_larger_than_dataset(tmp_path):
    paths = _write_videos(tmp_path, n=2, T=10)
    with pytest.raises(RuntimeError):
        NativeVideoLoader(paths, T=4, batch_size=8)


@needs_native
def test_same_seed_same_stream(tmp_path):
    paths = _write_videos(tmp_path, n=5, T=14)
    a = NativeVideoLoader(paths, T=6, batch_size=2, seed=42)
    b = NativeVideoLoader(paths, T=6, batch_size=2, seed=42)
    for _ in range(3):
        np.testing.assert_array_equal(next(a), next(b))
    a.close()
    b.close()


@needs_native
def test_load_data_native_integration(tmp_path, monkeypatch):
    """load_data() on an .npy dataset streams through the native path with
    the same normalization as the Python path."""
    import lfvdm_tpu.data.datasets as D

    train_dir = tmp_path / "train"
    train_dir.mkdir()
    _write_videos(train_dir, n=4, T=10)
    monkeypatch.setitem(D.video_data_paths_dict, "minerl", str(tmp_path))
    monkeypatch.setitem(D.default_T_dict, "minerl", 6)

    gen = D.load_data("minerl", batch_size=2, T=6, deterministic=True, seed=0)
    batch = next(gen)
    assert batch.shape == (2, 6, 3, 8, 8)
    assert batch.dtype == np.float32
    # deterministic disables shuffling only; the window start stays random
    # (reference load_data semantics). Item 0 must be a contiguous window of
    # video 0 with the Python path's normalization applied.
    video = np.load(train_dir / "0.npy").astype(np.float32) / 255.0
    video = 2 * video.transpose(0, 3, 1, 2) - 1
    found = any(np.allclose(batch[0], video[s:s + 6], atol=1e-6)
                for s in range(len(video) - 5))
    assert found, "native batch item is not a normalized window of video 0"


def test_vl_open_rejects_too_short_videos(tmp_path):
    if not native_loader_available():
        pytest.skip("native loader unavailable")
    paths = _write_videos(tmp_path, n=2, T=4)
    with pytest.raises(RuntimeError):
        NativeVideoLoader(paths, T=64, batch_size=1)


@needs_native
def test_carla_pt_auto_uses_converted_npy(tmp_path, monkeypatch):
    """A CARLA .pt dir with convert_pt_to_npy.py siblings streams through
    the native loader with CarlaDataset's normalization (VERDICT r1 #7)."""
    import sys

    import torch

    import lfvdm_tpu.data.datasets as D

    carla = tmp_path / "no-traffic"
    carla.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        vid = rng.integers(0, 256, (10 + i, 8, 8, 3), dtype=np.uint8)
        name = f"video_{i:05d}.pt"
        torch.save(torch.from_numpy(vid), carla / name)
        names.append(name)
    with open(carla / "video_train.csv", "w") as f:
        f.write("\n".join(f"videos/{n}" for n in names))

    monkeypatch.setitem(D.video_data_paths_dict, "carla_no_traffic", str(carla))
    monkeypatch.setitem(D.default_T_dict, "carla_no_traffic", 6)

    # without .npy siblings: no native paths
    ds = D.load_data("carla_no_traffic", batch_size=2, T=6, return_dataset=True)
    assert ds.native_paths() is None

    sys.path.insert(0, "/root/repo/datasets/carla")
    import convert_pt_to_npy

    monkeypatch.setattr(sys, "argv", ["x", "--src", str(carla)])
    convert_pt_to_npy.main()
    assert ds.native_paths() is not None and len(ds.native_paths()) == 4

    gen = D.load_data("carla_no_traffic", batch_size=2, T=6, deterministic=True, seed=0)
    batch = next(gen)
    assert batch.shape == (2, 6, 3, 8, 8) and batch.dtype == np.float32
    video = np.load(carla / "video_00000.npy").astype(np.float32) / 255.0
    video = 2 * video.transpose(0, 3, 1, 2) - 1
    found = any(np.allclose(batch[0], video[s:s + 6], atol=1e-6)
                for s in range(len(video) - 5))
    assert found, "native CARLA batch item is not a normalized window of video 0"
