"""video_to_world_coords.py driver semantics (fast tier, stubbed predictor).

Reference: /root/reference/scripts/video_to_world_coords.py:37-54 — runs
the regressor over a samples dir or a raw dataset dir, writes per-video
``coords/<stem>.npy``, and skips already-produced outputs (idempotent
across SLURM array jobs).
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import torch

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def _load_script():
    sys.path.insert(0, str(SCRIPTS))
    try:
        return importlib.import_module("video_to_world_coords")
    finally:
        sys.path.pop(0)


class _StubPredictor:
    """Records inputs; returns per-frame zero coords (shape contract)."""

    def __init__(self):
        self.calls = []

    def predict_coords(self, frames):
        self.calls.append(np.asarray(frames).shape)
        return np.zeros((len(frames), 2), np.float32)


def _run(mod, monkeypatch, argv, stub):
    monkeypatch.setattr(mod, "load_classifier_regressor_like_paper",
                        lambda *a, **k: stub)
    monkeypatch.setattr(sys, "argv", ["video_to_world_coords.py",
                                      "--classifier_path", "c.pt",
                                      "--regressor_path", "r.pt"] + argv)
    mod.main()


def test_eval_dir_mode(tmp_path, monkeypatch):
    mod = _load_script()
    samples = tmp_path / "samples"
    samples.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(samples / f"sample_{i:04d}-0.npy",
                rng.integers(0, 255, (4, 3, 8, 8), dtype=np.uint8))
    stub = _StubPredictor()
    _run(mod, monkeypatch, ["--eval_dir", str(tmp_path)], stub)
    outs = sorted((tmp_path / "coords").glob("*.npy"))
    assert [p.name for p in outs] == [f"sample_{i:04d}-0.npy" for i in range(3)]
    assert all(np.load(p).shape == (4, 2) for p in outs)
    assert stub.calls and all(s == (4, 3, 8, 8) for s in stub.calls)


def test_dataset_dir_mode_and_layout(tmp_path, monkeypatch):
    """Raw .pt videos are loaded THWC and fed to the predictor as TCHW."""
    mod = _load_script()
    rng = np.random.default_rng(1)
    torch.save(torch.from_numpy(
        rng.integers(0, 255, (5, 8, 8, 3), dtype=np.uint8)),
        tmp_path / "video_00000.pt")
    stub = _StubPredictor()
    _run(mod, monkeypatch, ["--dataset_dir", str(tmp_path)], stub)
    assert (tmp_path / "coords" / "video_00000.npy").exists()
    assert stub.calls == [(5, 3, 8, 8)]


def test_skip_existing_outputs(tmp_path, monkeypatch):
    """Idempotence: already-produced coords are not recomputed."""
    mod = _load_script()
    samples = tmp_path / "samples"
    samples.mkdir()
    for i in range(2):
        np.save(samples / f"sample_{i:04d}-0.npy",
                np.zeros((2, 3, 8, 8), np.uint8))
    done = tmp_path / "coords"
    done.mkdir()
    sentinel = np.full((2, 2), 7.0, np.float32)
    np.save(done / "sample_0000-0.npy", sentinel)
    stub = _StubPredictor()
    _run(mod, monkeypatch, ["--eval_dir", str(tmp_path)], stub)
    assert len(stub.calls) == 1  # only the missing video ran
    assert np.array_equal(np.load(done / "sample_0000-0.npy"), sentinel)


def test_video_sample_pod_index_sharding(monkeypatch):
    """On pods, video_sample shards video indices across processes
    (interleaved, like the reference's SLURM-array split)."""
    import jax

    sys.path.insert(0, str(SCRIPTS))
    try:
        vs = importlib.import_module("video_sample")
    finally:
        sys.path.pop(0)
    idx = list(range(10))
    assert vs.shard_indices_for_process(idx) == idx  # single process
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert vs.shard_indices_for_process(idx) == [1, 4, 7]


def test_just_visualise_renders_png(tmp_path, monkeypatch):
    """--just_visualise's index-plan renderer writes one PNG per batch
    element (reference video_sample.py:109-164) without touching a model."""
    import argparse

    sys.path.insert(0, str(SCRIPTS))
    try:
        vs = importlib.import_module("video_sample")
    finally:
        sys.path.pop(0)
    monkeypatch.chdir(tmp_path)
    args = argparse.Namespace(n_obs=4, T=16, sampling_scheme="autoreg",
                              max_latent_frames=2, max_frames=4)
    # two steps of an autoreg plan for B=1 (per-element index lists)
    indices_used = [([[2, 3]], [[4, 5]]), ([[4, 5]], [[6, 7]])]
    vs.visualise(args, indices_used)
    pngs = list((tmp_path / "visualisations").glob("vis_autoreg_*.png"))
    assert len(pngs) == 1 and pngs[0].stat().st_size > 0
