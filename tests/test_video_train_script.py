"""Script-level wiring tests for scripts/video_train.py --init_from_pt.

TrainLoop's own warm-start semantics are covered in test_train_loop.py; here
the SCRIPT's plumbing is pinned: the converted tree must actually reach the
TrainLoop constructor (a dropped kwarg would silently train from random
init), the checkpoint's diffusion-parameterization keys must override CLI
defaults (reference eval rebuilds model AND diffusion from the embedded
config, video_sample.py:205-213), and codec/space mismatches must fail fast
with a clear error.
"""

import importlib
import os
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def _video_train():
    sys.path.insert(0, str(SCRIPTS))
    try:
        return importlib.import_module("video_train")
    finally:
        sys.path.pop(0)


@pytest.fixture
def ref_pt(tmp_path, reference):
    """A tiny reference-format .pt checkpoint with a NON-default diffusion
    parameterization embedded in its config."""
    import torch
    from improved_diffusion.script_util import create_model as ref_create_model

    torch.manual_seed(7)
    model = ref_create_model(
        image_size=32, in_channels=3, num_channels=32, num_res_blocks=1,
        learn_sigma=False, class_cond=False, use_checkpoint=False,
        attention_resolutions="16,8", num_heads=4, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, use_rpe_net=True,
    )
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    path = str(tmp_path / "model_000200.pt")
    torch.save(
        {"state_dict": model.state_dict(),
         "config": dict(image_size=32, in_channels=3, num_channels=32,
                        num_res_blocks=1, attention_resolutions="16,8",
                        use_rpe_net=True, diffusion_space="pixel",
                        # non-default diffusion parameterization: fine-tuning
                        # under the CLI defaults would be a silently wrong loss
                        predict_xstart=True, noise_schedule="cosine",
                        diffusion_steps=8, rescale_learned_sigmas=False)},
        path,
    )
    return path


class _CaptureLoop:
    """TrainLoop stand-in: records ctor kwargs, skips all compute."""

    captured = None

    def __init__(self, **kwargs):
        _CaptureLoop.captured = kwargs

    def run_loop(self, max_steps=None):
        pass


def _run_main(monkeypatch, argv):
    vt = _video_train()
    monkeypatch.setattr(vt, "TrainLoop", _CaptureLoop)
    monkeypatch.setattr(sys, "argv", ["video_train.py"] + argv)
    _CaptureLoop.captured = None
    vt.main()
    return _CaptureLoop.captured


def test_init_from_pt_reaches_train_loop(monkeypatch, tmp_path, ref_pt):
    """The converted param tree is passed to TrainLoop (ADVICE r2 high: the
    kwarg was silently dropped while printing the 'adopted' message)."""
    from lfvdm_tpu.utils.torch_convert import convert_reference_checkpoint

    captured = _run_main(monkeypatch, [
        "--dataset", "synthetic", "--init_from_pt", ref_pt,
        "--sample_interval", "0", "--batch_size", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    assert captured is not None
    got = captured["init_params"]
    assert got is not None, "--init_from_pt must pass init_params to TrainLoop"
    want, _ = convert_reference_checkpoint(ref_pt)
    got_leaves = jax_leaves(got)
    want_leaves = jax_leaves(want)
    assert len(got_leaves) == len(want_leaves)
    np.testing.assert_allclose(np.asarray(got_leaves[0]),
                               np.asarray(want_leaves[0]), atol=0)


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_init_from_pt_adopts_diffusion_keys(monkeypatch, tmp_path, ref_pt):
    """Checkpoint diffusion-parameterization keys override CLI defaults
    (ADVICE r2 medium) — the diffusion object handed to TrainLoop must be
    built from them."""
    captured = _run_main(monkeypatch, [
        "--dataset", "synthetic", "--init_from_pt", ref_pt,
        "--sample_interval", "0", "--batch_size", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    cfg = captured["config"]
    assert cfg["predict_xstart"] is True
    assert cfg["noise_schedule"] == "cosine"
    assert cfg["diffusion_steps"] == 8
    assert cfg["rescale_learned_sigmas"] is False
    diffusion = captured["diffusion"]
    assert diffusion.num_timesteps == 8
    # predict_xstart -> START_X mean type (not the default EPSILON)
    assert "START_X" in str(diffusion.model_mean_type).upper()


def test_init_from_pt_space_mismatch_fails_fast(monkeypatch, tmp_path, ref_pt):
    """Pixel-space checkpoint + *_encoded latent dataset must raise a clear
    error before model build (ADVICE r2 low), not an opaque shape error."""
    vt = _video_train()
    monkeypatch.setattr(vt, "TrainLoop", _CaptureLoop)
    monkeypatch.setattr(sys, "argv", [
        "video_train.py", "--dataset", "carla_no_traffic_2x_encoded",
        "--init_from_pt", ref_pt, "--sample_interval", "0",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    with pytest.raises(ValueError, match="space"):
        vt.main()


def test_init_from_pt_channel_mismatch_fails_fast(monkeypatch, tmp_path,
                                                  ref_pt, reference):
    """Latent-space checkpoint with in_channels=3 on an encoded dataset:
    the in_channels/codec consistency check fires."""
    import torch

    ckpt = torch.load(ref_pt, weights_only=False)
    ckpt["config"]["diffusion_space"] = "latent"
    bad = str(tmp_path / "latent3ch.pt")
    torch.save(ckpt, bad)

    vt = _video_train()
    monkeypatch.setattr(vt, "TrainLoop", _CaptureLoop)
    monkeypatch.setattr(sys, "argv", [
        "video_train.py", "--dataset", "carla_no_traffic_2x_encoded",
        "--init_from_pt", bad, "--sample_interval", "0",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    with pytest.raises(ValueError, match="in_channels"):
        vt.main()
