"""Adaptive schemes through the PRODUCTION sampler CLI, end-to-end.

VERDICT r4 item 4: the adaptive schemes' index logic was pinned with
stub/real embedders (test_sampling_schemes.py) but no
``video_sample.py --sampling_scheme adaptive-*`` run had ever exercised the
host<->device ping-pong (set_videos -> LPIPS embed -> greedy selection ->
per-element gathers) inside the real pipeline — the "never executed" risk
class that produced 3 converter bugs in round 3. This drives the real CLIs
as subprocesses on CPU; the TPU genquality rows (BASELINE.md round 5) are
the tracked on-chip counterpart.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
ENV = {**os.environ, "LFVDM_PLATFORM": "cpu"}


def _run(cmd):
    out = subprocess.run([sys.executable] + [str(c) for c in cmd], cwd=REPO,
                         text=True, capture_output=True, env=ENV)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    _run(["scripts/video_train.py", "--dataset", "synthetic", "--T", "16",
          "--batch_size", "2", "--max_frames", "4", "--num_channels", "16",
          "--num_res_blocks", "1", "--diffusion_steps", "4",
          "--noise_schedule", "cosine",  # linear betas exceed 1 at 4 steps
          "--max_steps", "2", "--save_interval", "1", "--sample_interval", "0",
          "--checkpoint_dir", str(ckpt_dir), "--seed", "0"])
    return ckpt_dir


@pytest.mark.parametrize("scheme", ["adaptive-autoreg", "adaptive-hierarchy-2"])
def test_adaptive_scheme_through_production_cli(tiny_ckpt, tmp_path, scheme):
    eval_dir = tmp_path / "samples"
    _run(["scripts/video_sample.py", str(tiny_ckpt),
          "--sampling_scheme", scheme, "--eval_dir", str(eval_dir),
          "--dataset", "synthetic", "--T", "16", "--max_frames", "4",
          "--n_obs", "4", "--batch_size", "2", "--stop_index", "2",
          "--seed", "0"])
    subdirs = [d for d in eval_dir.iterdir()
               if d.is_dir() and d.name.startswith(scheme + "_")]
    assert len(subdirs) == 1
    files = sorted((subdirs[0] / "samples").glob("sample_*.npy"))
    assert len(files) == 2
    for f in files:
        v = np.load(f)
        assert v.shape == (16, 3, 64, 64) and v.dtype == np.uint8
        # latent frames were actually written (not the zeros buffer)
        assert v[8:].std() > 0
    # config JSON written for video_fvd.py
    assert json.loads((subdirs[0] / "model_config.json").read_text())
