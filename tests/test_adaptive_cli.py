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
    """Orbax run dir with a tiny model, saved in-process.

    Training the checkpoint through video_train.py would exercise nothing
    this test is after (the sampler CLI's adaptive path) while paying a
    multi-minute CPU XLA compile of the full train step; the checkpoint
    format contract itself is pinned by test_checkpoint_partial.py."""
    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import create_model_and_diffusion
    from lfvdm_tpu.training.checkpoint import save_checkpoint

    cfg = dict(image_size=64, in_channels=3, num_channels=16,
               num_res_blocks=1, diffusion_steps=4, noise_schedule="cosine",
               max_frames=4, T=16, dataset="synthetic")
    model, _ = create_model_and_diffusion(cfg)
    B, K = 1, 4
    x = jnp.zeros((B, K, 3, 64, 64), jnp.float32)
    m = jnp.zeros((B, K, 1, 1, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32),
                        x0=x, frame_indices=jnp.zeros((B, K), jnp.int32),
                        obs_mask=m, latent_mask=1 - m)
    # perturb: fresh-init output heads are zero-init (samples would be
    # pure posterior noise either way, but keep the weights generic)
    params = jax.tree.map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                               p.dtype), params)
    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    save_checkpoint(str(ckpt_dir), 1, {"params": params}, config=cfg)
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
