"""In-training vis sampling (log_samples parity), incl. the multi-host path.

Reference: train_util.py:428-475 — rank 0 samples with EMA weights every
sample_interval and logs video panels; the TPU build must do this on pods
too (round-1 skipped there), via a symmetric params all-gather.
"""

import types

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.parallel.mesh import make_mesh
from lfvdm_tpu.parallel.sharding import fsdp_param_sharding
from lfvdm_tpu.training.vis_sampling import gather_params_to_host, make_sample_fn

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=4, noise_schedule="cosine",
           compute_dtype="float32")
B, T, K = 2, 12, 4


@pytest.fixture(scope="module")
def fake_loop():
    model, diffusion = create_model_and_diffusion(CFG)
    x = np.zeros((B, K, 2, 32, 32), np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, K, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32), x0=x,
                        frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(p.shape).astype(np.float32),
        params,
    )
    mesh = make_mesh(fsdp=2)
    sharded = jax.device_put(params, fsdp_param_sharding(mesh, params, min_size=1))
    return types.SimpleNamespace(
        model=model, diffusion=diffusion, max_frames=K, codec=None, step=1,
        mesh=mesh, state={"ema": {"0.9999": sharded}},
    )


def test_gather_params_to_host_roundtrip(fake_loop):
    """fsdp-sharded params all-gather back to the exact host values."""
    params = fake_loop.state["ema"]["0.9999"]
    host = gather_params_to_host(fake_loop.mesh, params)
    for got, want in zip(jax.tree.leaves(host), jax.tree.leaves(params)):
        assert isinstance(got, np.ndarray)
        np.testing.assert_array_equal(got, np.asarray(want))


def test_vis_sampling_single_host(fake_loop, tmp_path):
    vis_batch = np.random.default_rng(1).standard_normal(
        (B, T, 2, 32, 32)).astype(np.float32)
    fn = make_sample_fn(vis_batch, out_dir=str(tmp_path), seed=0)
    fn(fake_loop)
    gifs = list(tmp_path.glob("*.gif"))
    assert len(gifs) == B


def test_vis_sampling_fake_pod_process0(fake_loop, tmp_path, monkeypatch):
    """On a 'pod' (process_count>1), process 0 gathers params and still
    produces sample panels; the function ends at the barrier-equivalent."""
    from jax.experimental import multihost_utils

    syncs = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: syncs.append(name))
    vis_batch = np.random.default_rng(2).standard_normal(
        (B, T, 2, 32, 32)).astype(np.float32)
    fn = make_sample_fn(vis_batch, out_dir=str(tmp_path), seed=0)
    fn(fake_loop)
    assert len(list(tmp_path.glob("*.gif"))) == B
    assert syncs == ["vis_sampling_done"]


def test_vis_sampling_fake_pod_other_process_is_noop(fake_loop, tmp_path, monkeypatch):
    from jax.experimental import multihost_utils

    syncs = []
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: syncs.append(name))
    vis_batch = np.random.default_rng(3).standard_normal(
        (B, T, 2, 32, 32)).astype(np.float32)
    fn = make_sample_fn(vis_batch, out_dir=str(tmp_path), seed=0)
    fn(fake_loop)
    assert list(tmp_path.glob("*.gif")) == []  # non-zero ranks write nothing
    assert syncs == ["vis_sampling_done"]  # but DO enter the barrier
