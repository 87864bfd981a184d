"""Training runtime on a virtual 8-device CPU mesh (dp and dp×fsdp)."""

import os

import jax
import numpy as np
import pytest

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.parallel.mesh import make_mesh
from lfvdm_tpu.training.train_loop import TrainLoop

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=8, noise_schedule="cosine",
           compute_dtype="float32")
B, T, K = 8, 12, 4


def synthetic_data(seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield rng.standard_normal((B, T, 2, 32, 32)).astype(np.float32)


def make_loop(tmp_path, fsdp=1, **kw):
    model, diffusion = create_model_and_diffusion(CFG)
    return TrainLoop(
        model=model, diffusion=diffusion, data=synthetic_data(),
        batch_size=B, max_frames=K, lr=1e-4, ema_rate="0.9999,0.99",
        log_interval=100, save_interval=10_000,
        checkpoint_dir=str(tmp_path / "ckpt"), config=dict(CFG),
        mesh=make_mesh(fsdp=fsdp), **kw,
    )


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_train_steps_reduce_state(tmp_path):
    loop = make_loop(tmp_path)
    p0 = jax.tree.map(np.asarray, loop.state["params"])
    for _ in range(3):
        loop.run_step()
        loop.step += 1
    assert int(loop.state["step"]) == 3
    p1 = jax.tree.map(np.asarray, loop.state["params"])
    # params moved
    diffs = [np.abs(a - b).max() for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))]
    assert max(diffs) > 0
    # both EMA rates tracked and distinct from params
    for rate in ("0.9999", "0.99"):
        ema = jax.tree.map(np.asarray, loop.state["ema"][rate])
        d = [np.abs(a - b).max() for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(p1))]
        assert max(d) > 0


def test_checkpoint_save_resume_roundtrip(tmp_path):
    loop = make_loop(tmp_path)
    loop.run_step()
    loop.step = 1
    loop.save()
    ref_params = jax.tree.map(np.asarray, loop.state["params"])

    loop2 = make_loop(tmp_path, resume=True)
    assert loop2.step == 1
    got = jax.tree.map(np.asarray, loop2.state["params"])
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)
    # and training continues from the restored state
    loop2.run_step()
    assert int(loop2.state["step"]) == 2


def test_fsdp_mesh_one_step(tmp_path):
    loop = make_loop(tmp_path, fsdp=2)
    # verify at least one large param is actually sharded over fsdp
    shardings = jax.tree.map(lambda p: p.sharding, loop.state["params"])
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("fsdp" in str(spec) for spec in specs), specs
    loop.run_step()
    assert np.isfinite(float(jax.tree.leaves(loop.state["params"])[0].sum()))


def test_training_test_env_hook(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    loop = make_loop(tmp_path)
    loop.run_loop()  # must return after the first step, then save on exit
    assert loop.step <= 2
