"""Export entry points driven end-to-end against a real tiny checkpoint.

scripts/export_params.py — single-file EMA params msgpack + config.json
(the eval-distribution format; the orbax train state stays the resume
source of truth). scripts/export_sampler.py — portable StableHLO sampler
artifact loadable with only ``lfvdm_tpu.serving`` (no model code).
"""

import importlib
import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.parallel.mesh import make_mesh
from lfvdm_tpu.training.train_loop import TrainLoop

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=8, noise_schedule="cosine",
           compute_dtype="float32", max_frames=4, batch_size=8)


def _load_script(name):
    sys.path.insert(0, str(SCRIPTS))
    try:
        return importlib.import_module(name)
    finally:
        sys.path.pop(0)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """One real training step + orbax save."""
    path = tmp_path_factory.mktemp("export_ckpt")

    def data():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal((8, 12, 2, 32, 32)).astype(np.float32)

    model, diffusion = create_model_and_diffusion(CFG)
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data(), batch_size=8,
        max_frames=4, lr=1e-4, ema_rate="0.9999", log_interval=100,
        save_interval=10_000, checkpoint_dir=str(path), config=dict(CFG),
        mesh=make_mesh(),
    )
    loop.run_step()
    loop.save()
    return path


def test_export_params_roundtrip(ckpt_dir, monkeypatch):
    mod = _load_script("export_params")
    monkeypatch.setattr(sys, "argv", ["export_params.py", str(ckpt_dir)])
    mod.main()
    out = ckpt_dir / "export"
    exported = list(out.glob("params_0.9999_*.msgpack"))
    assert len(exported) == 1
    config = json.loads((out / "config.json").read_text())
    assert config["num_channels"] == CFG["num_channels"]

    # the msgpack restores into the model's param tree and runs
    from flax import serialization

    model, _ = create_model_and_diffusion(config)
    x = np.zeros((1, 4, 2, 32, 32), np.float32)
    fi = np.tile(np.arange(4)[None], (1, 1)).astype(np.int32)
    m = np.zeros((1, 4, 1, 1, 1), np.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, np.zeros((1,), np.int32),
                           x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m))
    params = serialization.from_bytes(
        jax.tree.map(lambda a: np.zeros(a.shape, a.dtype), template),
        exported[0].read_bytes())
    out_arr, _ = model.apply(params, x, np.zeros((1,), np.int32), x0=x,
                             frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    assert np.isfinite(np.asarray(out_arr)).all()


def test_export_sampler_artifact(ckpt_dir, monkeypatch, tmp_path):
    mod = _load_script("export_sampler")
    out = tmp_path / "artifact"
    monkeypatch.setattr(sys, "argv", [
        "export_sampler.py", "--checkpoint_dir", str(ckpt_dir),
        "--out", str(out), "--batch_size", "1", "--max_frames", "4"])
    mod.main()
    assert (out / "sampler.stablehlo").stat().st_size > 0
    assert (out / "params.npz").stat().st_size > 0

    # the artifact runs through the serving loader without model code
    from lfvdm_tpu import serving

    fn = serving.load_window_sampler((out / "sampler.stablehlo").read_bytes())
    params = serving.load_params_npz(str(out / "params.npz"))
    x0 = np.zeros((1, 4, 2, 32, 32), np.float32)
    fi = np.tile(np.arange(4)[None], (1, 1)).astype(np.int32)
    obs = np.zeros((1, 4, 1, 1, 1), np.float32)
    key_data = np.asarray(jax.random.key_data(jax.random.PRNGKey(0)))
    samples = np.asarray(fn(params, x0, fi, obs, 1 - obs, key_data))
    assert samples.shape == x0.shape and np.isfinite(samples).all()
