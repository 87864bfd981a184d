"""The sharded train step must LOWER to real ICI collectives.

DESIGN.md §4: "XLA emits the ICI collectives from sharding annotations —
there is no hand-written communication anywhere in the framework." These
tests pin that the compiled train step actually contains them on the
virtual 8-device mesh: the dp gradient all-reduce (the reference's DDP
backward, /root/reference/improved_diffusion/train_util.py:118) and, with
fsdp, the ZeRO-3-style param all-gather / grad reduce-scatter.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy tier

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.parallel.mesh import make_mesh
from lfvdm_tpu.training.train_loop import TrainLoop

CFG = dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
           attention_resolutions="8", diffusion_steps=8, noise_schedule="cosine",
           compute_dtype="float32")
B, T, K = 8, 12, 4


def _lowered_hlo(tmp_path, fsdp):
    rng = np.random.default_rng(0)

    def data():
        while True:
            yield rng.standard_normal((B, T, 2, 32, 32)).astype(np.float32)

    loop = TrainLoop(
        model=create_model_and_diffusion(CFG)[0],
        diffusion=create_model_and_diffusion(CFG)[1],
        data=data(), batch_size=B, max_frames=K, lr=1e-4, ema_rate="0.9999",
        log_interval=100, save_interval=10_000,
        checkpoint_dir=str(tmp_path / "ckpt"), config=dict(CFG),
        mesh=make_mesh(fsdp=fsdp),
    )
    from lfvdm_tpu.parallel.sharding import put_batch_array, shard_batch

    batch1 = loop._next_batch()
    batch = loop._prepare(batch1, batch1)
    t_np, w_np = loop.schedule_sampler.sample(batch["x0"].shape[0], loop.host_rng)
    sharded = shard_batch(loop.mesh, batch, accum_axis=False)
    t_dev = put_batch_array(loop.mesh, t_np, accum_axis=False)
    w_dev = put_batch_array(loop.mesh, w_np, accum_axis=False)
    key = jax.random.PRNGKey(0)
    compiled = loop.train_step.lower(loop.state, sharded, t_dev, w_dev, key).compile()
    return compiled.as_text()


def test_dp_step_contains_gradient_all_reduce(tmp_path):
    hlo = _lowered_hlo(tmp_path, fsdp=1)
    # dp=8: per-shard grads must be summed across the mesh — the DDP
    # all-reduce equivalent. XLA may emit all-reduce or fuse into
    # reduce-scatter+all-gather; require at least one cross-replica op.
    n = hlo.count("all-reduce") + hlo.count("reduce-scatter")
    assert n > 0, "no cross-device gradient reduction in the dp train step"


def test_fsdp_step_contains_param_gather_and_grad_scatter(tmp_path):
    hlo = _lowered_hlo(tmp_path, fsdp=2)
    # ZeRO-3: sharded params are all-gathered for compute; grads for sharded
    # params are reduce-scattered (or all-reduced then sliced).
    assert hlo.count("all-gather") > 0, "fsdp step lowered without param all-gather"
    n_red = hlo.count("reduce-scatter") + hlo.count("all-reduce")
    assert n_red > 0, "fsdp step lowered without any gradient reduction"


def test_dp_sampler_has_no_collectives():
    """The mesh-sharded sampler must be embarrassingly parallel: batch-DP
    inference has no cross-device dependency, so the compiled 8-device
    window sampler must contain ZERO collectives (any all-gather/all-reduce
    would mean a sharding annotation accidentally forces communication
    inside the 1000-step scan)."""
    from lfvdm_tpu.sampling.driver import VideoSampler

    model, diffusion = create_model_and_diffusion(CFG)
    Bs, Ks = 8, 4
    x = np.zeros((Bs, Ks, 2, 32, 32), np.float32)
    fi = np.tile(np.arange(Ks)[None], (Bs, 1)).astype(np.int32)
    m = np.zeros((Bs, Ks, 1, 1, 1), np.float32)
    params = model.init(jax.random.PRNGKey(0), x, np.zeros((Bs,), np.int32),
                        x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    mesh = make_mesh(devices=jax.devices()[:8])
    sampler = VideoSampler(model, diffusion, params, mesh=mesh)

    fn = sampler._sampler_for(tuple(x.shape))
    args, key = sampler._place_window_args(x, fi, m, 1 - m, jax.random.PRNGKey(1))
    hlo = fn.lower(sampler.params, *args, key).compile().as_text()
    for op in ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute"):
        # ignore trivial replica-group-free start/done wrappers by matching
        # the op name itself
        assert op not in hlo, f"unexpected {op} in the dp sampler HLO"
