"""In-training sample logging (EMA weights, deterministic vis batch).

Capability parity: /root/reference/improved_diffusion/train_util.py:428-475
(`log_samples`): on a fixed vis batch, build deterministic obs/latent masks
(first third observed; row 1 strided), sample with the EMA weights, decode
the composite, mark observed frames with a red border, log as video.
"""

from __future__ import annotations

import jax
import numpy as np

from ..utils.logger import logger
from ..utils.rng import RNG
from ..utils.video_io import mark_as_observed, tensor2gif
from .masks import sample_all_masks, prepare_training_batch


_REPLICATE_CACHE = {}  # mesh -> jitted identity-with-replicated-out-shardings


def gather_params_to_host(mesh, params, fetch: bool = True):
    """All-gather a (possibly fsdp-sharded) param tree; fetch to host numpy.

    One jitted identity with fully-replicated out_shardings — XLA emits the
    all-gather over ICI/DCN; every process enters the same collective
    (symmetric, so it cannot deadlock a pod). ``fetch=False`` returns after
    the collective without the device->host copy (non-zero ranks only need
    to participate). The jitted gather is cached per mesh so repeated vis
    intervals don't re-trace. The multi-host replacement for the reference's
    rank-0 model access in log_samples (train_util.py:428-475).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    if mesh not in _REPLICATE_CACHE:
        _REPLICATE_CACHE[mesh] = jax.jit(
            lambda p: p, out_shardings=NamedSharding(mesh, PartitionSpec())
        )
    replicated = _REPLICATE_CACHE[mesh](params)
    if not fetch:
        jax.block_until_ready(jax.tree.leaves(replicated)[0])
        return None
    return jax.tree.map(np.asarray, replicated)


def make_vis_masks(B: int, T: int, max_frames: int):
    """Deterministic vis masks: row 0 contiguous prefix, row 1 strided."""
    n_obs = max_frames // 3
    obs = np.zeros((B, T), np.float32)
    latent = np.zeros((B, T), np.float32)
    obs[0, :n_obs] = 1.0
    latent[0, n_obs:max_frames] = 1.0
    if B > 1:
        spacing = T // max_frames
        obs[1, : n_obs * spacing: spacing] = 1.0
        latent[1, n_obs * spacing: max_frames * spacing: spacing] = 1.0
    return obs, latent, n_obs


def make_sample_fn(vis_batch: np.ndarray, *, ema_rate: str = None, out_dir: str = None,
                   seed: int = 0, log_attn: bool = False):
    """Build a TrainLoop.sample_fn that logs EMA samples on the vis batch.

    ``log_attn=True`` additionally collects the per-quartile attention
    heatmaps during sampling (reference gaussian_diffusion.py:448-469) and
    saves them as ``.npy`` next to the sample gifs.
    """

    samplers = {}  # rate -> VideoSampler, kept across calls so the compiled
    # sampler is reused every sample_interval (params are a jit argument).

    def sample_fn(loop):
        rate = ema_rate or sorted(loop.state["ema"].keys())[-1]
        ema_params = loop.state["ema"][rate]
        if jax.process_count() > 1:
            # EMA params live on the GLOBAL mesh; a process-0-only jit over
            # them would deadlock the other processes in a collective.
            # Instead: every process enters one symmetric all-gather
            # (gather_params_to_host), then only process 0 samples — on its
            # own local device, with host params, no cross-host collectives.
            # The final sync is the reference's dist.barrier()
            # (train_util.py:475).
            from jax.experimental import multihost_utils

            if jax.process_index() != 0:
                # Participate in the collective, skip the host copy.
                gather_params_to_host(loop.mesh, ema_params, fetch=False)
                multihost_utils.sync_global_devices("vis_sampling_done")
                return
            ema_params = gather_params_to_host(loop.mesh, ema_params)
        from ..sampling.driver import VideoSampler

        if rate not in samplers:
            samplers[rate] = VideoSampler(loop.model, loop.diffusion, ema_params)
        sampler = samplers[rate]
        sampler.params = ema_params

        B, T = vis_batch.shape[:2]
        with RNG(seed):
            rng = np.random.default_rng(seed)
            obs, latent, n_obs = make_vis_masks(B, T, loop.max_frames)
            set_masks = {"obs": obs, "latent": latent}
            obs_s, latent_s = sample_all_masks(rng, B, T, loop.max_frames,
                                               set_masks=set_masks)
            batch, fi, obs_m, lat_m = prepare_training_batch(
                rng, vis_batch, obs_s, latent_s, loop.max_frames,
                pad_with_random_frames=False,
            )
        if loop.codec is not None:
            batch = np.asarray(loop.codec.encode(batch))

        attns = None
        if log_attn:
            local, attns = sampler.sample_window_attn(
                batch, fi, obs_m, lat_m, jax.random.PRNGKey(seed))
            local = np.asarray(local)
        else:
            local = np.asarray(sampler.sample_window(
                batch, fi, obs_m, lat_m, jax.random.PRNGKey(seed)))
        composite = local * lat_m + batch * obs_m
        if loop.codec is not None:
            composite = np.asarray(loop.codec.decode(composite))
        vids = ((composite + 1) * 127.5).clip(0, 255).astype(np.uint8)
        mark_as_observed(vids[:, :n_obs])

        if out_dir is not None:
            import os

            os.makedirs(out_dir, exist_ok=True)
            for i, vid in enumerate(vids):
                path = f"{out_dir}/step{loop.step:06d}_video{i}.gif"
                tensor2gif(vid, path, drange=(0, 255))
                logger.logkv(f"video-{i}", path, distributed=False)
            if attns is not None:
                for tag, arr in attns.items():
                    safe = tag.replace("/", "_")
                    np.save(f"{out_dir}/step{loop.step:06d}_{safe}.npy",
                            np.asarray(arr))

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("vis_sampling_done")

    return sample_fn
