"""Jitted long-video sampler driver.

Capability parity: /root/reference/scripts/video_sample.py:28-85
(`sample_video`): iterate a sampling scheme, gather the conditioning frames,
run the diffusion sampler over a K-frame window, scatter generated frames
back into the video buffer.

TPU design:
  * The inner 1000-step reverse trajectory is ONE compiled ``lax.scan``
    (diffusion.p_sample_loop) — the dominant wall-clock cost never leaves
    the device.
  * Compiled samplers are memoized per call shape (B, K). Schemes emit
    full-K windows for almost every call, so a run compiles a handful of
    shapes at most. Exact shapes (not padding) are used because attention
    pre-norm GroupNorm statistics include every frame in the window —
    padding would perturb real frames (see tests/test_rpe_attention.py).
  * Sampling happens in diffusion space; ``codec.decode`` maps the fully
    assembled video to pixels once at the end (the reference's per-call
    decode crashes for latent shapes; kept out of the loop deliberately).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.gaussian import GaussianDiffusion
from .schemes import sampling_schemes


class VideoSampler:
    def __init__(
        self,
        model,
        diffusion: GaussianDiffusion,
        params,
        *,
        clip_denoised: bool = True,
        use_ddim: bool = False,
        use_dpm: bool = False,
        eta: float = 0.0,
        encoder_reuse: int = 1,
        codec=None,
        mesh=None,
    ):
        self.model = model
        self.diffusion = diffusion
        # Optional data-parallel sampling over a device mesh: the batch axis
        # of every window call is sharded over the mesh's data shards and
        # params are replicated, so one process samples mesh-many videos per
        # scan (the reference parallelizes eval via SLURM array jobs only).
        # Single-process meshes: the assembled samples are fetched with
        # np.asarray, which needs every shard addressable.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import replicated

            assert jax.process_count() == 1, (
                "mesh-sharded sampling supports single-process meshes; "
                "on pods scripts/video_sample.py instead shards the video "
                "indices across processes (jax.process_index())"
            )
            params = jax.device_put(params, replicated(mesh))
        self.params = params
        # Decodes the fully assembled video once at the end of sample_video
        # (latent -> pixel; reference decodes in-loop,
        # gaussian_diffusion.py:932-947). None = return diffusion space.
        self.codec = codec
        self.clip_denoised = clip_denoised
        self.use_ddim = use_ddim
        # DPM-Solver++(2M) (diffusion/dpm_solver.py): second-order
        # deterministic solver — 10-25 model calls per window (set the count
        # with timestep_respacing) instead of the ancestral/DDIM hundreds.
        self.use_dpm = use_dpm
        assert not (use_ddim and use_dpm), "pick ONE of use_ddim / use_dpm"
        self.eta = eta
        # Training-free encoder propagation (arXiv:2312.09608): run the
        # U-Net encoder every k-th diffusion step, decoder-only between.
        # Approximate — opt-in; ancestral sampling only.
        self.encoder_reuse = int(encoder_reuse)
        assert self.encoder_reuse == 1 or not (use_ddim or use_dpm), (
            "encoder_reuse supports the ancestral sampler only"
        )
        self._compiled: Dict[Tuple[int, ...], callable] = {}
        self._warned_tail: set = set()

    def _sampler_for(self, shape: Tuple[int, ...]):
        if shape in self._compiled:
            return self._compiled[shape]

        def fn(params, x0, frame_indices, obs_mask, latent_mask, rng):
            model_kwargs = dict(x0=x0, frame_indices=frame_indices,
                                obs_mask=obs_mask, latent_mask=latent_mask)

            def model_fn(x, ts, **kw):
                out, _ = self.model.apply(params, x, ts, **kw)
                return out

            if self.use_ddim:
                return self.diffusion.ddim_sample_loop(
                    model_fn, shape, rng, clip_denoised=self.clip_denoised,
                    model_kwargs=model_kwargs, eta=self.eta,
                )
            if self.use_dpm:
                from ..diffusion.dpm_solver import dpm_solver_pp_sample_loop

                return dpm_solver_pp_sample_loop(
                    self.diffusion, model_fn, shape, rng,
                    clip_denoised=self.clip_denoised, model_kwargs=model_kwargs,
                )
            if self.encoder_reuse > 1:
                def model_fn_features(x, ts, feats):
                    out, _, new_feats = self.model.apply(
                        params, x, ts, features=feats, return_features=True,
                        **model_kwargs)
                    return out, new_feats

                return self.diffusion.p_sample_loop(
                    model_fn, shape, rng, clip_denoised=self.clip_denoised,
                    model_kwargs=model_kwargs,
                    encoder_reuse=self.encoder_reuse,
                    model_fn_features=model_fn_features,
                )
            return self.diffusion.p_sample_loop(
                model_fn, shape, rng, clip_denoised=self.clip_denoised,
                model_kwargs=model_kwargs,
            )

        compiled = jax.jit(fn)
        self._compiled[shape] = compiled
        return compiled

    def _place_window_args(self, x0, frame_indices, obs_mask, latent_mask, rng):
        """Device placement for one window call: batch-sharded over the mesh
        when one is configured (replicated fallback for non-divisible tail
        batches), plain device arrays otherwise. Returns (args, rng)."""
        if self.mesh is None:
            return [jnp.asarray(a) for a in
                    (x0, frame_indices, obs_mask, latent_mask)], rng
        from ..parallel.sharding import put_batch_array, replicated

        B = np.asarray(x0).shape[0]
        if B % self.mesh.size:
            # e.g. the tail batch of an eval run — run it replicated rather
            # than crash at the finish line (jit recompiles for the
            # replicated input sharding; the values are identical).
            if B not in self._warned_tail:
                self._warned_tail.add(B)
                print(f"sample_window: batch {B} not divisible by the mesh's "
                      f"{self.mesh.size} data shards; running replicated")
            args = [jax.device_put(np.asarray(a), replicated(self.mesh))
                    for a in (x0, frame_indices, obs_mask, latent_mask)]
        else:
            args = [put_batch_array(self.mesh, np.asarray(a))
                    for a in (x0, frame_indices, obs_mask, latent_mask)]
        # every committed input must share the mesh's device assignment
        return args, jax.device_put(rng, replicated(self.mesh))

    def sample_window(self, x0, frame_indices, obs_mask, latent_mask, rng):
        """Run the reverse process for one K-frame window (static shapes)."""
        fn = self._sampler_for(tuple(x0.shape))
        args, rng = self._place_window_args(x0, frame_indices, obs_mask,
                                            latent_mask, rng)
        return fn(self.params, *args, rng)

    def sample_window_attn(self, x0, frame_indices, obs_mask, latent_mask, rng):
        """``sample_window`` that also returns the reference's per-quartile
        attention heatmaps (gaussian_diffusion.py:448-469). Ancestral only."""
        assert not (self.use_ddim or self.use_dpm) and self.encoder_reuse == 1, (
            "sample_window_attn runs the exact ancestral sampler; it cannot "
            "honor use_ddim/use_dpm or encoder_reuse>1 — sample without "
            "attention weights instead"
        )
        shape = tuple(x0.shape)
        cache_key = ("attn",) + shape
        if cache_key not in self._compiled:
            def fn(params, x0_, frame_indices_, obs_mask_, latent_mask_, rng_):
                def model_fn(x, ts, **kw):
                    return self.model.apply(params, x, ts, return_attn_weights=True, **kw)

                model_kwargs = dict(x0=x0_, frame_indices=frame_indices_,
                                    obs_mask=obs_mask_, latent_mask=latent_mask_)
                return self.diffusion.p_sample_loop(
                    model_fn, shape, rng_, clip_denoised=self.clip_denoised,
                    model_kwargs=model_kwargs, return_attn_weights=True,
                )

            self._compiled[cache_key] = jax.jit(fn)
        args, rng = self._place_window_args(x0, frame_indices, obs_mask,
                                            latent_mask, rng)
        return self._compiled[cache_key](self.params, *args, rng)

    def sample_video(
        self,
        batch: np.ndarray,
        *,
        scheme_name: str,
        n_obs: int,
        max_frames: int,
        step_size: int,
        rng,
        optimal_schedule: Optional[dict] = None,
        embedder=None,
        just_get_indices: bool = False,
        verbose: bool = False,
    ):
        """Generate a full video given its first ``n_obs`` frames.

        ``batch``: (B, T, C, H, W) ground-truth videos in DIFFUSION space
        (only the first n_obs frames are consumed unless
        ``just_get_indices``). Returns (samples numpy, indices_used list);
        when a codec is attached the assembled video is decoded once at the
        end, so samples are pixel-space (B, T, 3, H', W').
        """
        B, T, C, H, W = batch.shape
        samples = np.zeros_like(batch)
        samples[:, :n_obs] = batch[:, :n_obs]

        kwargs = dict(video_length=T, num_obs=n_obs, max_frames=max_frames,
                      step_size=step_size, optimal_schedule=optimal_schedule)
        if scheme_name.startswith("adaptive"):
            kwargs["embedder"] = embedder
        scheme = iter(sampling_schemes[scheme_name](**kwargs))

        indices_used = []
        while True:
            scheme.set_videos(samples)
            try:
                obs_idx, latent_idx = next(scheme)
            except StopIteration:
                break
            if not isinstance(obs_idx[0], (list, np.ndarray)):
                obs_idx = [list(obs_idx)] * B
                latent_idx = [list(latent_idx)] * B
            if verbose:
                print(f"conditioning on {sorted(obs_idx[0])}, "
                      f"generating {sorted(latent_idx[0])}")

            frame_indices = np.concatenate(
                [np.asarray(obs_idx, np.int32), np.asarray(latent_idx, np.int32)], axis=1
            )  # (B, K_call)
            K = frame_indices.shape[1]
            x0 = np.stack([samples[b, frame_indices[b]] for b in range(B)])
            obs_mask = np.zeros((B, K, 1, 1, 1), np.float32)
            obs_mask[:, : len(obs_idx[0])] = 1.0
            latent_mask = 1.0 - obs_mask

            if just_get_indices:
                local = np.stack([batch[b, frame_indices[b]] for b in range(B)])
            else:
                rng, key = jax.random.split(rng)
                local = np.asarray(
                    self.sample_window(x0, frame_indices, obs_mask, latent_mask, key)
                )
            n_latent = len(latent_idx[0])
            for b in range(B):
                samples[b, latent_idx[b]] = local[b, -n_latent:]
            indices_used.append((obs_idx, latent_idx))
        if self.codec is not None and not just_get_indices:
            samples = np.asarray(self.codec.decode(samples))
        return samples, indices_used
