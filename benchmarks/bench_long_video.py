"""End-to-end long-video generation benchmark: scheme-driven multi-window
sampling (the production inference workload of scripts/video_sample.py).

Generates a full T-frame video with the hierarchy-2 scheme on the flagship
CARLA-pixel config and reports wall-clock, model calls, and frames/sec —
including the host-side scheme planning, gathers, and scatter-back that
bench.py's single-window number excludes.

Usage: python benchmarks/bench_long_video.py [--T 300] [--scheme hierarchy-2]
       [--respace 50]

``--respace`` uses timestep respacing (e.g. 50-step sampler per window) —
the practical eval setting; omit for the full 1000-step chain per window.
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import time

import jax
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion, flagship_config
from lfvdm_tpu.sampling.driver import VideoSampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=300)
    ap.add_argument("--scheme", type=str, default="hierarchy-2")
    ap.add_argument("--n_obs", type=int, default=36)
    ap.add_argument("--max_frames", type=int, default=20)
    ap.add_argument("--step_size", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--respace", type=int, default=0,
                    help="timestep respacing (0 = full 1000 steps per window)")
    ap.add_argument("--sampler", choices=["ancestral", "ddim", "dpm"],
                    default="ancestral",
                    help="dpm = DPM-Solver++(2M) on the lambda-uniform 'dpmN' "
                         "lattice (N = --respace, designed regime 10-25)")
    args = ap.parse_args()

    cfg = flagship_config()
    if args.respace:
        cfg["timestep_respacing"] = (
            f"dpm{args.respace}" if args.sampler == "dpm" else str(args.respace))
    elif args.sampler == "dpm":
        ap.error("--sampler dpm needs --respace N (the model-call budget)")
    model, diffusion = create_model_and_diffusion(cfg)

    B, C, H = args.batch_size, 3, cfg["image_size"]
    rng = np.random.default_rng(0)
    video = rng.standard_normal((B, args.T, C, H, H)).astype(np.float32).clip(-1, 1)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jax.numpy.asarray(video[:, : args.max_frames]),
        jax.numpy.zeros((B,), jax.numpy.int32),
        x0=jax.numpy.asarray(video[:, : args.max_frames]),
        frame_indices=jax.numpy.asarray(
            np.tile(np.arange(args.max_frames)[None], (B, 1)), jax.numpy.int32),
        obs_mask=jax.numpy.ones((B, args.max_frames, 1, 1, 1), jax.numpy.float32),
        latent_mask=jax.numpy.zeros((B, args.max_frames, 1, 1, 1), jax.numpy.float32),
    )
    sampler = VideoSampler(model, diffusion, params,
                           use_ddim=args.sampler == "ddim",
                           use_dpm=args.sampler == "dpm")

    # Warmup: generate once so every window shape is compiled, then time.
    t0 = time.perf_counter()
    _, indices = sampler.sample_video(
        video, scheme_name=args.scheme, n_obs=args.n_obs,
        max_frames=args.max_frames, step_size=args.step_size,
        rng=jax.random.PRNGKey(1))
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    samples, indices = sampler.sample_video(
        video, scheme_name=args.scheme, n_obs=args.n_obs,
        max_frames=args.max_frames, step_size=args.step_size,
        rng=jax.random.PRNGKey(2))
    wall = time.perf_counter() - t0

    gen_frames = (args.T - args.n_obs) * B
    print(json.dumps({
        "metric": "long_video_frames_per_sec",
        "value": round(gen_frames / wall, 2),
        "unit": "frames/s",
        "wall_s": round(wall, 2),
        "warmup_s": round(warm, 2),
        "model_calls": len(indices),
        "steps_per_call": diffusion.num_timesteps,
        "compiled_shapes": len(sampler._compiled),
        "sampler": args.sampler,
        "T": args.T, "n_obs": args.n_obs, "scheme": args.scheme,
        "config": f"carla pixel 128px ch128 res1 K{args.max_frames} B{B} bf16",
    }))


if __name__ == "__main__":
    main()
