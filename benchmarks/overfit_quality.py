"""End-to-end generative-correctness harness: overfit one video, sample it back.

Trains the full stack (mask sampler -> jitted train step) on a single
synthetic video until the eps noise floor is low enough, then runs the
autoregressive long-video sampler conditioned on the first 4 frames and
measures per-frame reconstruction error. A correct pipeline reproduces the
memorized video (gen err well under the GT adjacent-frame delta of ~17
uint8 levels); any train/sample inconsistency (mask wiring, timestep
rescaling, head precision, chain math) shows up as structure-right but
content-wrong samples with err ~80+.

Empirical caution this harness encodes: with few-step cosine schedules the
betas clip at 0.999, so the first chain steps weight pred_x0 heavily while
the high-t eps signal is only ~sqrt(alpha_bar)*x0 — an undertrained model
(eps RMSE floor above that signal) samples garbage even at train loss 1e-2.
Train to ~3e-3 before judging sample quality.

Usage: python benchmarks/overfit_quality.py [--steps 6000]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import sys

import jax
import numpy as np

from lfvdm_tpu.config import apply_platform_env, create_model_and_diffusion

apply_platform_env()  # honor $LFVDM_PLATFORM=cpu like the CLI scripts
from lfvdm_tpu.data.datasets import SyntheticVideoDataset
from lfvdm_tpu.sampling.driver import VideoSampler
from lfvdm_tpu.training.train_loop import TrainLoop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--threshold", type=float, default=20.0)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--encoder_reuse", type=str, default="1",
                    help="comma list of k values; the model trains ONCE and each "
                         "k samples with encoder propagation every k steps")
    ap.add_argument("--samplers", type=str, default="ancestral",
                    help="comma list: 'ancestral', 'ddimN' (N-step strided DDIM), "
                         "'dpmN' (N-call DPM-Solver++(2M) on the lambda-uniform "
                         "lattice). The model trains ONCE on the full schedule; "
                         "each entry samples with its own respaced diffusion")
    ap.add_argument("--diffusion_steps", type=int, default=64,
                    help="1000 + linear = the flagship schedule; encoder reuse "
                         "is designed for long schedules where adjacent steps "
                         "are nearly identical (arXiv:2312.09608)")
    ap.add_argument("--noise_schedule", default="cosine",
                    help="use 'linear' with --diffusion_steps 1000")
    args = ap.parse_args()

    cfg = dict(image_size=32, in_channels=3, num_channels=64, num_res_blocks=1,
               attention_resolutions="16,8", diffusion_steps=args.diffusion_steps,
               noise_schedule=args.noise_schedule, compute_dtype=args.compute_dtype)
    model, diffusion = create_model_and_diffusion(cfg)
    T = 24
    video = SyntheticVideoDataset(num_videos=1, T=T, C=3, H=32, W=32, seed=5)[0]

    def gen():
        while True:
            yield np.stack([video] * 8)

    loop = TrainLoop(model=model, diffusion=diffusion, data=gen(), batch_size=8,
                     max_frames=5, lr=2e-4, ema_rate="0.9999",
                     log_interval=1000, save_interval=10**9,
                     checkpoint_dir="/tmp/lfvdm_overfit_quality", config=cfg)
    loop.run_loop(max_steps=args.steps)

    gt = ((video + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
    all_ok = True
    for spec in str(args.samplers).split(","):
        if spec == "ancestral":
            samp_diffusion, kw = diffusion, {}
        elif spec.startswith("dpm"):
            samp_diffusion = create_model_and_diffusion(
                {**cfg, "timestep_respacing": spec})[1]
            kw = dict(use_dpm=True)
        elif spec.startswith("ddim"):
            samp_diffusion = create_model_and_diffusion(
                {**cfg, "timestep_respacing": spec})[1]
            kw = dict(use_ddim=True)
        else:
            raise ValueError(f"unknown sampler spec {spec!r}")
        for k in (int(v) for v in str(args.encoder_reuse).split(",")):
            sampler = VideoSampler(model, samp_diffusion, loop.state["params"],
                                   encoder_reuse=k, **kw)
            samples, _ = sampler.sample_video(
                np.stack([video]), scheme_name="autoreg",
                n_obs=4, max_frames=5, step_size=2,
                rng=jax.random.PRNGKey(0))
            s = ((samples[0] + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
            err = [float(np.abs(s[i].astype(int) - gt[i].astype(int)).mean())
                   for i in range(T)]
            gen_err = float(np.mean(err[4:]))
            ok = gen_err < args.threshold and max(err[:4]) == 0.0
            all_ok = all_ok and ok
            print(json.dumps({
                "metric": "overfit_gen_err_uint8",
                "diffusion_steps": args.diffusion_steps,
                "sampler": spec,
                "encoder_reuse": k,
                "value": round(gen_err, 2),
                "threshold": args.threshold,
                "obs_frames_exact": max(err[:4]) == 0.0,
                "per_frame_err": [round(e, 1) for e in err],
                "pass": ok,
            }), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
