"""Latent-regime sampler benchmark with FLOP-fair vs_baseline + VAE cost.

The reference's latent (namesake) regime command (README.md:14):
``batch_size=1, max_frames=5, carla_no_traffic_2x_encoded`` -> image 32,
in_channels 4, num_channels 64, num_res_blocks 1. This row mirrors bench.py's
protocol for that config — the 1000-step reverse scan as ONE compiled
lax.scan, best-of-N launches, XLA-costed FLOPs over the 35 TFLOP/s A100-eager
estimate with the dilated-upsample FLOP delta added back to the baseline
numerator (same-function fairness, BASELINE.md round 2) — and additionally
attributes the VAE overhead the latent mode adds: the per-video decode
(amortized once per assembled video, reference gaussian_diffusion.py:932-947)
timed with the fixture-converted SVD decoder.

Usage (TPU): python benchmarks/bench_latent.py [--steps 1000] [--T 100]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import A100_EFFECTIVE_FLOPS, upsample_flop_correction

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LATENT_CFG = dict(image_size=32, in_channels=4, num_channels=64,
                  num_res_blocks=1, attention_resolutions="16,8",
                  diffusion_steps=1000, compute_dtype="bfloat16")
B, K = 1, 5  # reference latent command's batch/max_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--T", type=int, default=100,
                    help="video length for the per-video VAE decode timing")
    ap.add_argument("--vae_prefix", default=os.path.join(
        REPO, "datasets/synthetic-encoded/svd_vae_fixture"))
    args = ap.parse_args()

    from lfvdm_tpu.config import create_model_and_diffusion, enable_compilation_cache

    enable_compilation_cache()
    model, diffusion = create_model_and_diffusion(LATENT_CFG)
    C, H = LATENT_CFG["in_channels"], LATENT_CFG["image_size"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs
    kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((B,), jnp.int32), **kwargs)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    fwd = jax.jit(lambda x, ts: model_fn(x, ts, **kwargs))
    flops = float(fwd.lower(x0, jnp.zeros((B,), jnp.int32)).compile()
                  .cost_analysis()["flops"])
    delta, levels = upsample_flop_correction(B * K, H, LATENT_CFG["num_channels"])
    ref_flops = flops + delta

    def chunk(noise, key):
        def step(carry, s):
            img, k = carry
            k, sub = jax.random.split(k)
            out = diffusion.p_sample(model_fn, img, jnp.full((B,), s, jnp.int32),
                                     sub, model_kwargs=kwargs)
            return (out["sample"], k), None

        steps = jnp.arange(args.steps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, key), steps)
        return img

    run = jax.jit(chunk)
    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    np.asarray(run(noise, jax.random.PRNGKey(1)))  # compile+warmup, fenced
    times = []
    for i in range(args.launches):
        t0 = time.perf_counter()
        out = np.asarray(run(noise, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(out).all()
    sec_per_call = min(times) / args.steps
    frames_per_sec = B * K / sec_per_call
    vs_baseline = frames_per_sec / (B * K / (ref_flops / A100_EFFECTIVE_FLOPS))

    # ---- VAE overhead attribution: one per-video decode at the end of
    # sampling (the only VAE work the pre-encoded production path pays)
    vae_keys = {}
    if os.path.exists(args.vae_prefix + "_encoder.npz"):
        from lfvdm_tpu.models.vae import load_svd_vae

        vae = load_svd_vae(args.vae_prefix)
        z = jnp.asarray(rng.standard_normal((1, args.T, C, H, H)), jnp.float32)
        np.asarray(vae.decode_video(z))  # compile+warmup
        t0 = time.perf_counter()
        np.asarray(vae.decode_video(z))
        dec = time.perf_counter() - t0
        # windows per video for the flagship hierarchy-2/autoreg runs:
        # ~T/step_size scans of args.steps calls each
        n_windows = max(1, args.T // (K // 2))
        sampling_s = n_windows * args.steps * sec_per_call
        vae_keys = {
            "vae_decode_per_video_s": round(dec, 3),
            "vae_decode_share_of_video": round(dec / (dec + sampling_s), 4),
            "note_vae": f"decode amortized once per {args.T}-frame video vs "
                        f"~{n_windows} x {args.steps}-step window scans",
        }
    else:
        vae_keys = {"vae_decode_per_video_s": None,
                    "note_vae": "no converted VAE at --vae_prefix (run "
                                "benchmarks/prep_synthetic_latent.py first)"}

    print(json.dumps({
        "metric": "latent_unet_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
        "sec_per_model_call": round(sec_per_call, 6),
        "launch_times_s": [round(t, 2) for t in times],
        "flops_per_call": flops,
        "ref_flops_per_call": ref_flops,
        "flop_correction_levels": levels,
        "achieved_tflops": round(flops / sec_per_call / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(flops / sec_per_call / 197e12, 4),
        **vae_keys,
        "device": str(jax.devices()[0]),
        "config": f"latent 32px C4 ch64 res1 K{K} B{B} bf16 "
                  "(reference README.md:14 regime)",
    }))


if __name__ == "__main__":
    main()
