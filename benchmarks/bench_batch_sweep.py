"""Sampler throughput vs batch size on the flagship CARLA-128px config.

The frames/s/chip metric scales with MXU occupancy; the reference's own
sampling tool defaults to batch_size=8 (/root/reference/scripts/
video_sample.py:171), so the production sampling regime is B>=2. This
sweep measures frames/s/chip at each B with the same single-launch
lax.scan the production sampler uses.

Usage: python benchmarks/bench_batch_sweep.py [--batches 2,4,8] [--steps 200]
"""

import argparse
import json
import time

import numpy as np

import _path  # noqa: F401


def run_one(B, n_steps, cfg):
    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import create_model_and_diffusion, flagship_config

    model, diffusion = create_model_and_diffusion(cfg)
    K, C, H = 20, 3, cfg["image_size"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t, x0=x0,
                                 frame_indices=fi, obs_mask=obs, latent_mask=lat)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    model_kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)

    def sampler_chunk(noise, rng_key):
        def step(carry, s):
            img, key = carry
            key, sub = jax.random.split(key)
            t_b = jnp.full((B,), s, jnp.int32)
            out = diffusion.p_sample(model_fn, img, t_b, sub, model_kwargs=model_kwargs)
            return (out["sample"], key), None

        steps = jnp.arange(n_steps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
        return img

    run = jax.jit(sampler_chunk)
    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    key = jax.random.PRNGKey(1)
    np.asarray(run(noise, key))  # compile + warmup, fenced (np.asarray = real fetch)

    t0 = time.perf_counter()
    out = np.asarray(run(noise, jax.random.fold_in(key, 1)))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(out).all()
    sec_per_call = elapsed / n_steps
    return {
        "B": B,
        "sec_per_call": round(sec_per_call, 5),
        "frames_per_sec_per_chip": round(B * K / sec_per_call, 1),
        "sampler_1000step_wallclock_s": round(sec_per_call * 1000, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="2,4,8")
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    import jax

    cfg = flagship_config()
    for B in [int(b) for b in args.batches.split(",")]:
        res = run_one(B, args.steps, cfg)
        res["device"] = str(jax.devices()[0])
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
