"""Sampler throughput across the production configs (one row per config).

Times the single-launch reverse-diffusion scan (like bench.py) for each of
the workloads the reference actually runs:
  * carla-pixel-128  — released-checkpoint flagship (README.md:54-57)
  * carla-latent-32  — SVD-latent training command (README.md:14)
  * mazes/minerl-64  — the 64px datasets' default config

Usage: python benchmarks/bench_matrix.py [--steps 100]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion

CONFIGS = {
    "carla-pixel-128": dict(
        cfg=dict(image_size=128, in_channels=3, num_channels=128, num_res_blocks=1,
                 attention_resolutions="16,8", diffusion_steps=1000,
                 compute_dtype="bfloat16"),
        B=2, K=20,
    ),
    "carla-latent-32": dict(
        cfg=dict(image_size=32, in_channels=4, num_channels=64, num_res_blocks=1,
                 attention_resolutions="16,8", diffusion_steps=1000,
                 compute_dtype="bfloat16"),
        B=1, K=5,
    ),
    "mazes-64": dict(
        cfg=dict(image_size=64, in_channels=3, num_channels=128, num_res_blocks=2,
                 attention_resolutions="16,8", diffusion_steps=1000,
                 compute_dtype="bfloat16"),
        B=2, K=20,
    ),
    # res1 variant: the res2 graph can exceed remote-compile payload limits
    # on tunneled dev setups; this row always compiles.
    "mazes-64-res1": dict(
        cfg=dict(image_size=64, in_channels=3, num_channels=128, num_res_blocks=1,
                 attention_resolutions="16,8", diffusion_steps=1000,
                 compute_dtype="bfloat16"),
        B=2, K=20,
    ),
}


def bench_one(name, cfg, B, K, n_steps):
    model, diffusion = create_model_and_diffusion(cfg)
    C, H = cfg["in_channels"], cfg["image_size"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : max(1, K // 2)].set(1.0)
    lat = 1.0 - obs
    kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((B,), jnp.int32), **kwargs)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    fwd = jax.jit(lambda x, ts: model_fn(x, ts, **kwargs))
    try:
        flops = float(fwd.lower(x0, jnp.zeros((B,), jnp.int32)).compile()
                      .cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    def chunk(noise, key):
        def step(carry, s):
            img, k = carry
            k, sub = jax.random.split(k)
            t_b = jnp.full((B,), s, jnp.int32)
            out = diffusion.p_sample(model_fn, img, t_b, sub, model_kwargs=kwargs)
            return (out["sample"], k), None

        steps = jnp.arange(n_steps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, key), steps)
        return img

    run = jax.jit(chunk)
    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    # np.asarray is a REAL fence on tunneled runtimes; block_until_ready has
    # been observed to return while the remote compile is still in flight
    # (see .claude/skills/verify/SKILL.md).
    np.asarray(run(noise, jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    host = np.asarray(run(noise, jax.random.PRNGKey(2)))
    dt = (time.perf_counter() - t0) / n_steps
    assert np.isfinite(host).all()
    return {
        "config": name, "B": B, "K": K,
        "ms_per_call": round(dt * 1000, 2),
        "frames_per_sec": round(B * K / dt, 1),
        "tflop_per_call": round(flops / 1e12, 3),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "sampler_1000step_s": round(dt * 1000, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    for name, spec in CONFIGS.items():
        if args.only and name != args.only:
            continue
        try:
            row = bench_one(name, spec["cfg"], spec["B"], spec["K"], args.steps)
        except Exception as e:  # one failing config must not kill the matrix
            row = {"config": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
