"""Minimal flagship-sampler scan timer for XLA-flag sweeps.

XLA flags are process-global (read at backend init), so unlike the
trace-time env flags ab_envflag.py interleaves, each XLA-flag config needs
its own process:

    XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
        python benchmarks/bench_scan_minimal.py --tag vmem64m

Prints one JSON line: best/all of N timed 1000-step scan launches.
Separate launches drift +-0.5-1 ms on the tunneled runtime (BASELINE.md);
only effects well above that band are conclusions.
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="default")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steps", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import (
        create_model_and_diffusion,
        enable_compilation_cache,
        flagship_config,
    )

    enable_compilation_cache()
    cfg = flagship_config()
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = 2, 20, cfg["in_channels"], cfg["image_size"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    model_kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((B,), jnp.int32), **model_kwargs)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    N_STEPS = min(args.steps, diffusion.num_timesteps)

    def sampler_chunk(noise, rng_key):
        def step(carry, s):
            img, key = carry
            key, sub = jax.random.split(key)
            t_b = jnp.full((B,), s, jnp.int32)
            out = diffusion.p_sample(model_fn, img, t_b, sub,
                                     model_kwargs=model_kwargs)
            return (out["sample"], key), None

        steps = jnp.arange(N_STEPS - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
        return img

    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    key = jax.random.PRNGKey(1)
    compiled = jax.jit(sampler_chunk).lower(noise, key).compile()
    np.asarray(compiled(noise, key))  # fenced warmup

    ms = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        out = np.asarray(compiled(noise, jax.random.fold_in(key, 1 + i)))
        ms.append(round((time.perf_counter() - t0) / N_STEPS * 1e3, 3))
        assert np.isfinite(out).all()

    print(json.dumps({
        "metric": "scan_ms_per_call",
        "tag": args.tag,
        "ms_per_call": ms,
        "best": min(ms),
        "device": str(jax.devices()[0]),
        "config": f"carla pixel {H}px ch{cfg['num_channels']} K{K} B{B} bf16 "
                  f"{N_STEPS}-step scan",
    }))


if __name__ == "__main__":
    main()
