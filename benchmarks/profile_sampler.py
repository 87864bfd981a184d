"""Profile the full sampler scan: device-busy time vs wall time per step.

The forward alone measures ~26.6 ms device time (analyze_hlo.py) while the
sampler step measures ~32.5 ms wall (bench.py) — this script attributes the
gap: per-step device busy time, top non-UNet ops in the scan body (sampler
math, rng), and idle time (dispatch/serialization).
"""

import _path  # noqa: F401  (repo root on sys.path)

import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion, flagship_config

TRACE_DIR = "/tmp/lfvdm_trace_sampler"
N_STEPS = 10


def main():
    cfg = flagship_config()
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = 2, 20, 3, 128
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs
    model_kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((B,), jnp.int32), **model_kwargs)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    def sampler_chunk(noise, rng_key):
        def step(carry, s):
            img, key = carry
            key, sub = jax.random.split(key)
            t_b = jnp.full((B,), s, jnp.int32)
            out = diffusion.p_sample(model_fn, img, t_b, sub, model_kwargs=model_kwargs)
            return (out["sample"], key), None

        steps = jnp.arange(N_STEPS - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
        return img

    run = jax.jit(sampler_chunk)
    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    key = jax.random.PRNGKey(1)
    run(noise, key).block_until_ready()

    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        out = run(noise, key)
        out.block_until_ready()
    wall = time.perf_counter() - t0

    from trace_report import load_device_ops, merged_busy_us

    tot, spans = load_device_ops(TRACE_DIR)
    busy_ms = sum(tot.values()) / 1000
    merged_ms = merged_busy_us(spans) / 1000

    print(f"wall: {wall*1000:.1f} ms for {N_STEPS} steps = {wall*1000/N_STEPS:.2f} ms/step")
    print(f"device op-time sum: {busy_ms:.1f} ms = {busy_ms/N_STEPS:.2f} ms/step")
    print(f"device busy (merged spans): {merged_ms:.1f} ms = {merged_ms/N_STEPS:.2f} ms/step")
    print(f"idle within trace: {(wall*1000 - merged_ms):.1f} ms total")

    print("\ntop 25 ops (ms per step):")
    for name, us in tot.most_common(25):
        print(f"  {us/1000/N_STEPS:7.3f}  {name}")


if __name__ == "__main__":
    main()
