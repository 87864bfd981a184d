"""Attribute per-op device time INSIDE the sampler scan body.

profile_sampler.py showed the production scan is 100% device-busy
(23.47 ms/step merged == wall over 1000 steps) while the standalone
forward attributes only ~21.2 ms — so ~2.3 ms/step of device work lives
in the p_sample wrapper (posterior math, threefry noise, mask composite)
or appears only once the forward is embedded in the scan. This script
compiles the SAME scan as bench.py/profile_sampler.py, traces it, and
maps each hot fusion back to its HLO line so the in-scan remainder is
itemized, not guessed.
"""

import _path  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import (
    create_model_and_diffusion,
    enable_compilation_cache,
    flagship_config,
)

TRACE_DIR = "/tmp/lfvdm_trace_scan"
N_STEPS = 10  # short scan; per-step op mix identical to the 1000-step one


def main():
    enable_compilation_cache()
    cfg = flagship_config()
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = 2, 20, cfg["in_channels"], cfg["image_size"]
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
            out = diffusion.p_sample(model_fn, img, t_b, sub,
                                     model_kwargs=model_kwargs)
            return (out["sample"], key), None

        steps = jnp.arange(N_STEPS - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
        return img

    noise = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    key = jax.random.PRNGKey(1)
    compiled = jax.jit(sampler_chunk).lower(noise, key).compile()
    hlo = compiled.as_text()
    np.asarray(compiled(noise, key))  # fence (bench.py note re block_until_ready)

    with jax.profiler.trace(TRACE_DIR):
        out = compiled(noise, key)
        np.asarray(out)

    from trace_report import load_device_ops, parse_hlo_lines, print_attribution

    tot, _ = load_device_ops(TRACE_DIR)
    tot.pop("while.1", None)  # the scan span double-counts its children
    for name in list(tot):
        if name.startswith("while"):
            tot.pop(name)
    print_attribution(tot, parse_hlo_lines(hlo), reps=N_STEPS, top_ops=40)


if __name__ == "__main__":
    main()
