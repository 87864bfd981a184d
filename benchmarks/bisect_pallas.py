"""Bisect the full-forward cost of each fused kernel: times the flagship
U-Net forward with the Pallas temporal/spatial kernels toggled via
LFVDM_PALLAS_{TEMPORAL,SPATIAL} (read at trace time)."""

import _path  # noqa: F401  (repo root on sys.path)

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion, flagship_config


def main():
    cfg = flagship_config()
    model, _ = create_model_and_diffusion(cfg)
    B, K, C, H = 2, 20, 3, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, **kw)

    for temporal, spatial in [(1, 1), (1, 0), (0, 1), (0, 0)]:
        os.environ["LFVDM_PALLAS_TEMPORAL"] = str(temporal)
        os.environ["LFVDM_PALLAS_SPATIAL"] = str(spatial)
        fwd = jax.jit(lambda p, x, t: model.apply(p, x, t, **kw)[0])
        out = fwd(params, x, t)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(params, x, t)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"temporal={temporal} spatial={spatial}: {dt*1e3:8.2f} ms/fwd")


if __name__ == "__main__":
    main()
