"""Forward timing of the 256px model (carla_no_traffic_2x scale).

At 256px the attention feature maps are 32²=1024 sites wide, which crosses
the measured auto-enable threshold for the fused Pallas temporal-RPE kernel
(lfvdm_tpu/ops/attention.py) — this bench exercises that path in the full
model and reports ms/forward with the kernels on vs off.
"""

import _path  # noqa: F401  (repo root on sys.path)

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion


def run(B=1, K=10):
    cfg = dict(image_size=256, in_channels=3, num_channels=128, num_res_blocks=1,
               attention_resolutions="16,8", diffusion_steps=1000,
               compute_dtype="bfloat16")
    model, _ = create_model_and_diffusion(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, 3, 256, 256)), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, **kw)

    # The kernel policy keys on LFVDM_PALLAS_{TEMPORAL,SPATIAL} (rpe.py);
    # measure einsum, spatial-kernel-only, and both-kernels explicitly.
    results = {}
    variants = [
        ("einsum", {"LFVDM_PALLAS_SPATIAL": "0", "LFVDM_PALLAS_TEMPORAL": "0"}),
        ("pallas_spatial", {"LFVDM_PALLAS_SPATIAL": "1", "LFVDM_PALLAS_TEMPORAL": "0"}),
        ("pallas_both", {"LFVDM_PALLAS_SPATIAL": "1", "LFVDM_PALLAS_TEMPORAL": "1"}),
    ]
    for label, env in variants:
        os.environ.update(env)
        fwd = jax.jit(lambda p, x, t: model.apply(p, x, t, **kw)[0])
        np.asarray(fwd(params, x, t))  # compile + warmup, fenced
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fwd(params, x, t))
            times.append(time.perf_counter() - t0)
        results[label] = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "unet256_ms_per_forward",
        **{f"{k}_ms": round(v * 1e3, 2) for k, v in results.items()},
        "spatial_speedup": round(results["einsum"] / results["pallas_spatial"], 3),
        "both_speedup": round(results["einsum"] / results["pallas_both"], 3),
        "config": f"256px ch128 res1 K{K} B{B} bf16",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    run()
