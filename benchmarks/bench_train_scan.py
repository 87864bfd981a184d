"""Train-step device throughput via an on-device multi-step scan.

bench_train.py launches the jitted step once per step from the host —
exactly how TrainLoop runs (data arrives from the host every step). This
harness instead scans N train steps inside ONE launch (same batch every
step, rng folded per index), which removes every per-launch cost (tunnel
round-trips, dispatch, donation bookkeeping) from the measurement:

  * scan sec/step  == pure device time of the compiled step body;
  * bench_train.py sec/step - scan sec/step == per-launch overhead the
    host-driven loop pays on this runtime.

The sampler bench (bench.py) already measures inside a 1000-step scan, so
this is the symmetric train-side measurement: comparing the two decides
whether the train step's lower vs_baseline is backward-pass inefficiency
(device-real) or launch overhead (bench artifact / production pipelining
headroom to harvest via multi-step launches).

Usage: python benchmarks/bench_train_scan.py [--steps 30] [--reps 3]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import (
    apply_platform_env,
    create_model_and_diffusion,
    enable_compilation_cache,
    flagship_config,
)
from lfvdm_tpu.training.train_loop import init_train_state, make_optimizer, make_train_step

apply_platform_env()  # honor $LFVDM_PLATFORM=cpu like the CLI scripts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30, help="scan length per launch")
    ap.add_argument("--reps", type=int, default=3, help="timed launches (best taken)")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = dict(flagship_config(), image_size=args.image_size)
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = args.batch, args.frames, 3, args.image_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.sort(rng.integers(0, 300, (B, K)), axis=1), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 3].set(1.0)
    lat = 1.0 - obs
    batch = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    t = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    w = jnp.ones((B,), jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), x0=x0,
        frame_indices=fi, obs_mask=obs, latent_mask=lat,
    )
    tx = make_optimizer(1e-4, 0.0)
    state = jax.jit(lambda p: init_train_state(p, tx, ["0.9999"]))(params)
    step = make_train_step(model, diffusion, tx, ["0.9999"])

    def multi_step(state, key):
        def body(st, i):
            new_st, metrics = step(st, batch, t, w, jax.random.fold_in(key, i))
            return new_st, metrics["weighted_loss"]

        return jax.lax.scan(body, state, jnp.arange(args.steps))

    fn = jax.jit(multi_step, donate_argnums=(0,))
    fn = fn.lower(state, jax.random.PRNGKey(1)).compile()

    def fence(st):
        np.asarray(jax.tree.leaves(st["params"])[0])  # real device fetch

    state, losses = fn(state, jax.random.PRNGKey(1))  # warmup launch
    fence(state)

    best = float("inf")
    for i in range(args.reps):
        t0 = time.perf_counter()
        state, losses = fn(state, jax.random.fold_in(jax.random.PRNGKey(2), i))
        fence(state)
        best = min(best, (time.perf_counter() - t0) / args.steps)

    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip_scan",
        "value": round(B * K / best, 2),
        "unit": "frames/s",
        "sec_per_step_device": round(best, 5),
        "scan_steps": args.steps,
        "device": str(jax.devices()[0]),
        "config": f"carla pixel {H}px ch{cfg['num_channels']} "
                  f"res{cfg['num_res_blocks']} K{K} B{B} bf16 scan",
    }))


if __name__ == "__main__":
    main()
