"""Training-step throughput on the flagship CARLA pixel config.

Measures the full jitted train step (fwd + bwd + AdamW + EMA + nonfinite
check) in frames/sec/chip — the training-side counterpart of bench.py.

Usage: python benchmarks/bench_train.py [--profile]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import (
    create_model_and_diffusion,
    enable_compilation_cache,
    flagship_config,
)
from lfvdm_tpu.training.train_loop import init_train_state, make_optimizer, make_train_step

# Same fairness method (and the same constant + correction helper) as
# bench.py's sampler accounting: the reference publishes no training
# throughput (SURVEY.md §6), so the baseline is its eager-torch A100 regime
# at 35 TFLOP/s effective, applied to the REFERENCE op mix (our dilated
# upsample computes the same function with fewer MACs, so its XLA-measured
# FLOP delta is added back to the baseline numerator — x3 for the train
# step: forward, input-grad, weight-grad convs all carry the saving).
from bench import A100_EFFECTIVE_FLOPS, upsample_flop_correction


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--reps", type=int, default=30,
                    help="steps per timed chunk (throughput mode) or total "
                         "steps (blocking mode)")
    ap.add_argument("--chunks", type=int, default=4,
                    help="fenced chunks; best chunk is the estimate")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--blocking", action="store_true",
                    help="block + fetch metrics every step (latency mode)")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--use_checkpoint", action="store_true",
                    help="remat ResBlocks/attention (required to fit 256px on "
                         "16 GB v5e HBM)")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = dict(flagship_config(), image_size=args.image_size,
               use_checkpoint=args.use_checkpoint)
    model, diffusion = create_model_and_diffusion(cfg)
    # default = reference README.md:54-57 training shape (128px B2 K20)
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
    step_fn = jax.jit(make_train_step(model, diffusion, tx, ["0.9999"]),
                      donate_argnums=(0,))

    def fence(state):
        # np.asarray is a REAL device fetch; jax.block_until_ready has been
        # observed to return early on the tunneled runtime while a remote
        # compile/warmup is still in flight (same fix as bench.py).
        np.asarray(jax.tree.leaves(state["params"])[0])

    # Per-step FLOPs (fwd+bwd+AdamW+EMA, the whole compiled step) for the
    # baseline estimate; reference-op-mix correction via the upsample delta.
    # The AOT executable is ALSO the one the timing loop runs (calling the
    # wrapped step_fn again would recompile the whole step a second time).
    step_fn = step_fn.lower(state, batch, t, w, jax.random.PRNGKey(1)).compile()
    try:
        flops_per_step = float(step_fn.cost_analysis()["flops"])
    except Exception:
        flops_per_step = float("nan")
    delta_fwd, levels = upsample_flop_correction(B * K, H, cfg["num_channels"])
    ref_flops_per_step = flops_per_step + 3 * delta_fwd  # fwd + dgrad + wgrad

    key = jax.random.PRNGKey(1)
    state, _ = step_fn(state, batch, t, w, key)  # warmup
    fence(state)

    if args.profile:
        ctx = jax.profiler.trace("/tmp/lfvdm_train_trace")
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        if args.blocking:
            # Latency mode: block + fetch a scalar every step. On a remote
            # (tunneled) runtime this charges a full host round-trip per
            # step — NOT how TrainLoop runs (it defers metric fetches to the
            # log interval), but useful for worst-case latency.
            times = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                state, metrics = step_fn(state, batch, t, w, jax.random.fold_in(key, i))
                fence(state)
                float(metrics["weighted_loss"])
                times.append(time.perf_counter() - t0)
            if args.verbose:
                print("per-step:", [round(x, 3) for x in times])
            dt = sorted(times)[len(times) // 2]  # median
        else:
            # Throughput mode (production regime): dispatch steps
            # back-to-back — state donation chains them on device — and
            # fence per CHUNK, taking the best chunk. A single long timed
            # window absorbs the post-warmup stall the tunneled runtime
            # shows on the first executions after compile (measured round 4:
            # the interleaved A/B's first 30-step chunk ran 119 ms/step vs
            # 82.3 for every later chunk; one 40-step window over the same
            # executable averaged 107 ms/step — the ~1.1 s stall smeared
            # into the mean). Best-of-chunks is the same estimator bench.py
            # uses for the sampler (best-of-launches).
            chunk_ms = []
            for c in range(args.chunks):
                t0 = time.perf_counter()
                for i in range(args.reps):
                    state, metrics = step_fn(
                        state, batch, t, w,
                        jax.random.fold_in(key, c * args.reps + i))
                fence(state)
                chunk_ms.append((time.perf_counter() - t0) / args.reps)
            dt = min(chunk_ms)
            if args.verbose:
                print("per-chunk ms/step:", [round(x * 1e3, 2) for x in chunk_ms])

    baseline_sec_per_step = ref_flops_per_step / A100_EFFECTIVE_FLOPS
    vs_baseline = baseline_sec_per_step / dt if dt > 0 else 0.0
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(B * K / dt, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
        "sec_per_step": round(dt, 5),
        "flops_per_step": flops_per_step,
        "ref_flops_per_step": ref_flops_per_step,
        "flop_correction_levels": levels,
        "achieved_tflops": round(flops_per_step / dt / 1e12, 1),
        "device": str(jax.devices()[0]),
        "config": f"carla pixel {H}px ch{cfg['num_channels']} "
                  f"res{cfg['num_res_blocks']} K{K} B{B} bf16"
                  + (" remat" if args.use_checkpoint else ""),
    }))


if __name__ == "__main__":
    main()
