"""Same-launch interleaved A/B of a trace-time env flag on the TRAIN step.

Sampler-side A/Bs (ab_envflag.py) measured split-uppath & co. wall-neutral:
XLA overlaps the deleted memory-bound ops with the conv critical path. The
train step is a different pipeline — the backward pass adds transpose-heavy
weight-grad convs and the optimizer+EMA tail is pure HBM traffic — so flags
that are neutral in the sampler could win (or lose) here. Same methodology:
AOT-compile BOTH arms in one process, interleave timed pipelined chunks
OFF,ON,OFF,ON so tunnel drift cancels.

Usage (TPU, quiet host):
    python benchmarks/ab_train_envflag.py LFVDM_SPLIT_UPPATH [--pairs 3]
    python benchmarks/ab_train_envflag.py LFVDM_SPLIT_UPPATH --use_checkpoint \
        --image_size 256  # the remat regime where memory wins could surface
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("flag", help="env var read at trace time")
    ap.add_argument("--on", default="1")
    ap.add_argument("--off", default="0")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--reps", type=int, default=30,
                    help="pipelined steps per timed chunk")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--use_checkpoint", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import (
        create_model_and_diffusion,
        enable_compilation_cache,
        flagship_config,
    )
    from lfvdm_tpu.training.train_loop import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    enable_compilation_cache()
    cfg = dict(flagship_config(), image_size=args.image_size,
               use_checkpoint=args.use_checkpoint)
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = args.batch, args.frames, 3, args.image_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.sort(rng.integers(0, 300, (B, K)), axis=1), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 3].set(1.0)
    batch = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    t = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    w = jnp.ones((B,), jnp.float32)

    os.environ[args.flag] = args.off
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), x0=x0,
        frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    tx = make_optimizer(1e-4, 0.0)

    def fence(state):
        np.asarray(jax.tree.leaves(state["params"])[0])  # real device fetch

    key = jax.random.PRNGKey(1)
    compiled, states = {}, {}
    for name, value in (("off", args.off), ("on", args.on)):
        os.environ[args.flag] = value  # read at trace time
        # one donated state chain per arm (same initial params)
        states[name] = jax.jit(lambda p: init_train_state(p, tx, ["0.9999"]))(params)
        fn = jax.jit(make_train_step(model, diffusion, tx, ["0.9999"]),
                     donate_argnums=(0,))
        compiled[name] = fn.lower(states[name], batch, t, w, key).compile()
        states[name], _ = compiled[name](states[name], batch, t, w, key)
        fence(states[name])  # fenced warmup

    times = {"off": [], "on": []}
    for i in range(args.pairs):
        for name in ("off", "on"):
            t0 = time.perf_counter()
            for r in range(args.reps):
                states[name], _ = compiled[name](
                    states[name], batch, t, w, jax.random.fold_in(key, i * args.reps + r))
            fence(states[name])
            times[name].append((time.perf_counter() - t0) / args.reps)

    ms = {k: [round(v * 1e3, 2) for v in ts] for k, ts in times.items()}
    best = {k: min(v) for k, v in ms.items()}
    print(json.dumps({
        "metric": f"{args.flag.lower()}_train_ab_ms_per_step",
        "off_ms_per_step": ms["off"],
        "on_ms_per_step": ms["on"],
        "best_off": best["off"],
        "best_on": best["on"],
        "pair_delta_off_minus_on_ms": [round(a - b, 2)
                                       for a, b in zip(ms["off"], ms["on"])],
        "winner": "on" if best["on"] < best["off"] else "off",
        "device": str(jax.devices()[0]),
        "config": f"train {H}px ch{cfg['num_channels']} K{K} B{B} bf16 "
                  f"remat={args.use_checkpoint}, {args.reps}-step pipelined "
                  "chunks, interleaved",
    }))


if __name__ == "__main__":
    main()
