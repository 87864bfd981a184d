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

    from _sampler_common import FlagshipSetup

    setup = FlagshipSetup(B=B, cfg=cfg)
    K = setup.K
    run = jax.jit(setup.make_scan(n_steps))
    noise = setup.noise
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

    from lfvdm_tpu.config import flagship_config

    cfg = flagship_config()
    for B in [int(b) for b in args.batches.split(",")]:
        res = run_one(B, args.steps, cfg)
        res["device"] = str(jax.devices()[0])
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
