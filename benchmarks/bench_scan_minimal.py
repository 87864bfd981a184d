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

    from lfvdm_tpu.config import enable_compilation_cache

    from _sampler_common import FlagshipSetup

    enable_compilation_cache()
    setup = FlagshipSetup(B=2)
    cfg, diffusion = setup.cfg, setup.diffusion
    B, K, H = setup.B, setup.K, setup.H
    N_STEPS = min(args.steps, diffusion.num_timesteps)
    sampler_chunk = setup.make_scan(N_STEPS)

    noise = setup.noise
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
