"""Same-launch interleaved A/B of any trace-time env flag on the flagship sampler.

Generalizes ab_split_uppath.py: separate bench.py launches on the tunneled
runtime drift by ±0.5-1 ms (more under host contention), larger than most
single-optimization effects. This harness AOT-compiles BOTH variants of a
trace-time flag in ONE process, then interleaves timed full-N-step scan
launches OFF,ON,OFF,ON,... so slow drift hits both arms equally.

Usage (TPU, quiet host):
    python benchmarks/ab_envflag.py LFVDM_SPLIT_UPPATH [--pairs 3]
    python benchmarks/ab_envflag.py LFVDM_PALLAS_TEMPORAL --on 1 --off 0
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
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--check_parity", action="store_true",
                    help="assert the two variants agree numerically (rtol 2e-2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import enable_compilation_cache

    from _sampler_common import FlagshipSetup

    enable_compilation_cache()
    # param tree must be variant-independent (flags may only change the
    # compute graph, not parameters) — init once under OFF and share.
    os.environ[args.flag] = args.off
    setup = FlagshipSetup(B=2)
    cfg, diffusion = setup.cfg, setup.diffusion
    B, K, H = setup.B, setup.K, setup.H
    model_kwargs, model_fn = setup.model_kwargs, setup.model_fn

    N_STEPS = min(args.steps, diffusion.num_timesteps)

    def sampler_chunk(noise, seed):
        # Key built in-trace so LFVDM_RNG_IMPL (threefry / rbg / unsafe_rbg)
        # is itself A/B-able: the typed key's impl propagates through every
        # split/normal in the scan.
        impl = os.environ.get("LFVDM_RNG_IMPL", "threefry2x32")
        rng_key = jax.random.key(seed, impl=impl)

        def step(carry, s):
            img, key = carry
            key, sub = jax.random.split(key)
            t_b = jnp.full((B,), s, jnp.int32)
            # Diagnostic arm (NOT a sampler): delete the entire p_sample
            # wrapper (posterior math, clip, noise gen, ancestral update)
            # and keep only the model call + a minimal combine. Used to
            # test whether per-op device-time attribution is additive
            # wall-clock on this chip.
            if os.environ.get("LFVDM_AB_NOWRAPPER", "0") == "1":
                raw = diffusion.call_model(model_fn, img, t_b, model_kwargs)
                nxt = img - 0.01 * raw[..., : img.shape[-3], :, :]
                return (nxt, key), None
            out = diffusion.p_sample(model_fn, img, t_b, sub,
                                     model_kwargs=model_kwargs)
            return (out["sample"], key), None

        steps = jnp.arange(N_STEPS - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
        return img

    noise = setup.noise
    seed = jnp.asarray(1, jnp.uint32)

    compiled, warm = {}, {}
    for name, value in (("off", args.off), ("on", args.on)):
        os.environ[args.flag] = value  # read at trace time
        compiled[name] = jax.jit(sampler_chunk).lower(noise, seed).compile()
        warm[name] = np.asarray(compiled[name](noise, seed))  # fenced warmup

    if args.check_parity:
        err = float(np.max(np.abs(warm["on"] - warm["off"])))
        assert np.allclose(warm["on"], warm["off"], rtol=2e-2, atol=2e-2), err
        print(f"parity ok: max abs diff {err:.2e}")

    times = {"off": [], "on": []}
    for i in range(args.pairs):
        for name in ("off", "on"):
            t0 = time.perf_counter()
            out = np.asarray(compiled[name](noise, jnp.asarray(1 + i, jnp.uint32)))
            times[name].append(time.perf_counter() - t0)
            assert np.isfinite(out).all()

    ms = {k: [round(v / N_STEPS * 1e3, 3) for v in ts] for k, ts in times.items()}
    best = {k: min(v) for k, v in ms.items()}
    pair_delta_ms = [round(a - b, 3) for a, b in zip(ms["off"], ms["on"])]
    print(json.dumps({
        "metric": f"{args.flag.lower()}_ab_ms_per_call",
        "off_ms_per_call": ms["off"],
        "on_ms_per_call": ms["on"],
        "best_off": best["off"],
        "best_on": best["on"],
        "pair_delta_off_minus_on_ms": pair_delta_ms,
        "winner": "on" if best["on"] < best["off"] else "off",
        "device": str(jax.devices()[0]),
        "config": f"carla pixel {H}px ch{cfg['num_channels']} K{K} B{B} bf16 "
                  f"{N_STEPS}-step scan, interleaved",
    }))


if __name__ == "__main__":
    main()
