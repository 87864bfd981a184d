"""Benchmark: U-Net sampler throughput on the flagship CARLA pixel config.

Prints ONE JSON line:
  {"metric": "unet_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R, ...}

Metric definition (BASELINE.md): frames processed per second per chip during
ancestral sampling — B*K frames per model call, timed over a jitted
`lax.scan` of reverse-diffusion steps (the real sampler hot loop, not a bare
forward). 1000-step sampler wall-clock is derived and reported alongside.

``vs_baseline``: the reference publishes no throughput numbers
(SURVEY.md §6), so the baseline is an estimate of the reference's eager
PyTorch sampler on A100: compiled per-call FLOPs (XLA cost analysis) divided
by an assumed 35 TFLOP/s effective A100 throughput (TF32 eager U-Net with
attention/groupnorm overheads). The BASELINE.json target is ≥5x that.
"""

import json
import time

import numpy as np

A100_EFFECTIVE_FLOPS = 35e12  # assumed eager-torch effective throughput

# Drift-robust headline protocol (BASELINE.md "Round 4"): every flagship
# launch is bracketed by a fixed CANARY executable (600 scanned 4096^2 bf16
# matmuls, compiled once) in the pattern C,F,C,F,...,C. The canary times
# measure the launch-hour environment itself (tunnel + host contention);
# rescaling each flagship launch by canary_nominal_s / mean(bracketing
# canaries) cancels the multiplicative part of the drift, making
# ``value_normalized`` comparable across rounds the way the interleaved A/B
# harness makes arms comparable within a run. CANARY_NOMINAL_S is pinned
# from the round-4 quiet-host calibration on the real v5e chip and must NOT
# be re-derived per run (that would define the drift away).
CANARY_STEPS = 600  # ~0.456 s nominal; robustness rests on the MEASURED 2.0%
                    # canary spread (8-rep calibration), not on duration
CANARY_DIM = 4096
# Pinned 2026-08-20 quiet-host calibration on the real v5e chip: 8 reps,
# mean 0.456 s, spread 2.0% (scalar-fetch form; the earlier full-matrix
# fetch showed 33% spread — all tunnel transfer noise).
CANARY_NOMINAL_S = 0.456


def make_canary():
    """Compile the fixed canary executable; returns a zero-arg timed runner."""
    import jax
    import jax.numpy as jnp

    def canary_body(a):
        def step(x, _):
            return jnp.tanh(x @ x) * 0.5, None

        out, _ = jax.lax.scan(step, a, None, length=CANARY_STEPS)
        # scalar result: fetching the full 32 MB matrix over the tunnel
        # would add 0.3-1 s of variable transfer time — the very noise the
        # canary exists to measure OUT of the flagship launches
        return jnp.float32(out.astype(jnp.float32).mean())

    a0 = jnp.full((CANARY_DIM, CANARY_DIM), 0.01, jnp.bfloat16)
    run = jax.jit(canary_body)
    lowered = run.lower(a0)
    compiled = lowered.compile()
    np.asarray(compiled(a0))  # warmup, fenced

    def timed():
        t0 = time.perf_counter()
        np.asarray(compiled(a0))
        return time.perf_counter() - t0

    return timed


def normalize_launches(launch_times, canary_times, nominal):
    """Rescale launch i by nominal / mean(canary[i], canary[i+1]).

    ``canary_times`` has len(launch_times)+1 entries (the C,F,C,...,C
    pattern). A launch bracketed by slow canaries (tunnel/host contention)
    is scaled DOWN toward what a quiet hour would have measured; the scaling
    is exact for multiplicative slowdowns, which is what the observed
    hour-scale drift looks like (identical executables, 23.5 vs 24.1 ms).
    """
    assert len(canary_times) == len(launch_times) + 1
    return [
        lt * nominal / ((canary_times[i] + canary_times[i + 1]) / 2)
        for i, lt in enumerate(launch_times)
    ]


def upsample_flop_correction(NT, H, num_channels, ch_mult=None):
    """XLA-measured FLOP delta (naive repeat+conv − dilated form) summed over
    every upsample level, plus the count of levels that yielded a delta.

    The baseline is the REFERENCE implementation's sampler, so its FLOP
    count must be the reference op mix: the transposed-conv Upsample
    (models/unet.py) computes the same function with fewer MACs, so this
    delta is added back to the baseline numerator to keep ``vs_baseline`` a
    fair same-function speedup ratio. The subgraphs come from the model
    module itself so the accounting cannot drift from what the model runs.
    """
    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import CHANNEL_MULT_BY_IMAGE_SIZE, flagship_config
    from lfvdm_tpu.models.unet import dilated_upsample_conv, naive_upsample_conv

    if ch_mult is None:
        # Same source as the flagship model itself (H may be a shrunken test
        # size; the LEVEL STRUCTURE must stay the flagship's).
        size = H if H in CHANNEL_MULT_BY_IMAGE_SIZE else flagship_config()["image_size"]
        ch_mult = CHANNEL_MULT_BY_IMAGE_SIZE[size]
    delta = 0.0
    levels = 0
    res = H // (2 ** (len(ch_mult) - 1))
    for level in range(len(ch_mult) - 1, 0, -1):
        c = num_channels * ch_mult[level]
        xs = jnp.zeros((NT, res, res, c), jnp.bfloat16)
        w3 = jnp.zeros((3, 3, c, c), jnp.bfloat16)
        try:
            fl_n = float(jax.jit(naive_upsample_conv).lower(xs, w3).compile()
                         .cost_analysis()["flops"])
            fl_d = float(jax.jit(dilated_upsample_conv).lower(xs, w3).compile()
                         .cost_analysis()["flops"])
            delta += fl_n - fl_d
            levels += 1
        except Exception:
            pass  # reported via flop_correction_levels in the JSON
        res *= 2
    return delta, levels


def main():
    import os

    import jax
    import jax.numpy as jnp

    from lfvdm_tpu.config import (
        create_model_and_diffusion,
        enable_compilation_cache,
        flagship_config,
    )

    # Persistent compile cache on by default (~/.cache/lfvdm_xla): the
    # flagship sampler scan takes minutes to compile over the tunnel;
    # relaunches should not.
    enable_compilation_cache()

    cfg = flagship_config()
    model, diffusion = create_model_and_diffusion(cfg)

    # K/H = released-checkpoint shape; B=2 = its training batch and the best
    # MEASURED single-launch throughput. Settled by a same-hour single-launch
    # A/B (B2 -> B4 -> B2 back-to-back): B2 1655 f/s (24.16 ms/call) vs
    # B4 1603 f/s (49.9 ms/call) - the 200-step-chunk sweep that suggested
    # B4 wins was a chunked-protocol artifact. The same A/B also showed a
    # concurrent host-CPU-heavy job depresses even a single-launch scan 40%
    # (1175 f/s), so benches must run alone. LFVDM_BENCH_B overrides.
    B = int(os.environ.get("LFVDM_BENCH_B", "2"))
    K, C, H = 20, cfg["in_channels"], cfg["image_size"]
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t, x0=x0,
                                 frame_indices=fi, obs_mask=obs, latent_mask=lat)

    def model_fn(x, ts, **kw):
        return model.apply(params, x, ts, **kw)[0]

    model_kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)

    # per-model-call FLOPs for the baseline estimate
    fwd = jax.jit(lambda x, ts: model_fn(x, ts, **model_kwargs))
    lowered = fwd.lower(x0, t)
    compiled = lowered.compile()
    try:
        flops_per_call = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_call = float("nan")

    delta, levels_corrected = upsample_flop_correction(
        B * K, H, cfg["num_channels"])
    ref_flops_per_call = flops_per_call + delta

    # timed sampler scan — the REAL production launch: the full 1000-step
    # reverse trajectory is ONE compiled lax.scan (one device launch), so
    # per-launch dispatch overhead is amortized over all 1000 steps exactly
    # as in scripts/video_sample.py. Timing shorter chunks (the old 50-step
    # bench) charged the launch overhead 20x more often than production
    # does and under-reported throughput by ~26%.
    N_STEPS = diffusion.num_timesteps  # 1000

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
    # np.asarray is a REAL fence; block_until_ready has been observed to
    # return while a remote compile is still in flight on tunneled runtimes,
    # leaking warmup execution into the timed region (one such run measured
    # 36.7 ms/step vs 26.8 fenced). The final fetch is ~8 MB — noise
    # relative to the ~26 s scan.
    np.asarray(run(noise, key))  # compile + warmup launch, fenced

    # Best of 5 launches, each bracketed by the fixed canary (C,F,C,F,...,C):
    # identical compiled executables have measured 24.2 vs 34.2 ms/step
    # across hours on the tunneled device (host/tunnel contention), so a
    # single sample can under-report the chip by 40%, and round-over-round
    # comparisons of even the best-of-N inherit the hour-scale drift. The
    # canary-normalized value is the cross-round comparator (BASELINE.md
    # "Round 4: drift-robust headline protocol"); the raw best-of-N keeps
    # the rounds 1-3 definition.
    canary = make_canary()
    N_LAUNCHES = 5
    canary_times = [canary()]
    launch_times = []
    for i in range(N_LAUNCHES):
        t0 = time.perf_counter()
        out = np.asarray(run(noise, jax.random.fold_in(key, 1 + i)))
        launch_times.append(time.perf_counter() - t0)
        assert np.isfinite(out).all()
        canary_times.append(canary())
    elapsed = min(launch_times)
    launch_spread = (max(launch_times) - min(launch_times)) / min(launch_times)

    # Normalize each flagship launch by its bracketing canaries; the best
    # normalized launch is the comparator. With no pinned nominal yet
    # (calibration round), fall back to this run's own mean so the field is
    # always populated and self-consistent.
    nominal = CANARY_NOMINAL_S or float(np.mean(canary_times))
    norm_launches = normalize_launches(launch_times, canary_times, nominal)
    # Guard (ADVICE r4): min() after rescaling can be inflated by one
    # anomalously slow canary (an ADDITIVE hiccup — e.g. a one-off tunnel
    # stall during a canary but not the adjacent flagship launch) scaling a
    # normal launch below its true quiet-hour time; the cancellation is only
    # exact for multiplicative drift that hits canary and flagship alike. So
    # a launch only qualifies for the min when its two bracketing canaries
    # AGREE (within 2x the 2.0% calibrated spread); the median of all
    # normalized launches is reported alongside as the hiccup-robust summary.
    agreeing = [
        nl for i, nl in enumerate(norm_launches)
        if abs(canary_times[i] - canary_times[i + 1])
        / min(canary_times[i], canary_times[i + 1]) <= 0.04
    ]
    elapsed_norm = min(agreeing) if agreeing else float(np.median(norm_launches))
    sec_per_call_norm = elapsed_norm / N_STEPS
    sec_per_call_norm_median = float(np.median(norm_launches)) / N_STEPS

    sec_per_call = elapsed / N_STEPS
    frames_per_sec = B * K / sec_per_call
    sampler_1000_wallclock = sec_per_call * 1000

    baseline_sec_per_call = ref_flops_per_call / A100_EFFECTIVE_FLOPS
    baseline_frames_per_sec = B * K / baseline_sec_per_call if flops_per_call > 0 else float("nan")
    vs_baseline = frames_per_sec / baseline_frames_per_sec if baseline_frames_per_sec > 0 else 0.0

    achieved_tflops = flops_per_call / sec_per_call / 1e12

    # Auxiliary: the DPM-Solver++(2M) fast path (same model/params) — a full
    # window in 20 model calls instead of 1000. Guarded: the primary metric
    # above never depends on this succeeding.
    dpm_keys = {}
    try:
        from lfvdm_tpu.diffusion.dpm_solver import dpm_solver_pp_sample_loop

        dpm_diff = create_model_and_diffusion(
            {**cfg, "timestep_respacing": "dpm20"})[1]
        run_dpm = jax.jit(lambda k: dpm_solver_pp_sample_loop(
            dpm_diff, model_fn, (B, K, C, H, H), k, model_kwargs=model_kwargs))
        kd = jax.random.PRNGKey(2)
        np.asarray(run_dpm(kd))  # compile + warmup, fenced
        dpm_times = []
        for i in range(3):
            t0 = time.perf_counter()
            out_dpm = np.asarray(run_dpm(jax.random.fold_in(kd, 1 + i)))
            dpm_times.append(time.perf_counter() - t0)
            assert np.isfinite(out_dpm).all()
        dpm_elapsed = min(dpm_times)
        dpm_keys = {
            "dpm20_window_wallclock_s": round(dpm_elapsed, 3),
            "dpm20_speedup_vs_1000step": round(
                sampler_1000_wallclock / dpm_elapsed, 1),
        }
    except Exception as e:  # aux metric only — report the failure, keep going
        dpm_keys = {"dpm20_window_wallclock_s": None, "dpm20_error": repr(e)[:200]}

    print(json.dumps({
        "metric": "unet_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 3),
        "sampler_1000step_wallclock_s": round(sampler_1000_wallclock, 2),
        "sec_per_model_call": round(sec_per_call, 5),
        "launch_times_s": [round(t, 2) for t in launch_times],
        "launch_spread": round(launch_spread, 4),
        "canary_times_s": [round(t, 3) for t in canary_times],
        "canary_nominal_s": round(nominal, 3),
        "canary_nominal_source": "pinned" if CANARY_NOMINAL_S else "self",
        # cross-round comparator: flagship launch rescaled by the bracketing
        # canaries (cancels multiplicative tunnel/host drift)
        "value_normalized": round(B * K / sec_per_call_norm, 2),
        "sec_per_model_call_normalized": round(sec_per_call_norm, 5),
        # hiccup-robust companion: median over all normalized launches (the
        # min above already excludes launches whose bracketing canaries
        # disagree by >4%, i.e. additive one-off stalls)
        "value_normalized_median": round(B * K / sec_per_call_norm_median, 2),
        "flops_per_call": flops_per_call,
        "ref_flops_per_call": ref_flops_per_call,
        # 4 expected; fewer means some level's FLOP delta silently failed
        # and vs_baseline under-credits the dilated-upsample saving
        "flop_correction_levels": levels_corrected,
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(achieved_tflops / 197.0, 3),
        **dpm_keys,
        "device": str(jax.devices()[0]),
        "config": f"carla pixel 128px ch128 res1 K20 B{B} bf16",
        "note": "B=2 default (best measured single-launch; see bench.py comment "
                "re the B=4 sweep-vs-single-launch discrepancy); ceiling analysis in BASELINE.md",
    }))


if __name__ == "__main__":
    main()
