"""Profile the full sampler scan: device-busy time vs wall time per step.

The forward alone measures ~26.6 ms device time (analyze_hlo.py) while the
sampler step measures ~32.5 ms wall (bench.py) — this script attributes the
gap: per-step device busy time, top non-UNet ops in the scan body (sampler
math, rng), and idle time (dispatch/serialization).
"""

import _path  # noqa: F401  (repo root on sys.path)

import time

import jax
import numpy as np

from _sampler_common import FlagshipSetup

TRACE_DIR = "/tmp/lfvdm_trace_sampler"
N_STEPS = 10


def main():
    setup = FlagshipSetup(B=2)
    run = jax.jit(setup.make_scan(N_STEPS))
    noise = setup.noise
    key = jax.random.PRNGKey(1)
    run(noise, key).block_until_ready()

    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        out = run(noise, key)
        out.block_until_ready()
    wall = time.perf_counter() - t0

    from trace_report import load_device_ops, merged_busy_us

    tot, spans = load_device_ops(TRACE_DIR)
    busy_ms = sum(tot.values()) / 1000
    merged_ms = merged_busy_us(spans) / 1000

    print(f"wall: {wall*1000:.1f} ms for {N_STEPS} steps = {wall*1000/N_STEPS:.2f} ms/step")
    print(f"device op-time sum: {busy_ms:.1f} ms = {busy_ms/N_STEPS:.2f} ms/step")
    print(f"device busy (merged spans): {merged_ms:.1f} ms = {merged_ms/N_STEPS:.2f} ms/step")
    print(f"idle within trace: {(wall*1000 - merged_ms):.1f} ms total")

    print("\ntop 25 ops (ms per step):")
    for name, us in tot.most_common(25):
        print(f"  {us/1000/N_STEPS:7.3f}  {name}")


if __name__ == "__main__":
    main()
