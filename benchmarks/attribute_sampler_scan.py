"""Attribute per-op device time INSIDE the sampler scan body.

profile_sampler.py showed the production scan is 100% device-busy
(23.47 ms/step merged == wall over 1000 steps) while the standalone
forward attributes only ~21.2 ms — so ~2.3 ms/step of device work lives
in the p_sample wrapper (posterior math, threefry noise, mask composite)
or appears only once the forward is embedded in the scan. This script
compiles the SAME scan as bench.py/profile_sampler.py, traces it, and
maps each hot fusion back to its HLO line so the in-scan remainder is
itemized, not guessed.
"""

import _path  # noqa: F401  (repo root on sys.path)

import jax
import numpy as np

from lfvdm_tpu.config import enable_compilation_cache

from _sampler_common import FlagshipSetup

TRACE_DIR = "/tmp/lfvdm_trace_scan"
N_STEPS = 10  # short scan; per-step op mix identical to the 1000-step one


def main():
    enable_compilation_cache()
    setup = FlagshipSetup(B=2)
    noise = setup.noise
    key = jax.random.PRNGKey(1)
    compiled = jax.jit(setup.make_scan(N_STEPS)).lower(noise, key).compile()
    hlo = compiled.as_text()
    np.asarray(compiled(noise, key))  # fence (bench.py note re block_until_ready)

    with jax.profiler.trace(TRACE_DIR):
        out = compiled(noise, key)
        np.asarray(out)

    from trace_report import load_device_ops, parse_hlo_lines, print_attribution

    tot, _ = load_device_ops(TRACE_DIR)
    tot.pop("while.1", None)  # the scan span double-counts its children
    for name in list(tot):
        if name.startswith("while"):
            tot.pop(name)
    print_attribution(tot, parse_hlo_lines(hlo), reps=N_STEPS, top_ops=40)


if __name__ == "__main__":
    main()
