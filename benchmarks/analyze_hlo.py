"""Map hot device ops from a jax.profiler trace back to HLO instructions.

Compiles the flagship forward, traces a few runs, ranks individual device
ops by total time, and prints the matching HLO instruction line (shape +
operands) for each — attribution the aggregate view can't give.
"""

import _path  # noqa: F401  (repo root on sys.path)

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion, flagship_config

TRACE_DIR = "/tmp/lfvdm_trace_hlo"


def main():
    cfg = flagship_config()
    model, _ = create_model_and_diffusion(cfg)
    B, K, C, H = 2, 20, 3, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    fi = jnp.asarray(np.tile(np.arange(K)[None], (B, 1)), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 2].set(1.0)
    lat = 1.0 - obs
    kw = dict(x0=x, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, **kw)
    fwd = jax.jit(lambda p, x, t: model.apply(p, x, t, **kw)[0])
    compiled = fwd.lower(params, x, t).compile()
    hlo = compiled.as_text()
    np.asarray(fwd(params, x, t))  # real fence (see bench.py note)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = fwd(params, x, t)
        np.asarray(out)

    # "XLA Ops"-track filter (via trace_report) so whole-program Steps/module
    # spans don't double-count into the totals.
    from trace_report import load_device_ops, parse_hlo_lines, print_attribution

    tot, _ = load_device_ops(TRACE_DIR)
    print_attribution(tot, parse_hlo_lines(hlo), reps=5, top_ops=30)


if __name__ == "__main__":
    main()
