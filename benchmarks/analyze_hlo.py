"""Map hot device ops from a jax.profiler trace back to HLO instructions.

Compiles the flagship forward, traces a few runs, ranks individual device
ops by total time, and prints the matching HLO instruction line (shape +
operands) for each — attribution the aggregate view can't give.
"""

import _path  # noqa: F401  (repo root on sys.path)

import collections
import re

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion

TRACE_DIR = "/tmp/lfvdm_trace_hlo"


def main():
    cfg = dict(image_size=128, in_channels=3, num_channels=128, num_res_blocks=1,
               attention_resolutions="16,8", diffusion_steps=1000,
               compute_dtype="bfloat16")
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
    jax.block_until_ready(fwd(params, x, t))

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = fwd(params, x, t)
        jax.block_until_ready(out)

    # "XLA Ops"-track filter (via trace_report) so whole-program Steps/module
    # spans don't double-count into the totals.
    from trace_report import load_device_ops

    tot, _ = load_device_ops(TRACE_DIR)

    hlo_lines = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            hlo_lines[m.group(1)] = m.group(2)

    total_ms = sum(tot.values()) / 5 / 1000
    print(f"total device time: {total_ms:.2f} ms/fwd across {len(tot)} ops")

    # Aggregate by op category: how much is compute vs pure data movement.
    cats = collections.Counter()
    for name, us in tot.items():
        base = re.sub(r"[.\d]+$", "", name)
        cats[base] += us
    print(f"\n{'ms/fwd':>8}  {'%':>5}  category")
    for base, us in cats.most_common(20):
        print(f"{us/5/1000:8.2f}  {us/5/1000/total_ms*100:5.1f}  {base}")

    # Aggregate by U-Net module (the op_name metadata path), so per-layer
    # attribution survives fusion renaming across compiles.
    mods = collections.Counter()
    for name, us in tot.items():
        line = hlo_lines.get(name, "")
        m = re.search(r'UNetVideoModel/([^/"]+(?:/[^/"]+)?)', line)
        key = m.group(1) if m else "(unattributed)"
        mods[key] += us
    print(f"\n{'ms/fwd':>8}  {'%':>5}  module")
    for key, us in mods.most_common(40):
        print(f"{us/5/1000:8.2f}  {us/5/1000/total_ms*100:5.1f}  {key}")

    print(f"\n{'ms/fwd':>8}  op  ::  hlo")
    for name, us in tot.most_common(30):
        line = hlo_lines.get(name, "?")
        print(f"{us/5/1000:8.2f}  {name}\n          {line[:240]}")

    print("\n--- top-5 ops: full HLO lines ---")
    for name, us in tot.most_common(5):
        line = hlo_lines.get(name, "?")
        print(f"\n[{us/5/1000:.2f} ms] {name}\n{line}")


if __name__ == "__main__":
    main()
