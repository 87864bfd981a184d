"""Capture a device trace of the flagship forward and print the op-level
self-time breakdown (top HLO ops by exclusive time).

Uses jax.profiler to write an xplane trace, then parses it with
tensorboard_plugin_profile to rank ops — no TensorBoard UI needed.

Usage: python benchmarks/profile_forward.py [--steps 10] [--out /tmp/lfvdm_trace]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion, flagship_config


def capture(out_dir: str, steps: int):
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
    jax.block_until_ready(fwd(params, x, t))  # compile outside the trace

    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            out = fwd(params, x, t)
        jax.block_until_ready(out)
    print("trace written to", out_dir)


def report(out_dir: str, top: int = 25):
    xplanes = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        print("no xplane found under", out_dir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats^",
                                      {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    print(data[:8000])


def report_trace_events(out_dir: str, top: int = 30):
    """Fallback: rank ops from the trace.json.gz event stream."""
    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        print("no trace.json.gz found")
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep device-lane events only (XLA ops have args.name / long names)
    totals = {}
    for e in events:
        name = e.get("name", "")
        totals[name] = totals.get(name, 0) + e["dur"]
    total = sum(totals.values())
    print(f"{'us_total':>12}  {'%':>6}  op")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us:12.0f}  {100 * us / total:6.2f}  {name[:110]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/lfvdm_trace")
    ap.add_argument("--skip-capture", action="store_true")
    args = ap.parse_args()
    if not args.skip_capture:
        capture(args.out, args.steps)
    try:
        report(args.out)
    except Exception as e:  # tool-data converter is version-sensitive
        print("framework_op_stats failed:", e)
        report_trace_events(args.out)
