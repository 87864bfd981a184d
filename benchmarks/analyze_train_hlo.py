"""Map hot device ops of the full TRAIN step (fwd+bwd+AdamW+EMA) back to
HLO instructions and U-Net modules — the training-side analyze_hlo.py.

The op_name metadata of backward ops keeps the forward module path inside
``transpose(...)`` wrappers, so aggregation by ``UNetVideoModel/<module>``
attributes both directions; a ``dir`` column splits fwd vs bwd by the
presence of the transpose marker.
"""

import _path  # noqa: F401  (repo root on sys.path)

import collections
import re

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.training.train_loop import (init_train_state, make_optimizer,
                                           make_train_step)

TRACE_DIR = "/tmp/lfvdm_train_trace_hlo"
REPS = 5


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--use_checkpoint", action="store_true")
    args = ap.parse_args()
    cfg = dict(image_size=args.image_size, in_channels=3, num_channels=128,
               num_res_blocks=1, attention_resolutions="16,8",
               diffusion_steps=1000, compute_dtype="bfloat16",
               use_checkpoint=args.use_checkpoint)
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = args.batch, args.frames, 3, args.image_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.sort(rng.integers(0, 300, (B, K)), axis=1), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 3].set(1.0)
    lat = 1.0 - obs
    batch = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=lat)
    t = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    w = jnp.ones((B,), jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), x0=x0,
        frame_indices=fi, obs_mask=obs, latent_mask=lat)
    tx = make_optimizer(1e-4, 0.0)
    state = jax.jit(lambda p: init_train_state(p, tx, ["0.9999"]))(params)
    step = make_train_step(model, diffusion, tx, ["0.9999"])
    step_j = jax.jit(step)  # no donation: we re-feed the same state each rep

    key = jax.random.PRNGKey(1)
    lowered = step_j.lower(state, batch, t, w, key)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out = step_j(state, batch, t, w, key)
    np.asarray(jax.tree.leaves(out[0]["params"])[0])  # real fence

    with jax.profiler.trace(TRACE_DIR):
        for i in range(REPS):
            out = step_j(state, batch, t, w, jax.random.fold_in(key, i))
        np.asarray(jax.tree.leaves(out[0]["params"])[0])

    from trace_report import load_device_ops

    tot, _ = load_device_ops(TRACE_DIR)

    hlo_lines = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            hlo_lines[m.group(1)] = m.group(2)

    total_ms = sum(tot.values()) / REPS / 1000
    print(f"total device time: {total_ms:.2f} ms/step across {len(tot)} ops")

    cats = collections.Counter()
    for name, us in tot.items():
        cats[re.sub(r"[.\d]+$", "", name)] += us
    print(f"\n{'ms/step':>8}  {'%':>5}  category")
    for base, us in cats.most_common(15):
        print(f"{us/REPS/1000:8.2f}  {us/REPS/1000/total_ms*100:5.1f}  {base}")

    mods = collections.Counter()
    for name, us in tot.items():
        line = hlo_lines.get(name, "")
        m = re.search(r'UNetVideoModel/([^/"]+(?:/[^/"]+)?)', line)
        key_ = m.group(1) if m else "(unattributed)"
        is_bwd = "transpose(" in line or "vjp" in line
        mods[(key_, "bwd" if is_bwd else "fwd")] += us
    print(f"\n{'ms/step':>8}  {'%':>5}  dir  module")
    for (key_, d), us in mods.most_common(50):
        print(f"{us/REPS/1000:8.2f}  {us/REPS/1000/total_ms*100:5.1f}  {d}  {key_}")

    print(f"\n{'ms/step':>8}  op  ::  hlo")
    for name, us in tot.most_common(25):
        line = hlo_lines.get(name, "?")
        print(f"{us/REPS/1000:8.2f}  {name}\n          {line[:240]}")


if __name__ == "__main__":
    main()
