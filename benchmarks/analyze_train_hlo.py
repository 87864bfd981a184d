"""Map hot device ops of the full TRAIN step (fwd+bwd+AdamW+EMA) back to
HLO instructions and U-Net modules — the training-side analyze_hlo.py.

The op_name metadata of backward ops keeps the forward module path inside
``transpose(...)`` wrappers, so aggregation by ``UNetVideoModel/<module>``
attributes both directions; a ``dir`` column splits fwd vs bwd by the
presence of the transpose marker.
"""

import _path  # noqa: F401  (repo root on sys.path)

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

    from trace_report import load_device_ops, parse_hlo_lines, print_attribution

    tot, _ = load_device_ops(TRACE_DIR)
    print_attribution(
        tot, parse_hlo_lines(hlo), REPS,
        # bwd ops carry the autodiff marker 'transpose(jvp(' in their op_name
        # metadata; bare 'transpose(' would also match ordinary forward HLO
        # transpose instructions ('%transpose.8 = ... transpose(...)').
        dir_marker=lambda line: "bwd" if ("transpose(jvp" in line or "vjp" in line) else "fwd")


if __name__ == "__main__":
    main()
