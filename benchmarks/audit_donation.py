"""Donation audit of the compiled train step (BASELINE.md train-step floor).

Every full-param buffer entering the jitted step (params, Adam mu/nu, each
EMA copy) should be DONATED and actually ALIASED by XLA to an output buffer
— otherwise the step pays an extra full-param HBM allocation + copy per
un-aliased tensor. This tool compiles the flagship train step exactly as
TrainLoop does (donate_argnums=(0,)) and reports:

  * total state bytes vs XLA's aliased output bytes,
  * the HLO ``input_output_alias`` entry count vs the number of state leaves,
  * any state-sized argument that did NOT get aliased (the audit's point).

Usage:  python benchmarks/audit_donation.py [--image_size 128] [--use_checkpoint]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--use_checkpoint", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="audit the CPU-compiled executable (structure only; "
                         "production aliasing decisions are the TPU ones)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from lfvdm_tpu.config import (
        create_model_and_diffusion,
        enable_compilation_cache,
        flagship_config,
    )
    from lfvdm_tpu.training.train_loop import (
        init_train_state, make_optimizer, make_train_step,
    )

    enable_compilation_cache()
    cfg = dict(flagship_config(), image_size=args.image_size,
               use_checkpoint=args.use_checkpoint)
    model, diffusion = create_model_and_diffusion(cfg)
    B, K, C, H = args.batch, args.frames, 3, args.image_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, K, C, H, H)), jnp.float32)
    fi = jnp.asarray(np.sort(rng.integers(0, 300, (B, K)), axis=1), jnp.int32)
    obs = jnp.zeros((B, K, 1, 1, 1), jnp.float32).at[:, : K // 3].set(1.0)
    batch = dict(x0=x0, frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    t = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    w = jnp.ones((B,), jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), x0=x0,
        frame_indices=fi, obs_mask=obs, latent_mask=1.0 - obs)
    tx = make_optimizer(1e-4, 0.0)
    state = jax.jit(lambda p: init_train_state(p, tx, ["0.9999"]))(params)
    step = jax.jit(make_train_step(model, diffusion, tx, ["0.9999"]),
                   donate_argnums=(0,))
    compiled = step.lower(state, batch, t, w, jax.random.PRNGKey(1)).compile()

    state_leaves = jax.tree.leaves(state)
    state_bytes = sum(l.size * l.dtype.itemsize for l in state_leaves)
    n_state_leaves = len(state_leaves)

    mem = compiled.memory_analysis()
    alias_bytes = getattr(mem, "alias_size_in_bytes", None)

    # HLO header: input_output_alias={ {out_idx}: (param, {idx}, KIND), ... }
    # Entries nest braces ({out_idx} / {param_idx}), so don't try to bracket
    # the block with a lazy regex (it stops at the first inner '}' and
    # under-counts to 1) — count the per-entry alias-kind markers instead.
    hlo = compiled.as_text()
    header = hlo.split("\n\n", 1)[0]
    n_aliases = len(re.findall(r"(?:may|must)-alias", header))

    # Which donated state leaves did NOT alias? Compare counts; if the
    # executable exposes per-parameter info, name the big ones.
    missing = max(0, n_state_leaves - n_aliases)
    verdict = "all state buffers aliased" if (
        alias_bytes is None or alias_bytes >= state_bytes
    ) and missing == 0 else (
        f"{missing} state leaves un-aliased"
        + (f"; alias {alias_bytes/1e6:.1f} MB < state {state_bytes/1e6:.1f} MB"
           if alias_bytes is not None and alias_bytes < state_bytes else "")
    )
    print(json.dumps({
        "metric": "train_step_donation_audit",
        "state_bytes_mb": round(state_bytes / 1e6, 1),
        "state_leaves": n_state_leaves,
        "hlo_alias_entries": n_aliases,
        "alias_bytes_mb": (round(alias_bytes / 1e6, 1)
                           if alias_bytes is not None else None),
        "temp_bytes_mb": round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1),
        "argument_bytes_mb": round(
            getattr(mem, "argument_size_in_bytes", 0) / 1e6, 1),
        "output_bytes_mb": round(
            getattr(mem, "output_size_in_bytes", 0) / 1e6, 1),
        "verdict": verdict,
        "device": str(jax.devices()[0]),
        "config": f"{H}px B{B} K{K} remat={args.use_checkpoint}",
    }))


if __name__ == "__main__":
    main()
