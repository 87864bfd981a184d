"""Export sampleable params (EMA or raw) from a training checkpoint.

Writes ``<ckpt_dir>/export/params_{rate}_{step}.msgpack`` + the embedded
config, so `video_sample.py` can load a single self-describing file — the
orbax training state itself stays the source of truth for resume.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from lfvdm_tpu.config import create_model_and_diffusion
from lfvdm_tpu.training import checkpoint as ckpt_lib
from lfvdm_tpu.training.train_loop import init_train_state, make_optimizer


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt_dir", type=str)
    parser.add_argument("--step", type=int, default=None)
    parser.add_argument("--ema_rate", type=str, default="0.9999",
                        help="EMA rate to export, or 'raw' for the live params")
    args = parser.parse_args()

    config = ckpt_lib.load_config(args.ckpt_dir)
    model, _ = create_model_and_diffusion(config)

    # reconstruct the abstract state layout from a tiny init
    K = config.get("max_frames", 20)
    C = config.get("in_channels", 3)
    H = config.get("image_size", 64)
    B = config.get("batch_size", 1)
    x = np.zeros((B, K, C, H, H), np.float32)
    fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
    m = np.zeros((B, K, 1, 1, 1), np.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, np.zeros((B,), np.int32),
                           x0=x, frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    )
    ema_rates = [float(r) for r in str(config.get("ema_rate", "0.9999")).split(",")]
    tx = make_optimizer(config.get("lr", 1e-4), config.get("weight_decay", 0.0))
    abstract = jax.eval_shape(lambda p: init_train_state(p, tx, ema_rates), params)

    state, step, _ = ckpt_lib.load_checkpoint(args.ckpt_dir, abstract, args.step)
    chosen = state["params"] if args.ema_rate == "raw" else state["ema"][args.ema_rate]

    from flax import serialization

    out_dir = os.path.join(args.ckpt_dir, "export")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"params_{args.ema_rate}_{step:06d}.msgpack")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, chosen)))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    print(f"exported {out_path}")


if __name__ == "__main__":
    main()
