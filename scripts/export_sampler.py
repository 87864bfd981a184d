"""Export the window sampler as a portable serving artifact.

Produces <out>/sampler.stablehlo (jax.export artifact; weights are an
argument) and <out>/params.npz. A serving process needs only jax and
lfvdm_tpu.serving.load_window_sampler — no model code.

Examples:
  # from a training checkpoint directory (latest step, EMA weights)
  python scripts/export_sampler.py --checkpoint_dir checkpoints/run \
      --out serve_artifact --batch_size 2 --max_frames 20

  # self-test with random weights
  python scripts/export_sampler.py --random_init --out /tmp/artifact \
      --image_size 32 --num_channels 32 --diffusion_steps 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from lfvdm_tpu.config import (
    add_dict_to_argparser,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from lfvdm_tpu import serving
from lfvdm_tpu.training import checkpoint as ckpt_lib


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    defaults = dict(
        checkpoint_dir="",
        random_init=False,
        ema_rate="0.9999",
        out="serve_artifact",
        batch_size=1,
        max_frames=20,
        use_ddim=False,
        eta=0.0,
        platform="",  # e.g. "tpu" or "cpu"; default: current backend
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    args = parser.parse_args()
    config = vars(args)

    if args.checkpoint_dir:
        latest = ckpt_lib.find_latest_step(args.checkpoint_dir)
        if latest is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
        state, step, saved_config = ckpt_lib.load_checkpoint_raw(args.checkpoint_dir, latest)
        config = {**saved_config, **{k: config[k] for k in
                                     ("batch_size", "max_frames", "use_ddim", "eta")}}
        model, diffusion = create_model_and_diffusion(config)
        params = state["ema"].get(str(args.ema_rate), state["params"])
        print(f"exporting step {step} (ema {args.ema_rate})")
    elif args.random_init:
        model, diffusion = create_model_and_diffusion(config)
        B, K = args.batch_size, args.max_frames
        C, H = config["in_channels"], config["image_size"]
        x = np.zeros((B, K, C, H, H), np.float32)
        fi = np.tile(np.arange(K)[None], (B, 1)).astype(np.int32)
        m = np.zeros((B, K, 1, 1, 1), np.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                     np.zeros((B,), np.int32), x0=x,
                                     frame_indices=fi, obs_mask=m, latent_mask=1 - m)
    else:
        raise SystemExit("pass --checkpoint_dir or --random_init")

    blob = serving.export_window_sampler(
        model, diffusion, params,
        batch_size=args.batch_size, max_frames=args.max_frames,
        in_channels=config["in_channels"], image_size=config["image_size"],
        use_ddim=args.use_ddim, eta=args.eta,
        platforms=(args.platform,) if args.platform else None,
    )
    os.makedirs(args.out, exist_ok=True)
    art = os.path.join(args.out, "sampler.stablehlo")
    with open(art, "wb") as f:
        f.write(blob)
    serving.save_params_npz(params, os.path.join(args.out, "params.npz"))
    print(f"wrote {art} ({len(blob) / 1e6:.1f} MB) + params.npz")


if __name__ == "__main__":
    main()
