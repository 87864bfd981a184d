"""Run the CARLA world-coordinate regressor over samples or raw datasets.

Capability parity: /root/reference/scripts/video_to_world_coords.py —
saves per-video ``coords/*.npy``, shuffles work for poor-man's parallelism
across array jobs, skips existing outputs.
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import numpy as np

from lfvdm_tpu.evals.carla_regressor import load_classifier_regressor_like_paper


def create_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, default=None,
                        help="Samples directory (reads samples/*.npy).")
    parser.add_argument("--dataset_dir", type=str, default=None,
                        help="Raw dataset directory (reads video_*.pt).")
    parser.add_argument("--classifier_path", type=str, required=True)
    parser.add_argument("--regressor_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    return parser


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    args = create_argparser().parse_args()

    predictor = load_classifier_regressor_like_paper(
        args.classifier_path, args.regressor_path, batch_size=args.batch_size
    )

    if args.eval_dir:
        src = Path(args.eval_dir) / "samples"
        out_dir = Path(args.eval_dir) / "coords"
        paths = sorted(src.glob("sample_*.npy"))
        loader = lambda p: np.load(p).astype(np.float32)  # (T, C, H, W) uint8
    else:
        src = Path(args.dataset_dir)
        out_dir = src / "coords"
        paths = sorted(src.glob("video_*.pt"))

        def loader(p):
            import torch

            v = torch.load(p, map_location="cpu", weights_only=False).numpy()
            return v.transpose(0, 3, 1, 2).astype(np.float32)  # THWC -> TCHW

    out_dir.mkdir(parents=True, exist_ok=True)
    random.shuffle(paths)  # poor-man's parallelism across concurrent jobs
    for p in paths:
        out_path = out_dir / (p.stem + ".npy")
        if out_path.exists():
            continue
        coords = predictor.predict_coords(loader(p))
        np.save(out_path, coords)
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
