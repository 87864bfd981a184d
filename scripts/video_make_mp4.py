"""Assemble sampled videos + ground truth into mp4/gif grids.

Capability parity: /root/reference/scripts/video_make_mp4.py — GT plus n
seeds stacked vertically, observed frames marked with a red border.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import numpy as np

from lfvdm_tpu.data.datasets import get_test_dataset
from lfvdm_tpu.utils.video_io import assemble_grid, mark_as_observed, tensor2gif, tensor2mp4


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", required=True, type=str)
    parser.add_argument("--dataset", type=str, default="synthetic")
    parser.add_argument("--video_indices", type=int, nargs="+", default=[0])
    parser.add_argument("--sample_indices", type=int, nargs="+", default=[0])
    parser.add_argument("--n_obs", type=int, default=36)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--format", choices=["mp4", "gif"], default="mp4")
    parser.add_argument("--add_gt", action="store_true", default=True)
    args = parser.parse_args()

    eval_dir = Path(args.eval_dir)
    out_dir = eval_dir / "videos"
    out_dir.mkdir(parents=True, exist_ok=True)
    test_set = get_test_dataset(args.dataset, T=args.T)

    for vi in args.video_indices:
        gt = np.asarray(test_set[vi])
        gt8 = ((gt + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        rows = []
        for si in args.sample_indices:
            sample = np.load(eval_dir / "samples" / f"sample_{vi:04d}-{si}.npy")
            sample = sample[: len(gt8)].copy()
            mark_as_observed(sample[: args.n_obs])
            rows.append(sample)
        grid = assemble_grid(gt8[: len(rows[0])], rows) if args.add_gt else (
            assemble_grid(rows[0], rows[1:]) if len(rows) > 1 else rows[0]
        )
        out = out_dir / f"video_{vi:04d}.{args.format}"
        (tensor2mp4 if args.format == "mp4" else tensor2gif)(grid, out)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
