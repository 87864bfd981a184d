"""Assemble sampled videos + ground truth into one mp4/gif grid.

Capability parity: /root/reference/scripts/video_make_mp4.py — the first
``do_n`` test videos, each as GT (fully red-marked) stacked over ``n_seeds``
samples (first ``obs_length`` frames red-marked), concatenated along height
per video and along width across videos, written as ONE
``{do_n}_{n_seeds}.{format}`` file. The dataset comes from the eval dir's
``model_config.json`` exactly like the reference (reference :27-30); the
``--dataset``/``--T`` overrides are additions for configs without one.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import numpy as np

from lfvdm_tpu.utils.video_io import mark_as_observed, tensor2avi, tensor2gif, tensor2mp4


def str2bool(v):
    from lfvdm_tpu.config import str2bool as impl

    return impl(v)


def create_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", required=True, type=str)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--add_gt", type=str2bool, default=True)
    parser.add_argument("--do_n", type=int, default=1,
                        help="assemble the first do_n test videos")
    parser.add_argument("--n_seeds", type=int, default=1,
                        help="samples per video (seeds tried in order)")
    parser.add_argument("--obs_length", type=int, default=0,
                        help="red-mark the first obs_length frames of samples")
    parser.add_argument("--format", choices=["gif", "mp4", "avi"], default="gif")
    parser.add_argument("--dataset", type=str, default=None,
                        help="override the dataset recorded in model_config.json")
    parser.add_argument("--T", type=int, default=None)
    return parser


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    args = create_argparser().parse_args()

    eval_dir = Path(args.eval_dir)
    dataset_name = args.dataset
    if args.add_gt:
        from lfvdm_tpu.data.datasets import get_test_dataset

        if dataset_name is None:
            config = json.loads((eval_dir / "model_config.json").read_text())
            dataset_name = config["dataset"]
        test_set = get_test_dataset(dataset_name, T=args.T)

    out_dir = (Path(args.out_dir) if args.out_dir else eval_dir) / "videos"
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{args.do_n}_{args.n_seeds}.{args.format}"

    videos = []
    for data_idx in range(args.do_n):
        rows = []
        if args.add_gt:
            gt = np.asarray(test_set[data_idx])
            gt8 = ((gt + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
            mark_as_observed(gt8)
            rows.append(gt8)
        seed, done = 0, 0
        while done < args.n_seeds:
            assert seed < 100, (
                f"Not enough seeds for idx {data_idx} "
                f"(found {done} after trying {seed} seeds)")
            fname = eval_dir / "samples" / f"sample_{data_idx:04d}-{seed}.npy"
            if fname.exists():
                video = np.load(fname)
                mark_as_observed(video[: args.obs_length])
                rows.append(video)
                done += 1
            seed += 1
        T = min(r.shape[0] for r in rows)
        videos.append(np.concatenate([r[:T] for r in rows], axis=-2))
    video = np.concatenate(videos, axis=-1)

    writer = {"gif": tensor2gif, "mp4": tensor2mp4, "avi": tensor2avi}[args.format]
    writer(video, out_path, drange=(0, 255))
    print(f"Saved to {out_path}")


if __name__ == "__main__":
    main()
