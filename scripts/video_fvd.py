"""Compute FVD between sampled videos and the test set.

Capability parity: /root/reference/scripts/video_fvd.py — pairs
``sample_{idx:04d}-{seed}.npy`` files against the true test set, per-dataset
feature batch sizes, zero-padded final batch, idempotent
``fvd-{num_videos}-{sample_idx}.txt`` output.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import numpy as np

from lfvdm_tpu.data.datasets import get_test_dataset
from lfvdm_tpu.evals.fvd import FVD

BATCH_SIZES = {"mazes_cwvae": 16, "minerl": 8, "carla_no_traffic": 4,
               "carla_no_traffic_2x": 4, "carla_no_traffic_2x_encoded": 4,
               "synthetic": 16, "synthetic_longrange": 16}


class SampleDataset:
    """Reads sample_{idx:04d}-{seed}.npy uint8 (T, C, H, W) files."""

    def __init__(self, samples_dir: Path, sample_idx: int, length: int):
        self.dir = Path(samples_dir)
        self.sample_idx = sample_idx
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, i) -> np.ndarray:
        path = self.dir / f"sample_{i:04d}-{self.sample_idx}.npy"
        return np.load(path)


def to_uint8_thwc(video: np.ndarray, from_unit_range: bool) -> np.ndarray:
    """(T, C, H, W) -> (T, H, W, C) uint8."""
    if from_unit_range:  # test set videos are float in [-1, 1]
        video = ((video + 1) / 2 * 255).clip(0, 255)
    return np.asarray(video, np.uint8).transpose(0, 2, 3, 1)


def real_dataset_name(dataset_name: str) -> str:
    """Dataset whose videos provide the REAL-side I3D features.

    Latent-space checkpoints sample latents that video_sample.py decodes to
    pixels, so '<x>_encoded' pairs against the '<x>' pixel dataset (same T).
    The reference would pair pixels against 4-channel latents here —
    get_test_dataset('..._encoded') returns encoded videos its FVD
    preprocess cannot consume; that path is broken/unused upstream
    (/root/reference/scripts/video_fvd.py:113-118 + video_datasets.py:94-95).
    """
    suffix = "_encoded"
    return dataset_name[: -len(suffix)] if dataset_name.endswith(suffix) else dataset_name


def compute_fvd(eval_dir: Path, dataset_name: str, num_videos: int, sample_idx: int,
                T: int, i3d_weights=None, batch_size=None, mesh=None,
                real_dir=None, temporal_stride: int = 1) -> float:
    if batch_size is None:
        batch_size = BATCH_SIZES.get(dataset_name, 8)
    fvd = FVD(i3d_weights=i3d_weights, batch_size=batch_size, mesh=mesh)
    samples = SampleDataset(eval_dir / "samples", sample_idx, num_videos)
    if real_dir is not None:
        # Real side from a directory of sample-format uint8 .npy files
        # instead of the test dataset — e.g. VAE-roundtripped reals for the
        # latent gate (benchmarks/prep_synthetic_latent.py): both sides go
        # through the SAME decoder, so decoder error cancels and the score
        # isolates latent-space model quality.
        real_set = SampleDataset(Path(real_dir), 0, num_videos)
        real_unit_range = False
    else:
        real_set = get_test_dataset(real_dataset_name(dataset_name), T=T)
        real_unit_range = True

    fake_feats, real_feats = [], []
    for start in range(0, num_videos, batch_size):
        idxs = list(range(start, min(start + batch_size, num_videos)))
        # temporal_stride > 1: score on temporally subsampled frames — an
        # aux protocol that moves slow statistics (e.g. the longrange
        # datasets' 25-45-frame regime segments) into the early conv
        # layers' receptive window; sensitivity calibrated per corruption
        # mode by benchmarks/fvd_sensitivity_longrange.py.
        fake = np.stack([to_uint8_thwc(samples[i], False)[:T][::temporal_stride]
                         for i in idxs])
        real = np.stack([to_uint8_thwc(np.asarray(real_set[i]), real_unit_range)[:T][::temporal_stride]
                         for i in idxs])
        # zero-pad the final partial batch (video_fvd.py:44-55)
        if len(idxs) < batch_size:
            pad = batch_size - len(idxs)
            fake = np.concatenate([fake, np.zeros((pad,) + fake.shape[1:], np.uint8)])
            real = np.concatenate([real, np.zeros((pad,) + real.shape[1:], np.uint8)])
        fake_feats.append(fvd.extract_features(fake)[:len(idxs)])
        real_feats.append(fvd.extract_features(real)[:len(idxs)])
    from lfvdm_tpu.evals.fvd import frechet_distance

    return frechet_distance(np.concatenate(fake_feats), np.concatenate(real_feats))


def create_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", required=True, type=str)
    parser.add_argument("--num_videos", type=int, default=100)
    parser.add_argument("--sample_idx", type=int, default=0)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--i3d_weights", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="videos per I3D feature batch (default: the "
                             "per-dataset table, reference video_fvd.py:34)")
    parser.add_argument("--dp_devices", type=int, default=1,
                        help="shard each I3D feature batch over this many "
                             "local devices (pick --batch_size a multiple)")
    parser.add_argument("--real_dir", type=str, default=None,
                        help="directory of sample-format uint8 .npy files to "
                             "use as the REAL side instead of the test "
                             "dataset (e.g. VAE-roundtripped reals for the "
                             "latent gate)")
    parser.add_argument("--temporal_stride", type=int, default=1,
                        help="score every k-th frame (aux protocol for slow "
                             "temporal statistics; output file is suffixed "
                             "-sK so stride variants don't collide)")
    return parser


def main():
    from lfvdm_tpu.config import apply_platform_env, enable_compilation_cache

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    enable_compilation_cache()  # I3D jit re-compiles are minutes on the tunnel
    args = create_argparser().parse_args()

    eval_dir = Path(args.eval_dir)
    stride_sfx = f"-s{args.temporal_stride}" if args.temporal_stride != 1 else ""
    out_path = eval_dir / f"fvd-{args.num_videos}-{args.sample_idx}{stride_sfx}.txt"
    if out_path.exists():
        print(f"{out_path} exists: FVD = {out_path.read_text().strip()}")
        return

    with open(eval_dir / "model_config.json") as f:
        config = json.load(f)
    dataset = args.dataset or config.get("dataset", "synthetic")
    T = args.T or config.get("T")

    mesh = None
    if args.dp_devices > 1:
        from lfvdm_tpu.parallel.mesh import make_eval_mesh

        mesh = make_eval_mesh(
            args.dp_devices, args.batch_size or BATCH_SIZES.get(dataset, 8))

    score = compute_fvd(eval_dir, dataset, args.num_videos, args.sample_idx, T,
                        batch_size=args.batch_size,
                        i3d_weights=args.i3d_weights, mesh=mesh,
                        real_dir=args.real_dir,
                        temporal_stride=args.temporal_stride)
    out_path.write_text(f"{score}\n")
    print(f"FVD: {score} (saved to {out_path})")


if __name__ == "__main__":
    main()
