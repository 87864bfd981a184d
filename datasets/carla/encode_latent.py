"""Offline SVD-VAE pre-encoding of CARLA videos (latent diffusion prep).

Capability parity: /root/reference/datasets/carla/encode_latent.py — for
every CARLA video: 2x-upsample frames, VAE-encode (chunked), save the
latent-distribution means as ``encoded_video_*.pt``-equivalent ``.npy``
files; running channel-wise mean/std over the train split saved as
``encoded_train_norm_stats``; second pass normalizes each file in place.

Runs on TPU with the Flax SVD VAE (weights via scripts/convert_svd_vae.py);
outputs are numpy (.npy) with a torch-compatible stats file so the training
registry's ``data_encoding_stats_dict`` path works either way.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np


def create_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, default="no-traffic-encoded")
    parser.add_argument("--chunk_size", type=int, default=100)
    parser.add_argument("--normalize", action="store_true")
    parser.add_argument("--vae_weights", type=str, default=None,
                        help="prefix of converted svd vae npz pair")
    return parser


def load_vae(weights_prefix):
    from lfvdm_tpu.models.vae import SVDVae

    variables = None
    if weights_prefix:
        from lfvdm_tpu.evals.i3d import I3DFeatureExtractor  # reuse npz unflattener

        enc = I3DFeatureExtractor._load_npz(f"{weights_prefix}_encoder.npz")
        dec = I3DFeatureExtractor._load_npz(f"{weights_prefix}_decoder.npz")
        variables = (enc, dec)
    return SVDVae(variables=variables)


def load_video(path: str) -> np.ndarray:
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu", weights_only=False).numpy()
    return np.load(path)


def save(path: str, arr: np.ndarray):
    if path.endswith(".pt"):
        import torch

        torch.save(torch.tensor(arr), path)
    else:
        np.save(path, arr)


def encode_video(vae, video_uint8: np.ndarray, chunk_size: int) -> np.ndarray:
    """(T, H, W, C) uint8 -> (T, 4, 2H/8, 2W/8) latent means."""
    video = video_uint8.astype(np.float32) / 255.0
    video = 2 * video - 1
    video = video.transpose(0, 3, 1, 2)  # TCHW
    video = np.repeat(np.repeat(video, 2, axis=2), 2, axis=3)  # 2x nearest
    out = vae.encode_video(video[None], rng=None, chunk_size=chunk_size)
    return np.asarray(out[0])


def main():
    args = create_argparser().parse_args()
    path = args.path
    vae = load_vae(args.vae_weights)

    mean_x = np.zeros((1, 4, 1, 1), np.float64)
    mean_x2 = np.zeros((1, 4, 1, 1), np.float64)
    n_obs = 0
    mean = std = None
    for mode in ["train", "test"]:
        split_path = os.path.join(path, f"video_{mode}.csv")
        with open(split_path) as f:
            fnames = [l.rstrip("\n").split("/")[-1] for l in f if ".pt" in l]

        for fname in fnames:
            video = load_video(os.path.join(path, fname))
            means = encode_video(vae, video, args.chunk_size)
            save(os.path.join(path, "encoded_" + fname), means)
            if args.normalize and mode == "train":
                cur_n = means[:, 0].size
                cur_mean = means.astype(np.float64).mean(axis=(0, 2, 3), keepdims=True)
                cur_mean2 = (means.astype(np.float64) ** 2).mean(axis=(0, 2, 3), keepdims=True)
                mean_x = n_obs / (n_obs + cur_n) * mean_x + cur_n / (n_obs + cur_n) * cur_mean
                mean_x2 = n_obs / (n_obs + cur_n) * mean_x2 + cur_n / (n_obs + cur_n) * cur_mean2
                n_obs += cur_n
                print(f"n_obs: {n_obs}, mean: {mean_x.flatten()}")

        if args.normalize:
            if mode == "train":
                mean = mean_x.astype(np.float32)
                std = np.sqrt(mean_x2 - mean_x**2).astype(np.float32)
                stats = {"mean": mean.flatten(), "std": std.flatten(), "n_obs": n_obs}
                print("=== Final Stats ===", stats)
                try:
                    import torch

                    torch.save({k: torch.tensor(v) for k, v in stats.items()},
                               os.path.join(path, "encoded_train_norm_stats.pt"))
                except ImportError:
                    np.savez(os.path.join(path, "encoded_train_norm_stats.npz"), **stats)
            print(f"normalizing {mode} data")
            for fname in fnames:
                encoded_path = os.path.join(path, "encoded_" + fname)
                video = load_video(encoded_path)
                save(encoded_path, (video - mean) / (std + 1e-8))


if __name__ == "__main__":
    main()
