"""Build the ``synthetic_encoded`` latent dataset + roundtrip-real FVD side.

The in-env latent workflow (VERDICT r4 item 2): the reference's production
latent regime pre-encodes videos offline with the SVD VAE and trains on
normalized 32x32 C4 latents (README.md:14, datasets/carla/encode_latent.py).
Real CARLA + released VAE weights are egress-blocked, so this script builds
the same regime from in-env pieces:

  1. deterministic SVD-VAE weights via the REAL converter main() against the
     miniature torch fixture (tests/fixtures/run_convert_svd_vae.py chain);
  2. synthetic videos generated at 256px (the VAE's 8x downsampling then
     gives 32x32 latents — the reference latent config's image size);
  3. offline encode of train (seeds 0..N) and HELD-OUT test
     (TEST_SEED_OFFSET..) splits -> {idx}.npy latent means, running
     channel-wise train stats -> encoded_train_norm_stats.pt, second-pass
     in-place normalization — mirroring encode_latent.py's protocol;
  4. a ROUNDTRIP-REAL set for FVD: test videos encoded AND decoded through
     the same VAE, saved in sample-file format. The fixture VAE is a
     deterministic random autoencoder, so comparing decoded samples against
     raw pixels would drown model signal in decoder error; comparing both
     sides THROUGH the same decoder cancels it, leaving the latent-space
     model quality the gate is after (scripts/video_fvd.py --real_dir).

Idempotent: skips splits whose outputs already exist.

Usage (TPU, ~2 min): python benchmarks/prep_synthetic_latent.py
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_vae(out_root):
    """Converted-fixture SVD VAE (builds the npz pair if absent)."""
    prefix = os.path.join(out_root, "svd_vae_fixture")
    if not os.path.exists(prefix + "_encoder.npz"):
        r = subprocess.run(
            [sys.executable, "tests/fixtures/run_convert_svd_vae.py", prefix],
            cwd=REPO, text=True, capture_output=True)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "RUNNER-OK" in r.stdout
    from lfvdm_tpu.models.vae import load_svd_vae

    return load_svd_vae(prefix), prefix


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_root", default=os.path.join(REPO, "datasets/synthetic-encoded"))
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "synthetic_longrange"])
    ap.add_argument("--num_train", type=int, default=64)
    ap.add_argument("--num_test", type=int, default=100)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--chunk_size", type=int, default=25)
    args = ap.parse_args()

    from lfvdm_tpu.data.datasets import (
        SyntheticLongRangeDataset,
        SyntheticVideoDataset,
    )

    os.makedirs(args.out_root, exist_ok=True)
    vae, prefix = get_vae(args.out_root)

    cls = (SyntheticLongRangeDataset if args.dataset == "synthetic_longrange"
           else SyntheticVideoDataset)

    def pixel_dataset(test):
        ds = cls(num_videos=max(args.num_train, args.num_test),
                 T=args.T, H=256, W=256)
        # each video is visited once; at 256px an LRU-cached video is ~78 MB,
        # so default caching would pin ~5 GB of host RAM for nothing
        ds.CACHE_CAP = 1
        if test:
            ds.set_test()
        return ds

    # ---- encode both splits (latent MEANS, rng=None — reference
    # encode_latent.py saves latent_dist.mean) + running train stats
    mean_x = np.zeros(4, np.float64)
    mean_x2 = np.zeros(4, np.float64)
    n_obs = 0
    for split, n in (("train", args.num_train), ("test", args.num_test)):
        split_dir = os.path.join(args.out_root, split)
        os.makedirs(split_dir, exist_ok=True)
        ds = pixel_dataset(test=(split == "test"))
        for i in range(n):
            out = os.path.join(split_dir, f"{i}.npy")
            if os.path.exists(out):
                z = np.load(out)
            else:
                vid = np.asarray(ds[i])[None]  # (1, T, 3, 256, 256)
                z = np.asarray(vae.encode_video(vid, rng=None,
                                                chunk_size=args.chunk_size))[0]
                np.save(out, z.astype(np.float32))
            if split == "train":
                cur = z.astype(np.float64)
                cur_n = cur[:, 0].size
                mean_x = (n_obs * mean_x + cur.mean(axis=(0, 2, 3)) * cur_n) / (n_obs + cur_n)
                mean_x2 = (n_obs * mean_x2 + (cur ** 2).mean(axis=(0, 2, 3)) * cur_n) / (n_obs + cur_n)
                n_obs += cur_n
        print(f"{split}: {n} videos encoded -> {split_dir}", flush=True)

    stats_path = os.path.join(args.out_root, "encoded_train_norm_stats.pt")
    normalized_marker = os.path.join(args.out_root, ".normalized")
    if not os.path.exists(normalized_marker):
        mean = mean_x.astype(np.float32)
        std = np.sqrt(np.maximum(mean_x2 - mean_x ** 2, 0)).astype(np.float32)
        import torch

        torch.save({"mean": torch.tensor(mean), "std": torch.tensor(std),
                    "n_obs": torch.tensor(n_obs)}, stats_path)
        # second pass: normalize every file in place (encode_latent.py:83-88)
        for split, n in (("train", args.num_train), ("test", args.num_test)):
            for i in range(n):
                p = os.path.join(args.out_root, split, f"{i}.npy")
                z = np.load(p)
                np.save(p, ((z - mean.reshape(-1, 1, 1)) /
                            (std.reshape(-1, 1, 1) + 1e-8)).astype(np.float32))
        with open(normalized_marker, "w") as f:
            f.write("1\n")
        print(f"stats saved to {stats_path}; files normalized in place")
    else:
        import torch

        st = torch.load(stats_path, weights_only=False)
        mean, std = st["mean"].numpy(), st["std"].numpy()

    # ---- roundtrip reals: decode(normalized latents de-normalized) with the
    # SAME uint8 conversion video_sample.py applies to decoded samples
    rr_dir = os.path.join(args.out_root, "roundtrip_real")
    os.makedirs(rr_dir, exist_ok=True)
    for i in range(args.num_test):
        out = os.path.join(rr_dir, f"sample_{i:04d}-0.npy")
        if os.path.exists(out):
            continue
        z = np.load(os.path.join(args.out_root, "test", f"{i}.npy"))
        z = z * std.reshape(-1, 1, 1) + mean.reshape(-1, 1, 1)
        x = np.asarray(vae.decode_video(z[None], chunk_size=args.chunk_size))[0]
        np.save(out, ((x + 1) / 2 * 255).clip(0, 255).astype(np.uint8))
    print(f"roundtrip reals -> {rr_dir}")
    print(json.dumps({"vae_prefix": prefix, "out_root": args.out_root,
                      "num_train": args.num_train, "num_test": args.num_test,
                      "T": args.T, "dataset": args.dataset}))


if __name__ == "__main__":
    main()
