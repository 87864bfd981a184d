"""Drive datasets/carla/encode_latent.py's REAL main() end-to-end in-env.

Usage: python tests/fixtures/run_encode_latent.py <workdir>

Chain: scripts/convert_svd_vae.py main() (against the miniature torch
fixture) -> encode_latent.py main() over a tiny fake CARLA layout
(.pt videos + video_{train,test}.csv) with --normalize -> validate the
on-disk contract the training registry consumes (datasets.py:54-57,
CarlaDataset encoded_ prefix): per-video latent shapes, train-split
normalization to ~N(0,1), test-split normalized with the TRAIN stats, and
the encoded_train_norm_stats.pt key/shape contract of load_encoding_stats.
(Reference touchpoint: datasets/carla/encode_latent.py, which upstream
could only run against the real SVD VAE + real CARLA downloads.)
"""

import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import torch_svd_vae_fixture

workdir = sys.argv[1]
os.makedirs(workdir, exist_ok=True)

# 1) converted-weights npz pair via the real converter main()
mod = types.ModuleType("diffusers")
mod.AutoencoderKLTemporalDecoder = torch_svd_vae_fixture.AutoencoderKLTemporalDecoder
sys.modules["diffusers"] = mod
prefix = os.path.join(workdir, "svd_vae")
sys.argv = ["convert_svd_vae.py", "--out", prefix]
runpy.run_path(os.path.join(REPO, "scripts", "convert_svd_vae.py"),
               run_name="__main__")

# 2) tiny fake CARLA layout: (T, H, W, C) uint8 .pt videos + split csvs
rng = np.random.default_rng(0)
T, H = 3, 32  # 2x-upsample -> 64px -> fixture latent 8x8
splits = {"train": ["video_0.pt", "video_1.pt", "video_2.pt"],
          "test": ["video_3.pt", "video_4.pt"]}
raw = {}
for mode, fnames in splits.items():
    with open(os.path.join(workdir, f"video_{mode}.csv"), "w") as f:
        f.write("\n".join(f"no-traffic/{n}" for n in fnames) + "\n")
    for n in fnames:
        vid = rng.integers(0, 256, (T, H, H, 3), dtype=np.uint8)
        raw[n] = vid
        torch.save(torch.tensor(vid), os.path.join(workdir, n))

# 3) the real encode_latent main()
sys.argv = ["encode_latent.py", "--path", workdir, "--normalize",
            "--vae_weights", prefix, "--chunk_size", "2"]
runpy.run_path(os.path.join(REPO, "datasets", "carla", "encode_latent.py"),
               run_name="__main__")

# 4) on-disk contract checks
# 4a. per-video encoded files, CarlaDataset's "encoded_" + fname convention
lat = {}
for fnames in splits.values():
    for n in fnames:
        enc = torch.load(os.path.join(workdir, "encoded_" + n),
                         map_location="cpu", weights_only=False).numpy()
        assert enc.shape == (T, 4, 8, 8), (n, enc.shape)
        lat[n] = enc

# 4b. stats file: the exact keys load_encoding_stats/codecs consume
stats = torch.load(os.path.join(workdir, "encoded_train_norm_stats.pt"),
                   map_location="cpu", weights_only=False)
assert set(stats) == {"mean", "std", "n_obs"}, set(stats)
mean, std = stats["mean"].numpy(), stats["std"].numpy()
assert mean.shape == (4,) and std.shape == (4,), (mean.shape, std.shape)
assert int(stats["n_obs"]) == 3 * T * 8 * 8

# 4c. train split normalized to ~N(0,1) channel-wise
train_cat = np.concatenate([lat[n] for n in splits["train"]], axis=0)
np.testing.assert_allclose(train_cat.mean(axis=(0, 2, 3)), 0.0, atol=1e-4)
np.testing.assert_allclose(train_cat.std(axis=(0, 2, 3)), 1.0, atol=1e-2)

# 4d. test split normalized with the TRAIN stats: re-encode one test video
# through the consumer-loaded VAE and apply the stats by hand
from lfvdm_tpu.models.vae import load_svd_vae

vae = load_svd_vae(prefix)
n = splits["test"][0]
video = raw[n].astype(np.float32) / 255.0
video = (2 * video - 1).transpose(0, 3, 1, 2)
video = np.repeat(np.repeat(video, 2, axis=2), 2, axis=3)
means = np.asarray(vae.encode_video(video[None], rng=None, chunk_size=2))[0]
want = (means - mean.reshape(1, 4, 1, 1)) / (std.reshape(1, 4, 1, 1) + 1e-8)
np.testing.assert_allclose(lat[n], want, rtol=1e-4, atol=1e-5)

print("encode_latent contract OK")
print("RUNNER-OK")
