"""Drive datasets/mazes.py's REAL main() end-to-end in-env.

Usage: python tests/fixtures/run_prep_mazes.py <workdir>

mazes.py defines a full tfds GeneratorBasedBuilder (download from
archive.org, glob *.mp4 per split, export {idx}.npy). This runner
provisions a miniature extracted-archive layout (train/*.mp4, test/*.mp4 —
npy-serialized frames under the .mp4 name since this image has no ffmpeg;
the substitution point is inside the faked tfds library, see
fake_tfds.Video), installs tests/fixtures/fake_tfds as
``tensorflow_datasets``, and executes the script's main() verbatim: its
REAL builder subclass drives the real _split_generators/_generate_examples
code, then the real export loop writes
``gqn_mazes-torch/{train,test}/{i}.npy``. The output contract is validated
through NpyPerVideoDataset — the class the "mazes_cwvae" registry entry
builds. (Reference touchpoint: /root/reference/datasets/mazes.py:51-111.)
"""

import os
import runpy
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import fake_tfds

workdir = sys.argv[1]
os.makedirs(workdir, exist_ok=True)

fake_tfds.install()

# Miniature "extracted archive": the layout the real dl_manager's
# download_and_extract(_DOWNLOAD_URL) yields — train/*.mp4 + test/*.mp4.
rng = np.random.default_rng(7)
extract = os.path.join(workdir, "extracted")
VIDS = {"train": 3, "test": 2}
src = {}
for split, n in VIDS.items():
    os.makedirs(os.path.join(extract, split), exist_ok=True)
    src[split] = []
    for i in range(n):
        v = rng.integers(0, 256, (5, 64, 64, 3), dtype=np.uint8)
        src[split].append(v)
        # .mp4 name, npy payload (no ffmpeg in-env; decoded by fake tfds)
        with open(os.path.join(extract, split, f"clip_{i}.mp4"), "wb") as f:
            np.save(f, v)
os.environ["FAKE_TFDS_EXTRACT_DIR"] = extract

script = os.path.join(workdir, "mazes.py")
shutil.copy(os.path.join(REPO, "datasets", "mazes.py"), script)
sys.argv = ["mazes.py"]
runpy.run_path(script, run_name="__main__")

# --- on-disk contract ---
out_root = os.path.join(workdir, "gqn_mazes-torch")
for split, n in VIDS.items():
    fnames = sorted(os.listdir(os.path.join(out_root, split)))
    assert fnames == [f"{i}.npy" for i in range(n)], fnames
    got_set = {np.load(os.path.join(out_root, split, f)).tobytes() for f in fnames}
    want_set = {v.tobytes() for v in src[split]}
    assert got_set == want_set, f"{split}: exported videos != source clips"
    for f in fnames:
        got = np.load(os.path.join(out_root, split, f))
        assert got.dtype == np.uint8 and got.shape == (5, 64, 64, 3), got.shape

from lfvdm_tpu.data.datasets import NpyPerVideoDataset

ds = NpyPerVideoDataset(os.path.join(out_root, "test"), T=5)
ds.set_test()
item = ds[0]
assert item.shape == (5, 3, 64, 64), item.shape
assert item.min() >= -1.0 and item.max() <= 1.0

print("mazes prep contract OK")
print("RUNNER-OK")
