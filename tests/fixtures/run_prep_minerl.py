"""Drive datasets/minerl.py's REAL main() end-to-end in-env.

Usage: python tests/fixtures/run_prep_minerl.py <workdir>

The real script is tfds-gated (tensorflow_datasets + the minerl_navigate
builder package, both absent here and needing egress). This runner
substitutes exactly that library boundary with tests/fixtures/fake_tfds
(see its docstring for the fidelity argument), copies the script into
<workdir> so its ``__file__``-relative output root lands there instead of
the repo, and executes its main() verbatim. Afterwards it validates the
on-disk contract the training registry consumes
(data/datasets.py:31,204-221): ``minerl_navigate-torch/{train,test}/{i}.npy``
uint8 (T, H, W, C), loadable by NpyPerVideoDataset and by the C++ native
loader. (Reference touchpoint: /root/reference/datasets/minerl.py:9-24.)
"""

import os
import runpy
import shutil
import sys
import types

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

# Fake minerl_navigate package: registers deterministic videos the way the
# real package registers its tfds builder on import.
rng = np.random.default_rng(0)
VIDS = {
    "train": [rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8) for _ in range(3)],
    "test": [rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8) for _ in range(2)],
}
mod = types.ModuleType("minerl_navigate")
fake_tfds.register("minerl_navigate",
                   {s: [{"video": v} for v in vs] for s, vs in VIDS.items()})
sys.modules["minerl_navigate"] = mod

# Execute the real script (copied so its __file__-derived data_dir is the
# scratch dir, not the repo checkout).
script = os.path.join(workdir, "minerl.py")
shutil.copy(os.path.join(REPO, "datasets", "minerl.py"), script)
sys.argv = ["minerl.py"]
runpy.run_path(script, run_name="__main__")

# --- on-disk contract the data layer consumes ---
out_root = os.path.join(workdir, "minerl_navigate-torch")
for split, vids in VIDS.items():
    fnames = sorted(os.listdir(os.path.join(out_root, split)))
    assert fnames == [f"{i}.npy" for i in range(len(vids))], fnames
    for i, v in enumerate(vids):
        got = np.load(os.path.join(out_root, split, f"{i}.npy"))
        assert got.dtype == np.uint8 and got.shape == v.shape, (got.dtype, got.shape)
        np.testing.assert_array_equal(got, v)

# NpyPerVideoDataset loads it (same class the registry builds for "minerl")
from lfvdm_tpu.data.datasets import NpyPerVideoDataset

ds = NpyPerVideoDataset(os.path.join(out_root, "train"), T=4)
item = ds[0]
assert item.shape == (4, 3, 64, 64), item.shape
assert item.min() >= -1.0 and item.max() <= 1.0
expect = VIDS["train"][0].astype(np.float32) / 255.0
expect = 2 * expect.transpose(0, 3, 1, 2) - 1
start = None
for s in range(VIDS["train"][0].shape[0] - 4 + 1):
    if np.allclose(item, expect[s:s + 4]):
        start = s
        break
assert start is not None, "window not found in source video"

# The exported layout is native-loader streamable: native_paths() resolves
# every per-video .npy (the C++ loader's input contract; the loader itself
# is built+exercised in test_native_loader.py).
paths = ds.native_paths()
assert paths is not None and len(paths) == len(VIDS["train"]), paths
assert all(p.endswith(".npy") and os.path.exists(p) for p in paths)

print("minerl prep contract OK")
print("RUNNER-OK")
