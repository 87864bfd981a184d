"""Export MineRL-Navigate videos to per-video .npy files.

Capability parity: /root/reference/datasets/minerl.py — tfds -> {idx}.npy
(T, H, W, C) uint8 per video. Requires tensorflow_datasets + the
minerl_navigate builder (network egress for the first download).
"""

import os
from pathlib import Path

import numpy as np


def main():
    import tensorflow_datasets as tfds  # gated: not in the base image
    import minerl_navigate  # noqa: F401  (registers the tfds builder)

    data_dir = Path(os.path.dirname(os.path.abspath(__file__)))
    out_root = data_dir / "minerl_navigate-torch"
    out_root.mkdir(exist_ok=True)
    for split in ["train", "test"]:
        out = out_root / split
        out.mkdir(exist_ok=True)
        ds = tfds.load("minerl_navigate", data_dir=str(data_dir), shuffle_files=False)[split]
        cnt = -1
        for cnt, item in enumerate(ds):
            np.save(out / f"{cnt}.npy", item["video"].numpy())
        print(f" [-] {cnt + 1} scenes in the {split} dataset")


if __name__ == "__main__":
    main()
