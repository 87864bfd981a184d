"""Export GQN-Mazes videos to per-video .npy files.

Capability parity: /root/reference/datasets/mazes.py — a tfds builder that
downloads gqn_mazes.zip from archive.org (mp4 videos, 64x64), then exports
each video as {idx}.npy (T, H, W, C) uint8. Requires tensorflow_datasets and
network egress.
"""

import os
from pathlib import Path

import numpy as np

_DOWNLOAD_URL = "https://archive.org/download/gqn_mazes/gqn_mazes.zip"


def make_builder():
    import tensorflow_datasets as tfds  # gated: not in the base image

    class GqnMazes(tfds.core.GeneratorBasedBuilder):
        """GQN Mazes (Clockwork VAE split), videos of shape (None, 64, 64, 3)."""

        VERSION = tfds.core.Version("1.0.0")
        RELEASE_NOTES = {"1.0.0": "Initial release."}

        def _info(self):
            return tfds.core.DatasetInfo(
                builder=self,
                features=tfds.features.FeaturesDict(
                    {"video": tfds.features.Video(shape=(None, 64, 64, 3))}
                ),
                supervised_keys=None,
                homepage="https://archive.org/details/gqn_mazes",
            )

        def _split_generators(self, dl_manager):
            path = dl_manager.download_and_extract(_DOWNLOAD_URL)
            return {
                "train": self._generate_examples(path / "train"),
                "test": self._generate_examples(path / "test"),
            }

        def _generate_examples(self, path):
            for f in path.glob("*.mp4"):
                yield str(f), {"video": str(f.resolve())}

    return GqnMazes


def main():
    import tensorflow_datasets as tfds

    data_dir = Path(os.path.dirname(os.path.abspath(__file__)))
    builder = make_builder()(data_dir=str(data_dir))
    builder.download_and_prepare()
    out_root = data_dir / "gqn_mazes-torch"
    out_root.mkdir(exist_ok=True)
    for split in ["train", "test"]:
        out = out_root / split
        out.mkdir(exist_ok=True)
        ds = tfds.load("gqn_mazes", data_dir=str(data_dir), shuffle_files=False)[split]
        cnt = -1
        for cnt, item in enumerate(ds):
            np.save(out / f"{cnt}.npy", item["video"].numpy())
        print(f" [-] {cnt + 1} scenes in the {split} dataset")


if __name__ == "__main__":
    main()
