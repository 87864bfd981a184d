"""Write video_{train,test}.csv: last 100 videos become the test split.

Capability parity: /root/reference/datasets/carla/make_train_test_split.py.
"""

import argparse
import glob
import os
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, required=True,
                        help="Directory containing all train/test videos.")
    args = parser.parse_args()

    indexed = {}
    for p in glob.glob(os.path.join(args.dir, "video_*.pt")):
        path = Path(p)
        indexed[int(path.stem.split("_")[1])] = path
    idxs = sorted(indexed)
    train_idxs, test_idxs = idxs[:-100], idxs[-100:]

    def rows(indices, start=0):
        lines = [",path"]
        lines += [f"{start + i},{indexed[idx]}" for i, idx in enumerate(indices)]
        return "\n".join(lines) + "\n"

    Path(args.dir, "video_train.csv").write_text(rows(train_idxs))
    Path(args.dir, "video_test.csv").write_text(rows(test_idxs, start=len(train_idxs)))
    print(f"train: {len(train_idxs)} videos, test: {len(test_idxs)} videos")


if __name__ == "__main__":
    main()
