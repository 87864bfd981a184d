"""Convert CARLA per-video .pt files to .npy so the native C++ loader
(lfvdm_tpu/native/videoloader.cpp) can stream them with partial window
reads. The .pt layout (torch zip) requires full-file deserialization per
item; frame-major .npy gives the loader O(window) IO instead of O(video).

Usage:
  python datasets/carla/convert_pt_to_npy.py --src datasets/carla/no-traffic \
      [--dst datasets/carla/no-traffic-npy]

Writes <stem>.npy next to (or flat under --dst) each video_*.pt /
encoded_video_*.pt found directly in --src (non-recursive), preserving
dtype (uint8 frames, float32 latents).
"""

import argparse
from pathlib import Path

import numpy as np
import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", default=None)
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    src = Path(args.src)
    dst = Path(args.dst) if args.dst else src
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for pt in sorted(src.glob("*video_*.pt")):
        out = dst / (pt.stem + ".npy")
        if out.exists() and not args.overwrite:
            continue
        arr = torch.load(pt, map_location="cpu", weights_only=False).detach().numpy()
        np.save(out, np.ascontiguousarray(arr))
        n += 1
        if n % 50 == 0:
            print(f"{n} converted...")
    print(f"done: {n} videos converted into {dst}")


if __name__ == "__main__":
    main()
