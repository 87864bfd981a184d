"""Data-loader throughput: native C++ path vs Python thread path.

Writes a synthetic .npy-per-video dataset to /tmp and measures sustained
(B, T, H, W, C)-batch throughput both ways.

Usage: python benchmarks/bench_loader.py [--videos 32] [--frames 300]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import os
import shutil
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=32)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--t", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="lfvdm_loader_bench_")
    train = os.path.join(root, "train")
    os.makedirs(train)
    rng = np.random.default_rng(0)
    for i in range(args.videos):
        np.save(os.path.join(train, f"{i}.npy"),
                rng.integers(0, 256, (args.frames, args.hw, args.hw, 3), dtype=np.uint8))
    video_mb = args.frames * args.hw * args.hw * 3 / 1e6
    print(f"dataset: {args.videos} videos x {video_mb:.1f} MB, window T={args.t}")

    import lfvdm_tpu.data.datasets as D

    D.video_data_paths_dict["synthetic_npy"] = root
    D.default_T_dict["synthetic_npy"] = args.t

    def measure(env_val, label):
        os.environ["LFVDM_NATIVE_LOADER"] = env_val
        # force re-resolution of the native lib availability per process is
        # not possible here, so gate via dataset-level monkeypatch instead:
        gen = D.load_data("minerl", batch_size=args.batch, T=args.t,
                          deterministic=False, seed=0)
        next(gen)  # warmup / spin up workers
        t0 = time.perf_counter()
        for _ in range(args.reps):
            b = next(gen)
        dt = time.perf_counter() - t0
        mb = args.reps * b.nbytes / 1e6
        print(f"{label:8s}: {args.reps / dt:7.1f} batches/s  "
              f"({mb / dt:8.1f} MB/s of f32 output)")
        return args.reps / dt

    D.video_data_paths_dict["minerl"] = root
    D.default_T_dict["minerl"] = args.t

    native = measure("1", "native")
    python = measure("0", "python")
    print(f"speedup: {native / python:.2f}x")
    shutil.rmtree(root, ignore_errors=True)  # loader threads may still hold fds


if __name__ == "__main__":
    main()
