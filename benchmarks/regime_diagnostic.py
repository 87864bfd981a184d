"""Mechanism diagnostic for the long-range scheme contrast (BASELINE.md r5).

Re-derives the hidden regime track (stripe orientation per frame) of
synthetic_longrange sample files by template correlation — the same
re-derivation tests/test_datasets.py pins against ground truth on real
videos — then summarizes the GLOBAL consistency statistic the dataset is
built around: real videos keep one segment length s for the whole video, so
their interior segment lengths have zero within-video spread. A sampler that
loses long-range state (a sliding autoregressive window cannot see when the
current regime began once it outlasts the window) produces memoryless
switches -> positive spread and off-distribution segment lengths. This
separates the FVD contrast's MECHANISM from the metric.

Usage: python benchmarks/regime_diagnostic.py --samples_dir <...>/samples \
           [--num_videos 100] [--json]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import os

import numpy as np


def regime_track(vid_uint8: np.ndarray, n_phases: int = 32) -> np.ndarray:
    """(T, 3, H, W) uint8 -> (T,) 0/1 orientation track (channel 0)."""
    vid = vid_uint8[:, 0].astype(np.float32) / 127.5 - 1.0
    T, H, W = vid.shape
    y = np.linspace(0, 2 * np.pi, H).reshape(-1, 1)
    x = np.linspace(0, 2 * np.pi, W).reshape(1, -1)
    phases = np.linspace(0, 2 * np.pi, n_phases, endpoint=False)
    # (2, P, H, W) template bank: orientation sign x phase
    bank = np.stack([
        np.stack([np.sin(2 * x + 2 * sign * y + p) for p in phases])
        for sign in (+1, -1)])
    # correlate every frame against the bank; best phase per orientation
    scores = np.einsum("thw,ophw->top", vid, bank) / (H * W)
    best = scores.max(axis=2)  # (T, 2)
    return (best[:, 1] > best[:, 0]).astype(np.int64)


def interior_segments(track: np.ndarray) -> list:
    """Lengths of segments fully inside the video (first/last are censored)."""
    switch = np.flatnonzero(np.diff(track)) + 1
    if len(switch) < 2:
        return []
    return list(np.diff(switch))


def summarize(samples_dir: str, num_videos: int, sample_idx: int = 0) -> dict:
    spreads, all_lens, n_with = [], [], 0
    for i in range(num_videos):
        p = os.path.join(samples_dir, f"sample_{i:04d}-{sample_idx}.npy")
        segs = interior_segments(regime_track(np.load(p)))
        all_lens.extend(segs)
        if len(segs) >= 2:
            n_with += 1
            spreads.append(float(np.max(segs) - np.min(segs)))
    return {
        "num_videos": num_videos,
        "videos_with_2plus_interior_segments": n_with,
        # 0 for every real video (s constant within video)
        "mean_within_video_segment_spread": round(float(np.mean(spreads)), 3) if spreads else None,
        "frac_videos_with_nonzero_spread": round(
            float(np.mean([s > 0 for s in spreads])), 3) if spreads else None,
        "segment_len_mean": round(float(np.mean(all_lens)), 2) if all_lens else None,
        "segment_len_min": int(np.min(all_lens)) if all_lens else None,
        "segment_len_max": int(np.max(all_lens)) if all_lens else None,
        # dataset truth: every segment length lies in [S_MIN, S_MAX]
        "frac_segments_outside_25_45": round(
            float(np.mean([(l < 25) or (l > 45) for l in all_lens])), 3) if all_lens else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples_dir", required=True)
    ap.add_argument("--num_videos", type=int, default=100)
    ap.add_argument("--sample_idx", type=int, default=0)
    args = ap.parse_args()
    print(json.dumps({"samples_dir": args.samples_dir,
                      **summarize(args.samples_dir, args.num_videos,
                                  args.sample_idx)}))


if __name__ == "__main__":
    main()
