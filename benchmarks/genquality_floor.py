"""Detection floor of the tracked generative-quality gate.

FVD between two DISJOINT sets of REAL held-out synthetic videos — the
estimator's sampling-noise floor at the gate's N. A model whose score sits
at this floor is distributionally indistinguishable from real data *at this
sample size*; the gate can only resolve regressions that push the score
above it. BASELINE.md records the floor next to the per-round model rows so
"saturated at the floor" and "regressed above the floor" are separable
claims (VERDICT r3 weak item 2).

Usage (TPU, ~5 min):  python benchmarks/genquality_floor.py [--num_videos 100]
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "synthetic_longrange"])
    ap.add_argument("--num_videos", type=int, default=100)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from video_fvd import to_uint8_thwc  # the gate's exact conversion

    from lfvdm_tpu.data.datasets import get_test_dataset
    from lfvdm_tpu.evals.fvd import FVD, frechet_distance

    test_set = get_test_dataset(args.dataset, T=args.T)
    fvd = FVD(batch_size=args.batch_size)

    def feats(idx_lo):
        out = []
        for start in range(idx_lo, idx_lo + args.num_videos, args.batch_size):
            # Clamp the tail batch (mirrors video_fvd.py's pairing loop):
            # without it the last batch overran into [idx_lo+num_videos, ...),
            # making the two "disjoint" draws share videos and each side
            # N=112 instead of the gate's N=100 (ADVICE r4, medium).
            stop = min(start + args.batch_size, idx_lo + args.num_videos)
            batch = np.stack([
                to_uint8_thwc(np.asarray(test_set[i]), True)[: args.T]
                for i in range(start, stop)])
            out.append(fvd.extract_features(batch))
        return np.concatenate(out)

    # videos [0, N) are the gate's real side; [N, 2N) is a disjoint draw
    # from the SAME distribution
    a, b = feats(0), feats(args.num_videos)
    floor = frechet_distance(a, b)
    print(json.dumps({
        "metric": f"{args.dataset}_heldout_fvd_noise_floor",
        "value": round(float(floor), 6),
        "unit": "FVD (pinned-seed random I3D; real-vs-real disjoint draws)",
        "num_videos": args.num_videos,
        "note": "gate scores at/below this are indistinguishable from real "
                "at this N; regressions are detectable above it",
    }))


if __name__ == "__main__":
    main()
