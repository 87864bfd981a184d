"""Can the gate's FVD see segment-statistic violations AT ALL? (round 5)

The scheme contrast on synthetic_longrange is mechanically open (autoreg
emits 67-frame segments no real video has — regime_diagnostic.py) but the
FVD shows no contrast. Before concluding anything from trained models, this
calibrates the METRIC: surrogate sides built from the TRUE generator —
pixel-perfect draws except for a controlled corruption of the regime track —
isolate each failure mode a windowed sampler produces:

  real2      a second disjoint real draw (the noise floor)
  iid3       segments ~ geometric(mean 3) — the fragmentation failure
             (what both schemes emit at 12k training steps)
  memoryless segments ~ geometric(mean s̄) — the hazard-without-memory
             failure an autoregressive window is FORCED into (right
             transition density, wrong length distribution: geometric vs
             the real uniform-[25,45] with zero within-video spread)
  overlong   per-video constant segment length 2s (out-of-support lengths,
             HALF the real transition density — autoreg's over-persistence)

Each is scored by the production scorer at temporal stride 1 (the gate's
protocol) and stride 8 (aux protocol: 25-45-frame segments become 3-6
feature-timescale samples, moving the statistic into the receptive window
of early conv layers). A mode whose score sits at the real2 floor is
INVISIBLE to that protocol — trained-model comparisons on it are
uninformative no matter how long training runs.

Usage (TPU, ~15 min): python benchmarks/fvd_sensitivity_longrange.py
"""

import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json

import numpy as np


def geometric_track(rng, T, mean_seg):
    track, cur = [], int(rng.integers(0, 2))
    while len(track) < T:
        seg = 1 + int(rng.geometric(1.0 / mean_seg))
        track.extend([cur] * seg)
        cur = 1 - cur
    return np.asarray(track[:T])


def constant_track(rng, T, seg_len):
    phase = int(rng.integers(0, 2 * seg_len))
    return ((np.arange(T) + phase) // seg_len) % 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_videos", type=int, default=100)
    ap.add_argument("--T", type=int, default=100)
    args = ap.parse_args()

    from lfvdm_tpu.config import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()

    from lfvdm_tpu.data.datasets import SyntheticLongRangeDataset
    from lfvdm_tpu.evals.fvd import FVD, frechet_distance

    N, T = args.num_videos, args.T
    ds = SyntheticLongRangeDataset(T=T)
    ds.set_test()
    ds.CACHE_CAP = 1  # one-shot sweep; don't pin ~500 MB

    def to_u8(v):
        return (((v + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
                .transpose(0, 2, 3, 1))

    def corrupted_side(name):
        """Videos i=0..N-1 with seed-matched carriers, corrupted tracks."""
        vids = []
        for i in range(N):
            seed = ds.seed + i
            rng = np.random.default_rng(seed + 777_000)  # corruption stream
            s, phase0, v, psi, _ = ds.regime_params(seed)
            if name == "real":
                track = ((np.arange(T) + phase0) // s) % 2
            elif name == "iid3":
                track = geometric_track(rng, T, 3.0)
            elif name == "memoryless":
                track = geometric_track(rng, T, float(s))
            elif name == "overlong":
                track = constant_track(rng, T, 2 * s)
            vids.append(to_u8(ds.generate_with_track(seed, track)))
        return np.stack(vids)

    def real_disjoint():
        return np.stack([to_u8(np.asarray(ds[i])) for i in range(N, 2 * N)])

    fvd = FVD(batch_size=16)

    def feats(videos, stride):
        return fvd.extract_features(videos[:, ::stride])

    sides = {
        "real2_floor": real_disjoint(),
        "iid3": corrupted_side("iid3"),
        "memoryless": corrupted_side("memoryless"),
        "overlong": corrupted_side("overlong"),
    }
    base = corrupted_side("real")  # == the gate's real side, rendered identically
    out = {"num_videos": N, "T": T}
    for stride in (1, 8):
        ref = feats(base, stride)
        for name, vids in sides.items():
            score = frechet_distance(ref, feats(vids, stride))
            out[f"fvd_stride{stride}_{name}"] = round(float(score), 7)
            print(f"stride {stride} {name}: {score:.7f}", flush=True)
    print(json.dumps({"metric": "longrange_fvd_sensitivity", **out}))


if __name__ == "__main__":
    main()
