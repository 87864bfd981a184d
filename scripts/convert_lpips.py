"""Convert `lpips` (pip) AlexNet-LPIPS weights to the Flax embedder .npz.

Run in an environment with ``pip install lpips`` (needs egress for the first
download). Saves conv kernels NHWC-transposed plus the nonneg head weights,
then numerically validates: ||e(x)-e(y)||² must equal lpips(x, y).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="weights/lpips_alex.npz")
    args = parser.parse_args()

    import lpips
    import torch

    net = lpips.LPIPS(net="alex", spatial=False)
    net.eval()

    out = {}
    convs = [m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5
    for i, conv in enumerate(convs, start=1):
        out[f"conv{i}.kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}.bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy().reshape(-1)  # (C,)
        out[f"lin{i}"] = w

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **out)
    print(f"saved {args.out}")

    # validate: embedding distance == LPIPS distance
    from lfvdm_tpu.evals.lpips import LpipsEmbedder

    emb = LpipsEmbedder(weights_path=args.out)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    ours = ((emb(x) - emb(y)) ** 2).sum(axis=1)
    ref = net(torch.tensor(x), torch.tensor(y)).detach().numpy().reshape(-1)
    print("ours:", ours, "ref:", ref)
    np.testing.assert_allclose(ours, ref, rtol=1e-3)
    print("validation OK")


if __name__ == "__main__":
    main()
