"""Train the CARLA world-coordinate classifier / multi-head regressor.

Capability parity: /root/reference/improved_diffusion/carla_regressor.py:220-287
and scripts/carla_regressor_train.py — per-frame dataset exploded from
videos, SGD+momentum with step LR decay, best-checkpoint selection on test
loss. JAX/optax implementation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lfvdm_tpu.config import str2bool
from lfvdm_tpu.evals.carla_regressor import (
    MultiHeadResNet152,
    ResNet152Classifier,
    get_cell,
    normalize_frames,
)


class CarlaRegressorFrames:
    """Per-frame (frame, coord, cell) dataset exploded from video files."""

    def __init__(self, train: bool, path: str):
        import torch

        self.video_path = Path(path)
        self.path = self.video_path / "individual-frames" / ("train" if train else "test")
        split = self.video_path / f"video_{'train' if train else 'test'}.csv"
        with open(split) as f:
            fnames = [l.rstrip("\n").split("/")[-1] for l in f if ".pt" in l]
        self.path.mkdir(parents=True, exist_ok=True)
        if len(list(self.path.glob("video_*_frame_0.npy"))) != len(fnames):
            for fname in fnames:
                coords_fname = fname.replace(".pt", ".npy").replace("video_", "coords_")
                video = torch.load(self.video_path / fname, weights_only=False).numpy()
                coords = np.load(self.video_path / coords_fname)
                for i, (frame, coord) in enumerate(zip(video, coords)):
                    np.save(self.path / fname.replace(".pt", f"_frame_{i}.npy"), frame)
                    np.save(self.path / coords_fname.replace(".npy", f"_frame_{i}.npy"), coord)
        self.paths = sorted(self.path.glob("video_*.npy"))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        img = np.load(self.paths[idx])  # (H, W, C) uint8
        coord = np.load(str(self.paths[idx]).replace("video", "coords"))[[0, 1]]
        return img.transpose(2, 0, 1), coord.astype(np.float32), get_cell(coord)


def batches(dataset, batch_size, rng, shuffle=True):
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        items = [dataset[j] for j in order[i:i + batch_size]]
        frames = normalize_frames(np.stack([x[0] for x in items]))
        coords = np.stack([x[1] for x in items])
        cells = np.array([x[2] for x in items], np.int32)
        yield jnp.asarray(frames), jnp.asarray(coords), jnp.asarray(cells)


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    parser = argparse.ArgumentParser()
    parser.add_argument("--is_classifier", type=str2bool, default=False)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--num_epochs", type=int, default=25)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--out_dir", type=str, default="checkpoints/carla_regressor")
    args = parser.parse_args()

    model = ResNet152Classifier() if args.is_classifier else MultiHeadResNet152()
    rng = np.random.default_rng(0)
    train_set = CarlaRegressorFrames(True, args.data_dir)
    test_set = CarlaRegressorFrames(False, args.data_dir)

    f0, c0, cell0 = next(batches(train_set, args.batch_size, rng))
    variables = model.init(jax.random.PRNGKey(0), f0) if args.is_classifier else \
        model.init(jax.random.PRNGKey(0), f0, cell0)

    # SGD momentum 0.9, step decay x0.1 every 7 epochs (carla_regressor.py:228-229)
    steps_per_epoch = max(1, len(train_set) // args.batch_size)
    schedule = optax.exponential_decay(args.lr, 7 * steps_per_epoch, 0.1, staircase=True)
    tx = optax.sgd(schedule, momentum=0.9)
    opt_state = tx.init(variables["params"])

    # BatchNorm runs in train mode (batch stats + running-stat updates),
    # matching the reference's torch model.train() (carla_regressor.py:239);
    # eval uses the running averages like model.eval().
    @jax.jit
    def train_step(params, batch_stats, opt_state, frames, coords, cells):
        def loss_fn(p):
            v = {"params": p, "batch_stats": batch_stats}
            if args.is_classifier:
                logits, mut = model.apply(v, frames, train=True,
                                          mutable=["batch_stats"])
                onehot = jax.nn.one_hot(cells, 100)
                loss = optax.sigmoid_binary_cross_entropy(logits, onehot).mean()
            else:
                pred, mut = model.apply(v, frames, cells, train=True,
                                        mutable=["batch_stats"])
                loss = jnp.mean((pred - coords) ** 2)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def eval_loss(params, batch_stats, frames, coords, cells):
        v = {"params": params, "batch_stats": batch_stats}
        if args.is_classifier:
            logits = model.apply(v, frames)
            return optax.sigmoid_binary_cross_entropy(logits, jax.nn.one_hot(cells, 100)).mean()
        return jnp.mean((model.apply(v, frames, cells) - coords) ** 2)

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    best_loss = np.inf
    os.makedirs(args.out_dir, exist_ok=True)
    for epoch in range(args.num_epochs):
        train_loss, n = 0.0, 0
        for frames, coords, cells in batches(train_set, args.batch_size, rng):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, frames, coords, cells)
            train_loss += float(loss) * len(frames)
            n += len(frames)
        test_loss, m = 0.0, 0
        for frames, coords, cells in batches(test_set, args.batch_size, rng, shuffle=False):
            test_loss += float(eval_loss(params, batch_stats, frames, coords, cells)) * len(frames)
            m += len(frames)
        train_loss, test_loss = train_loss / max(n, 1), test_loss / max(m, 1)
        print(f"epoch {epoch}: train {train_loss:.4f} test {test_loss:.4f}")
        if test_loss < best_loss:
            best_loss = test_loss
            with open(os.path.join(args.out_dir, f"model_{epoch}.npz"), "wb") as f:
                flat = jax.tree_util.tree_flatten_with_path(
                    {"params": params, "batch_stats": batch_stats})[0]
                np.savez(f, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    print(f"best test loss: {best_loss:.4f}")


if __name__ == "__main__":
    main()
