"""Drive convert_resnet152_state_dict + load_classifier_regressor_like_paper
against full-depth torch fixtures, comparing the whole coord-prediction chain.

Usage: python tests/fixtures/run_convert_resnet152.py <workdir>

This is the CARLA WD/PO metric path (reference carla_regressor.py:290-315):
torch .pt checkpoints -> converted Flax variables -> CoordPredictor
(classifier argmax cell -> per-cell regression head) vs the torch chain.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import torch_resnet_fixture as fx

workdir = sys.argv[1]
cls_path = os.path.join(workdir, "classifier.pt")
reg_path = os.path.join(workdir, "regressor.pt")

classifier = fx.randomize_(fx.ResNet152(), seed=11).eval()
regressor = fx.randomize_(fx.MultiHeadRegressor(), seed=22).eval()
torch.save(classifier.state_dict(), cls_path)
torch.save(regressor.state_dict(), reg_path)

from lfvdm_tpu.evals.carla_regressor import (
    load_classifier_regressor_like_paper,
    normalize_frames,
)

predictor = load_classifier_regressor_like_paper(cls_path, reg_path)

rng = np.random.default_rng(0)
frames = rng.uniform(0, 1, (4, 3, 64, 64)).astype(np.float32)  # (B, C, H, W)
got = predictor.predict_coords(frames)

with torch.no_grad():
    x = torch.tensor(normalize_frames(frames).transpose(0, 3, 1, 2))
    logits = classifier(x)
    cells = logits.argmax(dim=1)
    want = regressor(x, cells).numpy()

# Cell agreement first (argmax over 100 logits), then coord parity.
flax_logits = np.asarray(predictor._cls(
    np.asarray(normalize_frames(frames))))
np.testing.assert_allclose(flax_logits, logits.numpy(), rtol=1e-3, atol=1e-3)
assert (flax_logits.argmax(1) == cells.numpy()).all()
np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
print("coord parity OK")
print("RUNNER-OK")
