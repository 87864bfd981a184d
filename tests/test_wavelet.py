"""Live wavelet diffusion space (fast tier).

The reference sketches this space but ships it NotImplemented everywhere
(gaussian_diffusion.py:908-909,929-930,946-947) with broken scratch in
dwt.py (duplicate defs, missing numpy import, lossy `//4` math, non-inverse
inverse). Pins for the working replacement (lfvdm_tpu/diffusion/wavelet.py):
exact invertibility, isometry (noise whiteness preserved — required for the
diffusion math to transfer unchanged), the codec factory path, and the
video_train.py config derivation (in_channels = 3*4^L, image_size /= 2^L).
"""

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

from lfvdm_tpu.diffusion.codecs import WaveletCodec, make_codec, make_codec_from_config
from lfvdm_tpu.diffusion.wavelet import (
    haar_dwt2,
    haar_idwt2,
    wavelet_pack,
    wavelet_unpack,
)


@pytest.mark.parametrize("levels", [1, 2])
def test_pack_unpack_roundtrip(levels):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 3, 16, 16)).astype(np.float32)
    y = np.asarray(wavelet_pack(x, levels))
    assert y.shape == (2, 3, 3 * 4**levels, 16 // 2**levels, 16 // 2**levels)
    back = np.asarray(wavelet_unpack(y, levels))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_transform_is_an_isometry():
    """Orthonormal per level: norms preserved, so N(0,I) noise stays N(0,I)
    in wavelet space and the beta schedule transfers unchanged."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    y = np.asarray(wavelet_pack(x, 2))  # f32 on device (jax x64 disabled)
    np.testing.assert_allclose(np.linalg.norm(y), np.linalg.norm(x), rtol=1e-6)
    # large-sample whiteness: mean ~0, std ~1 in subband space
    z = np.asarray(wavelet_pack(rng.standard_normal((64, 3, 32, 32)), 1))
    assert abs(z.mean()) < 0.01 and abs(z.std() - 1.0) < 0.01


def test_single_level_matches_known_block():
    # one 2x2 block [[a,b],[c,d]] -> LL=(a+b+c+d)/2 etc (orthonormal Haar)
    x = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32).reshape(1, 2, 2)
    y = np.asarray(haar_dwt2(x)).reshape(-1)
    np.testing.assert_allclose(y, [5.0, -1.0, -2.0, 0.0])  # [LL, LH, HL, HH]
    np.testing.assert_allclose(np.asarray(haar_idwt2(y.reshape(4, 1, 1))),
                               x, atol=1e-6)


def test_odd_sizes_rejected():
    with pytest.raises(AssertionError, match="even"):
        haar_dwt2(np.zeros((3, 5, 6), np.float32))


def test_codec_factory_builds_wavelet_codec():
    codec = make_codec("wavelet", wavelet_levels=2)
    assert isinstance(codec, WaveletCodec) and codec.levels == 2
    codec2 = make_codec_from_config({"diffusion_space": "wavelet",
                                     "wavelet_levels": 2})
    assert isinstance(codec2, WaveletCodec) and codec2.levels == 2
    x = np.random.default_rng(2).standard_normal((1, 2, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(codec2.decode(codec2.encode(x))),
                               x, atol=1e-6)


def test_video_train_derives_wavelet_config(monkeypatch, tmp_path):
    """video_train.py --diffusion_space wavelet: model channels/size derive
    from the level count and the codec reaching TrainLoop is a WaveletCodec."""
    scripts = Path(__file__).resolve().parents[1] / "scripts"
    sys.path.insert(0, str(scripts))
    try:
        vt = importlib.import_module("video_train")
    finally:
        sys.path.pop(0)

    captured = {}

    class _CaptureLoop:
        def __init__(self, **kwargs):
            captured.update(kwargs)

        def run_loop(self, max_steps=None):
            pass

    monkeypatch.setattr(vt, "TrainLoop", _CaptureLoop)
    monkeypatch.setattr(sys, "argv", [
        "video_train.py", "--dataset", "synthetic",
        "--diffusion_space", "wavelet", "--wavelet_levels", "1",
        "--sample_interval", "0", "--batch_size", "1",
        "--num_channels", "32", "--num_res_blocks", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ])
    vt.main()
    cfg = captured["config"]
    assert cfg["in_channels"] == 12            # 3 * 4^1
    assert cfg["image_size"] == 32             # synthetic 64px / 2^1
    assert isinstance(captured["codec"], WaveletCodec)
