"""End-to-end video_make_mp4.py: reference grid semantics on a fake eval dir.

Reference behavior (/root/reference/scripts/video_make_mp4.py): the first
``do_n`` videos, GT (red-marked) over ``n_seeds`` samples per video stacked
along height, videos concatenated along width, one ``{do_n}_{n_seeds}.gif``.
"""

import importlib
import json
import sys
from pathlib import Path

import numpy as np

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def _load_script():
    sys.path.insert(0, str(SCRIPTS))
    try:
        return importlib.import_module("video_make_mp4")
    finally:
        sys.path.pop(0)


def _fake_eval_dir(tmp_path, do_n=2, seeds=(0, 1), T=4, C=3, H=8):
    samples = tmp_path / "samples"
    samples.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for vi in range(do_n):
        for si in seeds:
            arr = rng.integers(0, 255, (T, C, H, H), dtype=np.uint8)
            np.save(samples / f"sample_{vi:04d}-{si}.npy", arr)
    (tmp_path / "model_config.json").write_text(json.dumps({"dataset": "synthetic"}))
    return tmp_path


def test_make_gif_grid(tmp_path, monkeypatch):
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path, H=64)  # synthetic GT is 64x64
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--do_n", "2",
        "--n_seeds", "2", "--obs_length", "2", "--format", "gif",
        "--dataset", "synthetic", "--T", "4"])
    mod.main()
    out = eval_dir / "videos" / "2_2.gif"
    assert out.exists() and out.stat().st_size > 0


def test_make_gif_no_gt_skips_dataset(tmp_path, monkeypatch):
    """--add_gt False must not touch model_config.json or the dataset."""
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path)
    (eval_dir / "model_config.json").unlink()  # would crash if read
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--do_n", "1",
        "--n_seeds", "2", "--add_gt", "False"])
    mod.main()
    assert (eval_dir / "videos" / "1_2.gif").exists()


def test_missing_seed_is_skipped(tmp_path, monkeypatch):
    """Seed gaps are skipped (reference's PermissionError loop ~:48-60)."""
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path, do_n=1, seeds=(1, 3))
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--do_n", "1",
        "--n_seeds", "2", "--add_gt", "False"])
    mod.main()
    assert (eval_dir / "videos" / "1_2.gif").exists()


def test_make_mp4_decodes(tmp_path, monkeypatch):
    """mp4 export works without the ffmpeg CLI (cv2 fallback) and the file
    decodes back to the right frame count."""
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path, do_n=1, T=5)
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--do_n", "1",
        "--n_seeds", "2", "--add_gt", "False", "--format", "mp4"])
    mod.main()
    out = eval_dir / "videos" / "1_2.mp4"
    assert out.exists()
    import cv2

    cap = cv2.VideoCapture(str(out))
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5


def test_out_dir_override(tmp_path, monkeypatch):
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path / "eval", do_n=1)
    out_base = tmp_path / "elsewhere"
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--out_dir",
        str(out_base), "--add_gt", "False"])
    mod.main()
    assert (out_base / "videos" / "1_1.gif").exists()


def test_last_seed_at_boundary_succeeds(tmp_path, monkeypatch):
    """Finding the final needed sample at seed index 99 must succeed — the
    not-enough-seeds assert only fires when the search must continue."""
    mod = _load_script()
    eval_dir = _fake_eval_dir(tmp_path, do_n=1, seeds=(99,))
    monkeypatch.setattr(sys, "argv", [
        "video_make_mp4.py", "--eval_dir", str(eval_dir), "--do_n", "1",
        "--n_seeds", "1", "--add_gt", "False"])
    mod.main()
    assert (eval_dir / "videos" / "1_1.gif").exists()


def test_nonrgb_channel_counts_export(tmp_path):
    """2- and 4-channel videos (synthetic debug / raw-latent saves) export
    through every writer, including the hermetic cv2 fallback."""
    from lfvdm_tpu.utils import video_io

    for C in (1, 2, 4):
        arr = np.random.default_rng(C).integers(
            0, 255, (3, C, 16, 16), dtype=np.uint8)
        gif = tmp_path / f"c{C}.gif"
        video_io.tensor2gif(arr, gif)
        assert gif.stat().st_size > 0
        avi = tmp_path / f"c{C}.avi"
        video_io._cv2_write(video_io._to_uint8_thwc(arr, (0, 255)), avi,
                            fourcc="MJPG")
        assert avi.stat().st_size > 0
