"""Glue pins for benchmarks/genquality_fvd.py (fast tier).

The pipeline itself (train -> sample -> FVD through the three production
CLIs) runs on TPU per round (BASELINE.md row); here the script's plumbing is
pinned with a monkeypatched `run`: the CLI arguments it passes, the
scheme-subdir resolution between video_sample.py and video_fvd.py, the FVD
stdout parse (fresh AND idempotent formats), and the JSON line it prints.
"""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

import pytest

BENCH = Path(__file__).resolve().parents[1] / "benchmarks" / "genquality_fvd.py"


@pytest.fixture
def genq():
    sys.path.insert(0, str(BENCH.parent))  # resolves the `import _path` shim
    try:
        spec = importlib.util.spec_from_file_location("genquality_fvd", BENCH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def _drive(genq, monkeypatch, tmp_path, fvd_stdout, argv_extra=()):
    calls = []

    def fake_run(cmd, **kw):
        calls.append([str(c) for c in cmd])
        script = str(cmd[0])
        if "video_sample" in script:
            eval_dir = str(cmd[cmd.index("--eval_dir") + 1])
            scheme = str(cmd[cmd.index("--sampling_scheme") + 1])
            os.makedirs(os.path.join(eval_dir, f"{scheme}_10_5_48_10"),
                        exist_ok=True)
        if "video_fvd" in script:
            return fvd_stdout
        return ""

    monkeypatch.setattr(genq, "run", fake_run)
    monkeypatch.setattr(sys, "argv", [
        "genquality_fvd.py", "--workdir", str(tmp_path), "--T", "48",
        "--num_videos", "8", "--train_steps", "5", *argv_extra,
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        genq.main()
    return calls, json.loads(buf.getvalue().strip().splitlines()[-1])


def test_pipeline_glue_and_json_line(genq, monkeypatch, tmp_path):
    calls, out = _drive(genq, monkeypatch, tmp_path, "blah\nFVD: 0.004134\n")
    # three production CLIs, in order
    assert [c[0].split("/")[-1] for c in calls] == [
        "video_train.py", "video_sample.py", "video_fvd.py"]
    # video_fvd consumes the SCHEME SUBDIR video_sample created, not --eval_dir
    fvd_cmd = calls[2]
    assert fvd_cmd[fvd_cmd.index("--eval_dir") + 1].endswith(
        "hierarchy-2_10_5_48_10")
    # value keeps 6 decimals (random-I3D FVDs are ~4e-3; 2-decimal rounding
    # would erase the round-over-round signal)
    assert out["value"] == 0.004134
    assert out["metric"] == "synthetic_heldout_fvd_hierarchy2_randi3d"
    assert out["num_videos"] == 8 and out["train_steps"] == 5


def test_parses_idempotent_fvd_format(genq, monkeypatch, tmp_path):
    _, out = _drive(genq, monkeypatch, tmp_path,
                    "fvd-8-0.txt exists: FVD = 0.123456\n")
    assert out["value"] == 0.123456


def test_sampling_scheme_flag_threads_through(genq, monkeypatch, tmp_path):
    # The FVD-246 counterpart row (reference README.md:80-84): the scheme
    # flag must reach video_sample.py, steer the subdir resolution, and
    # rename the metric. "autoreg" is the actual registry key
    # (lfvdm_tpu/sampling/schemes.py + reference sampling_schemes.py:389-399).
    calls, out = _drive(genq, monkeypatch, tmp_path, "FVD: 0.5\n",
                        argv_extra=("--sampling_scheme", "autoreg",
                                    "--skip_train"))
    sample_cmd = calls[0]
    assert sample_cmd[sample_cmd.index("--sampling_scheme") + 1] == "autoreg"
    fvd_cmd = calls[1]
    assert fvd_cmd[fvd_cmd.index("--eval_dir") + 1].endswith(
        "autoreg_10_5_48_10")
    assert out["metric"] == "synthetic_heldout_fvd_autoreg_randi3d"


def test_sampling_scheme_validated_against_registry(genq, monkeypatch, tmp_path):
    # A non-registry key must fail at argparse time, not 10 minutes in at
    # the video_sample.py step (ADVICE r3: 'autoregressive' is not a key).
    with pytest.raises(SystemExit):
        _drive(genq, monkeypatch, tmp_path, "FVD: 0.5\n",
               argv_extra=("--sampling_scheme", "autoregressive",
                           "--skip_train"))


def test_subdir_match_is_prefix_exact(genq, monkeypatch, tmp_path):
    # A stale adaptive-autoreg_* dir in a reused --workdir must not trip
    # the len==1 assertion when scoring plain autoreg (ADVICE r3, low).
    stale = tmp_path / "samples" / "adaptive-autoreg_10_5_48_10"
    stale.mkdir(parents=True)
    calls, out = _drive(genq, monkeypatch, tmp_path, "FVD: 0.5\n",
                        argv_extra=("--sampling_scheme", "autoreg",
                                    "--skip_train"))
    fvd_cmd = calls[1]
    assert fvd_cmd[fvd_cmd.index("--eval_dir") + 1].endswith(
        "/autoreg_10_5_48_10")


def test_skip_train_omits_train_cli(genq, monkeypatch, tmp_path):
    calls, _ = _drive(genq, monkeypatch, tmp_path, "FVD: 1.0\n",
                      argv_extra=("--skip_train",))
    assert [c[0].split("/")[-1] for c in calls] == [
        "video_sample.py", "video_fvd.py"]


def test_diffusion_space_threads_to_train_and_metric(genq, monkeypatch, tmp_path):
    # The wavelet quality row (BASELINE.md): --diffusion_space must reach
    # video_train.py (the ckpt embeds it; sample/fvd read it from there)
    # and tag the metric so rows stay distinguishable.
    calls, out = _drive(genq, monkeypatch, tmp_path, "FVD: 0.5\n",
                        argv_extra=("--diffusion_space", "wavelet"))
    train_cmd = calls[0]
    assert train_cmd[train_cmd.index("--diffusion_space") + 1] == "wavelet"
    assert train_cmd[train_cmd.index("--wavelet_levels") + 1] == "1"
    assert out["metric"] == "synthetic_heldout_fvd_hierarchy2_wavelet_randi3d"
    assert "space=wavelet" in out["config"]
