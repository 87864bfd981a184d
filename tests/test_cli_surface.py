"""CLI flag-surface parity: our scripts accept every reference flag.

A reference user's launch commands must work verbatim. The reference's flag
surface is extracted by AST (its scripts import wandb/mpi4py, absent here):
the ``defaults = dict(...)`` literal inside ``create_argparser`` plus
explicit ``add_argument("--flag")`` calls. Each flag must be accepted by
the corresponding script's parser, modulo documented TPU renames/drops.
"""

import ast
import importlib
import sys
from pathlib import Path

import pytest

REF_SCRIPTS = Path("/root/reference/scripts")
OUR_SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"

# reference flag -> our flag (None = intentionally dropped, with the reason)
RENAMES = {
    "use_fp16": None,            # bf16 torso is the default; no fp16 machinery
    "fp16_scale_growth": None,   # loss-scale knob, meaningless under bf16
    "num_workers": None,         # torch DataLoader workers -> native loader
                                 # threads (LFVDM_LOADER_THREADS env)
    "resume_checkpoint": "resume",  # orbax run-dir resume (+ --resume_id)
    "device": None,              # torch device picker; JAX owns placement
}


def _ref_flags(script):
    tree = ast.parse((REF_SCRIPTS / script).read_text())
    flags = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            if (len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                    and node.targets[0].id == "defaults"
                    and isinstance(node.value, ast.Call)
                    and isinstance(node.value.func, ast.Name)
                    and node.value.func.id == "dict"):
                flags |= {kw.arg for kw in node.value.keywords if kw.arg}
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            if node.func.attr == "add_argument":
                for a in node.args:
                    if isinstance(a, ast.Constant) and str(a.value).startswith("--"):
                        flags.add(str(a.value)[2:])
    return flags


def _our_parser(script):
    sys.path.insert(0, str(OUR_SCRIPTS))
    try:
        mod = importlib.import_module(script[:-3])
    finally:
        sys.path.pop(0)
    return mod.create_argparser()


def _accepted(parser):
    out = set()
    for action in parser._actions:
        for opt in action.option_strings:
            if opt.startswith("--"):
                out.add(opt[2:])
    return out


@pytest.mark.parametrize("script", ["video_train.py", "video_sample.py",
                                    "video_fvd.py", "video_make_mp4.py",
                                    "video_to_world_coords.py"])
def test_reference_flags_accepted(script):
    ref = _ref_flags(script)
    ours = _accepted(_our_parser(script))
    missing = []
    for flag in sorted(ref):
        mapped = RENAMES.get(flag, flag)
        if mapped is None:
            continue
        if mapped not in ours:
            missing.append(flag)
    assert not missing, (
        f"{script}: reference flags with no counterpart here: {missing}"
    )
