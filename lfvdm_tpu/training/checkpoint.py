"""Checkpoint save/resume (orbax) with embedded config.

Capability parity: /root/reference/improved_diffusion/train_util.py:373-420,
486-527 — each checkpoint stores {params, per-rate EMA params, optimizer
state, step, full config}, resume discovers the latest step in a run dir,
and evaluation can reconstruct the model from a checkpoint path alone
(video_sample.py:205-213).

Layout: <dir>/<step>/{state...} via orbax; <dir>/config.json holds the run
config. Orbax handles multi-host IO natively, replacing the reference's
MPI byte-broadcast of checkpoint files (dist_util.py:53-63).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Dict[str, Any],
                    config: Optional[Dict] = None):
    """Save a training-state pytree at <ckpt_dir>/<step>; embed config JSON."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    if config is not None and jax.process_index() == 0:
        cfg_path = os.path.join(ckpt_dir, "config.json")
        if not os.path.exists(cfg_path):
            with open(cfg_path, "w") as f:
                json.dump({k: v for k, v in config.items()
                           if isinstance(v, (str, int, float, bool, list, tuple, type(None)))},
                          f, indent=2)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, str(step)), state, force=True)


def find_latest_step(ckpt_dir: str) -> Optional[int]:
    """Max-step discovery, the resume-by-latest rule (train_util.py:508-517)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def load_checkpoint(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    """Restore (state, step, config). ``abstract_state`` gives the pytree
    structure/shapes (e.g. jax.eval_shape of the init fn)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = find_latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, str(step)), abstract_state)
    config = {}
    cfg_path = os.path.join(ckpt_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, step, config


def load_checkpoint_raw(ckpt_dir: str, step: Optional[int] = None):
    """Restore (state, step, config) without an abstract template — shapes
    and dtypes come from the checkpoint metadata (arrays load as host
    numpy). Used by export/eval tools that don't rebuild the train state."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = find_latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, str(step)))
    config = {}
    cfg_path = os.path.join(ckpt_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, step, config


def load_ema_params(ckpt_dir: str, step: Optional[int] = None,
                    rate: Optional[str] = None):
    """Restore ONLY one EMA param tree (params if no EMA was saved).

    Eval entry points need a single weight copy, not the full train state
    (params + Adam moments + every EMA rate ≈ 5x params of host memory) —
    the reference loads exactly one ``ema_<rate>_<step>.pt`` file
    (video_sample.py:205-207). Orbax partial restore reads only the
    requested subtree's array files. Returns (params, rate_or_None, step,
    config).
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = find_latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, str(step))
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata.tree
        ema_rates = sorted(meta.get("ema", {}).keys()) if "ema" in meta else []
        if ema_rates and str(rate) != "raw":
            rate = str(rate) if rate is not None else ema_rates[-1]
            assert rate in ema_rates, f"EMA rate {rate} not in checkpoint ({ema_rates})"
            target, picked = {"ema": {rate: meta["ema"][rate]}}, rate
        else:
            # rate="raw" forces the raw training params even when EMA trees
            # exist. Essential for SHORT-horizon eval: EMA(0.9999) after N
            # steps still carries 0.9999^N of the INITIAL RANDOM weights
            # (74% at N=3000) — the round-5 discovery that every earlier
            # quality-gate row had sampled near-init mush (BASELINE.md).
            target, picked = {"params": meta["params"]}, None
        # Restore as host numpy — the saved sharding metadata names devices
        # of the TRAINING topology, which eval hosts need not have; jit
        # device_puts the params on first use anyway.
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args, partial_restore=True
            )
        )
    params = restored["ema"][picked] if picked is not None else restored["params"]
    if picked is not None:
        # EMA(r) after N steps still weights the step-0 random init by r^N.
        init_frac = float(picked) ** max(step, 0)
        if init_frac > 0.05:
            print(f"WARNING: EMA({picked}) at step {step} still carries "
                  f"{init_frac:.0%} of the INITIAL RANDOM weights — for "
                  "short-horizon checkpoints sample rate='raw' instead "
                  "(BASELINE.md round 5)")
    config = {}
    cfg_path = os.path.join(ckpt_dir, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return params, picked, step, config


def load_config(ckpt_dir: str) -> Dict:
    with open(os.path.join(os.path.abspath(ckpt_dir), "config.json")) as f:
        return json.load(f)
