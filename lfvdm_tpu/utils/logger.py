"""KV metrics logger with cross-process reduction.

Capability parity: /root/reference/improved_diffusion/logger.py — an
OpenAI-baselines-style KV store: ``logkv`` (last value), ``logkv_mean``
(running mean), ``dumpkvs`` (flush: cross-rank weighted mean, then emit).

The reference reduces across ranks with MPI gather (logger.py:68-95) and
emits to wandb; here reduction is a host-side process_allgather (no-op for
single process) and sinks are pluggable: stdout, JSONL file, and wandb when
installed. ``dumpkvs`` returns the flushed dict (kept "for unit testing
purposes", logger.py:49).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


_GATHER_BUF_BYTES = 65536  # fixed allgather size; key sets may differ per rank


def mpi_weighted_mean(local_name2valcount: dict) -> dict:
    """Cross-process weighted mean of {name: (value, count)} dicts.

    Key sets may DIFFER across processes (the per-quartile loss KVs are
    keyed by each process's own sampled timesteps — reference
    log_loss_dict, train_util.py:530-536), so a fixed-key array allgather
    would issue shape-mismatched collectives and crash the pod (gloo
    "received data size doesn't match", caught by
    tests/test_multiprocess_pod.py). Like the reference's MPI object
    gather (logger.py:68-95), each process contributes its whole dict:
    serialized to a fixed-size buffer, allgathered, merged host-side.
    """
    import jax

    if jax.process_count() == 1:
        return {name: val for name, (val, _count) in local_name2valcount.items()}
    import json as _json

    from jax.experimental import multihost_utils
    import numpy as np

    payload = _json.dumps(local_name2valcount).encode()
    assert len(payload) + 8 <= _GATHER_BUF_BYTES, (
        f"metric dict too large to gather ({len(payload)} bytes)"
    )
    buf = np.zeros(_GATHER_BUF_BYTES, np.uint8)
    buf[:8] = np.frombuffer(np.uint64(len(payload)).tobytes(), np.uint8)
    buf[8:8 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))  # (P, BUF)

    sums: dict = {}
    counts: dict = {}
    for row in gathered:
        n = int(np.frombuffer(row[:8].tobytes(), np.uint64)[0])
        d = _json.loads(row[8:8 + n].tobytes().decode())
        for name, (val, count) in d.items():
            sums[name] = sums.get(name, 0.0) + float(val) * float(count)
            counts[name] = counts.get(name, 0.0) + float(count)
    return {name: sums[name] / max(counts[name], 1e-12) for name in sums}


class Logger:
    def __init__(self):
        self.name2val: dict = {}
        self.name2cnt: dict = {}
        self._nondistributed: set = set()
        self._jsonl_path: Optional[str] = None
        self._use_wandb = False
        self._start_time = time.time()

    def configure(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                  wandb_kwargs: Optional[dict] = None):
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        if use_wandb:
            import jax

            if jax.process_index() != 0:
                return  # rank-0-only wandb, like the reference (video_train.py:32-35)
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self._use_wandb = True
            except ImportError:
                print("wandb not installed; logging to stdout/JSONL only")

    def logkv(self, key, val, distributed: bool = True):
        self.name2val[key] = val
        if not distributed:
            self._nondistributed.add(key)

    def logkv_mean(self, key, val, distributed: bool = True):
        if val is None:
            self.name2val[key] = None
            return
        oldval, cnt = self.name2val.get(key, 0.0), self.name2cnt.get(key, 0)
        self.name2val[key] = oldval * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1
        if not distributed:
            self._nondistributed.add(key)

    def dumpkvs(self) -> dict:
        import jax

        reducible = {
            name: (float(val), self.name2cnt.get(name, 1))
            for name, val in self.name2val.items()
            if name not in self._nondistributed and isinstance(val, (int, float))
        }
        out = mpi_weighted_mean(reducible)
        for name in self._nondistributed:
            if name in self.name2val:
                out[name] = self.name2val[name]

        if jax.process_index() == 0 and out:
            scalars = {k: v for k, v in out.items() if isinstance(v, (int, float))}
            line = " | ".join(f"{k} {v:.5g}" for k, v in sorted(scalars.items()))
            print(f"[{time.time() - self._start_time:8.1f}s] {line}", flush=True)
            if self._jsonl_path:
                with open(self._jsonl_path, "a") as f:
                    f.write(json.dumps({"_time": time.time(), **scalars}) + "\n")
            if self._use_wandb:
                import wandb

                wandb.log(out)

        self.name2val.clear()
        self.name2cnt.clear()
        self._nondistributed.clear()
        return out


logger = Logger()
