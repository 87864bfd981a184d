"""Two-process pod integration test over real jax.distributed (localhost).

Unlike the virtual 8-device single-process mesh the rest of the suite
uses, this spawns TWO jax processes (2 virtual CPU devices each) connected
through jax.distributed's gRPC coordinator — exercising the actual
multi-HOST code paths: make_array_from_process_local_data with
process-local batch rows, cross-process metric allgather, the collective
orbax checkpoint save, and pod vis sampling (symmetric all-gather,
process-0-only gif writing, barrier).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns processes + compiles: ~2-4 min


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod_train_vis_save(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(os.path.dirname(__file__), "pod_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith('{"process"')][-1]
        results.append(json.loads(line))
    assert {r["process"] for r in results} == {0, 1}
    assert all(r["step"] == 2 for r in results)
    # metric reduction agreed across processes (same weighted mean)
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6

    # collective orbax save produced ONE checkpoint tree
    ckpt_steps = [d for d in os.listdir(tmp_path / "ckpt") if d.isdigit()]
    assert ckpt_steps == ["2"], ckpt_steps
    # pod vis sampling: process 0 wrote the panels, process 1 did not crash
    gifs = list((tmp_path / "vis").glob("*.gif"))
    assert len(gifs) == 2, gifs
