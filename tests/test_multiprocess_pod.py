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


def _spawn_pod(tmp_path, scenario="base"):
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(os.path.dirname(__file__), "pod_worker.py")
    return [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), str(tmp_path),
             scenario],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]


def _wait(procs, timeout=1200):
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
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
    return outs, results


def test_two_process_pod_train_vis_save_resume(tmp_path):
    procs = _spawn_pod(tmp_path)
    outs, results = _wait(procs)
    assert all(r["step"] == 2 for r in results)
    assert all(r["resumed_step"] == 2 for r in results)
    # metric reduction agreed across processes (same weighted mean)
    assert abs(results[0]["loss"] - results[1]["loss"]) < 1e-6

    # collective orbax save produced ONE checkpoint tree
    ckpt_steps = [d for d in os.listdir(tmp_path / "ckpt") if d.isdigit()]
    assert ckpt_steps == ["2"], ckpt_steps
    # pod vis sampling: process 0 wrote the panels, process 1 did not crash
    gifs = list((tmp_path / "vis").glob("*.gif"))
    assert len(gifs) == 2, gifs


def test_two_process_pod_preemption_checkpoint(tmp_path):
    """SIGTERM ONE process mid-training: the interrupt flag is agreed at a
    process-uniform log boundary and BOTH processes enter the collective
    checkpoint save, then exit cleanly (train_loop.py preemption path)."""
    import signal
    import threading

    procs = _spawn_pod(tmp_path, scenario="preempt")
    # Wait for the step-4 sentinel on process 0's stdout (the SIGTERM
    # handler is registered before any sentinel can print), then interrupt
    # ONLY process 1 — agreement must propagate to process 0.
    seen = threading.Event()
    lines0: list = []

    def watch():
        # readline (not iteration) — the text-iterator read-ahead could
        # swallow lines we assert on later. This thread owns procs[0].stdout
        # until EOF.
        while True:
            line = procs[0].stdout.readline()
            if not line:
                return
            lines0.append(line)
            if "SENTINEL-SAMPLE" in line:
                seen.set()

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    # generous: two fresh jax processes each compile a train step on CPU;
    # under heavy host load (parallel compiles) 540 s has flaked.
    if not seen.wait(timeout=1100):
        for p in procs:
            p.kill()
        pytest.fail(f"no sentinel within timeout; head:\n{''.join(lines0)[-2000:]}")
    procs[1].send_signal(signal.SIGTERM)

    try:
        out1, _ = procs[1].communicate(timeout=900)
        procs[0].wait(timeout=900)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        procs[1].communicate()
        procs[0].wait()
        raise
    t.join(timeout=60)
    outs = ["".join(lines0), out1]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} rc={p.returncode}:\n{out[-4000:]}"
    # both processes report the preemption checkpoint
    assert all("after interrupt" in out for out in outs), outs[0][-500:]
    ckpt_steps = [d for d in os.listdir(tmp_path / "ckpt") if d.isdigit()]
    assert len(ckpt_steps) >= 1, ckpt_steps


def test_two_process_pod_eval_sharding(tmp_path):
    """video_sample's pod index sharding over real jax.distributed: the two
    processes sample disjoint interleaved shards into a shared dir whose
    union covers every video."""
    procs = _spawn_pod(tmp_path, scenario="sample")
    _, results = _wait(procs)
    shards = {r["process"]: r["indices"] for r in results}
    assert shards[0] == [0, 2] and shards[1] == [1, 3]
    assert sorted(os.listdir(tmp_path / "samples")) == [
        f"sample_{i:04d}-0.npy" for i in range(4)]
