"""Misc infra: Protect file lock (reference test_util.py:10-17 semantics)."""

import threading

from lfvdm_tpu.utils.locks import Protect


def test_protect_serializes_read_modify_write(tmp_path):
    target = tmp_path / "shared" / "counter.txt"
    target.parent.mkdir(parents=True)
    target.write_text("0")

    def bump(n):
        for _ in range(n):
            with Protect(str(target), timeout=30):
                v = int(target.read_text())
                target.write_text(str(v + 1))

    threads = [threading.Thread(target=bump, args=(25,)) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert int(target.read_text()) == 100


def test_protect_usable_before_target_exists(tmp_path):
    # The lock file is a sibling .lock — the protected file need not exist,
    # and the parent directory is created on demand.
    target = tmp_path / "deep" / "dir" / "file.npy"
    with Protect(str(target), timeout=5):
        assert target.parent.exists()
        assert not target.exists()


def test_setup_distributed_detection(monkeypatch):
    """Pod slices (TPU_WORKER_HOSTNAMES) and explicit coordinators both
    trigger jax.distributed.initialize; bare single-host runs never do."""
    import jax

    from lfvdm_tpu.parallel import mesh

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    for var in ("TPU_WORKER_HOSTNAMES", "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    mesh.setup_distributed()
    assert calls == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1,h2,h3")
    mesh.setup_distributed()
    assert calls == [1]
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "1.2.3.4:1234")
    mesh.setup_distributed()
    assert calls == [1, 1]


def test_local_numpy_single_process_identity():
    """local_numpy returns the full value when everything is addressable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lfvdm_tpu.parallel.mesh import make_mesh
    from lfvdm_tpu.parallel.sharding import data_sharding
    from lfvdm_tpu.training.train_loop import local_numpy

    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32)
    dev = jax.device_put(x, data_sharding(mesh, 1))
    np.testing.assert_array_equal(local_numpy(dev), x)
    np.testing.assert_array_equal(local_numpy(jnp.float32(3.5)), np.float32(3.5))
    np.testing.assert_array_equal(local_numpy(x), x)  # plain numpy passthrough


def test_unshardable_dataset_refuses_multiprocess(monkeypatch):
    """mazes/minerl on >1 process must fail loudly, not duplicate rows."""
    import jax
    import pytest

    from lfvdm_tpu.data import datasets

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    with pytest.raises(ValueError, match="not shardable"):
        next(datasets.load_data("mazes", batch_size=1, T=4))
