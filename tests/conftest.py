"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-host/multi-chip logic is tested on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md §4d) — the driver
separately validates the same sharded code paths via __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The harness may pre-register a TPU platform via sitecustomize and pin
# jax.config.jax_platforms — the config-level update wins over env vars.
jax.config.update("jax_platforms", "cpu")
# XLA:CPU's DEFAULT matmul precision downcasts f32 matmuls (bf16 passes);
# parity tests need true f32. TPU runs keep the fast default.
jax.config.update("jax_default_matmul_precision", "highest")

import sys

import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    """Import the reference implementation (torch CPU) as a numerical oracle.

    Skips if the reference checkout is unavailable — the test suite must be
    fully green without it.
    """
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "improved_diffusion")):
        pytest.skip("reference checkout not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import improved_diffusion.gaussian_diffusion as gd  # noqa: F401

    return __import__("improved_diffusion")
