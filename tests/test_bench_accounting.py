"""The bench's same-function FLOP fairness correction must be real.

bench.py adds back the XLA-measured FLOP delta between the reference's
repeat+conv upsample and the model's transposed-conv form so vs_baseline
stays a same-function speedup ratio. Pin on CPU that every level yields a
delta, the delta is positive (naive does strictly more MACs), and the two
subgraphs compute the same function.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp
import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import upsample_flop_correction
from lfvdm_tpu.models.unet import dilated_upsample_conv, naive_upsample_conv


def test_flop_correction_covers_all_levels_and_is_positive():
    # tiny H so the CPU compiles are fast; structure matches the flagship's
    delta, levels = upsample_flop_correction(NT=2, H=16, num_channels=8)
    assert levels == 4, levels
    assert delta > 0, delta


def test_correction_subgraphs_compute_the_same_function():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    a = np.asarray(jax.jit(naive_upsample_conv)(x, w))
    b = np.asarray(jax.jit(dilated_upsample_conv)(x, w))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_canary_normalization_cancels_multiplicative_drift():
    """A launch hour that is uniformly k× slower (tunnel/host contention)
    must normalize back to the quiet-hour value (BASELINE.md round-4
    drift-robust headline protocol)."""
    from bench import normalize_launches

    nominal = 0.5
    quiet = [24.0, 24.1, 23.9]
    # a 1.3x-slower hour scales flagship launches AND canaries together
    k = 1.3
    slow_launches = [t * k for t in quiet]
    slow_canaries = [nominal * k] * 4
    normed = normalize_launches(slow_launches, slow_canaries, nominal)
    np.testing.assert_allclose(normed, quiet, rtol=1e-12)
    # canary count contract: C,F,C,...,C
    with pytest.raises(AssertionError):
        normalize_launches(quiet, [nominal] * 3, nominal)
