"""Deterministic RNG scoping for host-side numpy randomness.

Capability parity: /root/reference/improved_diffusion/rng_util.py — the
reference swaps python/torch/cuda/numpy RNG state around visualization
blocks so in-training sampling is reproducible. Device-side randomness here
is already explicit (threaded JAX keys); this module provides the same
scoped determinism for the host-side numpy generators (mask sampling for
the vis batch).
"""

from __future__ import annotations

import random
from functools import wraps

import numpy as np


class RNG:
    """Context manager: seed python+numpy RNG inside, restore state outside.

    >>> with RNG(0):
    ...     ...  # deterministic block
    """

    def __init__(self, seed: int):
        self.seed = seed
        self._py_state = None
        self._np_state = None

    def __enter__(self):
        self._py_state = random.getstate()
        self._np_state = np.random.get_state()
        random.seed(self.seed)
        np.random.seed(self.seed)
        return self

    def __exit__(self, *exc):
        random.setstate(self._py_state)
        np.random.set_state(self._np_state)
        return False


def rng_decorator(seed: int):
    def decorator(fn):
        @wraps(fn)
        def wrapped(*args, **kwargs):
            with RNG(seed):
                return fn(*args, **kwargs)

        return wrapped

    return decorator


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
