"""Fused single-pass AdamW+EMA (LFVDM_FUSED_OPT) vs the optax chain.

The fused arm exists to answer the optimizer/EMA HBM-tail question in the
train-step perf chapter (BASELINE.md): same math, same opt_state structure,
one tree traversal. These pins make the A/B legitimate — if the arms ever
diverge numerically, the wall-clock comparison is meaningless.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lfvdm_tpu.training.train_loop import (
    _OPT_HYPERPARAMS,
    _fused_adamw_ema,
    init_train_state,
    make_optimizer,
)


def _tree(rng, scale=1.0):
    return {
        "a": jnp.asarray(rng.standard_normal((4, 3)) * scale, jnp.float32),
        "b": {"w": jnp.asarray(rng.standard_normal((5,)) * scale, jnp.float32),
              "s": jnp.asarray(rng.standard_normal(()) * scale, jnp.float32)},
    }


@pytest.mark.parametrize("wd", [0.0, 0.01])
@pytest.mark.parametrize("anneal", [0, 50])
def test_fused_matches_optax_chain(wd, anneal):
    rng = np.random.default_rng(0)
    params = _tree(rng)
    tx = make_optimizer(1e-3, wd, anneal)
    hp = _OPT_HYPERPARAMS[tx]
    assert hp == (1e-3, wd, anneal)
    rates = ["0.9999", "0.99"]
    state = init_train_state(params, tx, rates)

    opt_state, ema, p = state["opt_state"], state["ema"], params
    fp, fopt, fema = p, state["opt_state"], state["ema"]
    for step in range(3):
        grads = _tree(rng, scale=0.1)
        # optax path (exactly what make_train_step's default arm runs)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        ema = {r: jax.tree.map(lambda e, q, rr=float(r): e * rr + q * (1 - rr),
                               ema[r], p) for r in rates}
        # fused path
        fp, fopt, fema = _fused_adamw_ema(fp, grads, fopt, fema, rates, hp)

        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(fp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        for r in rates:
            for a, b in zip(jax.tree.leaves(ema[r]), jax.tree.leaves(fema[r])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-7)
        # same opt_state STRUCTURE (checkpoint interchangeability) and counts
        assert jax.tree.structure(opt_state) == jax.tree.structure(fopt)
        assert int(fopt[0].count) == step + 1
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(fopt)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_bf16_ema_diagnostic_arm(monkeypatch):
    monkeypatch.setenv("LFVDM_BF16_EMA", "1")
    rng = np.random.default_rng(1)
    params = _tree(rng)
    tx = make_optimizer(1e-3, 0.0)
    state = init_train_state(params, tx, ["0.9999"])
    for leaf in jax.tree.leaves(state["ema"]["0.9999"]):
        assert leaf.dtype == jnp.bfloat16
    # fused update keeps the storage dtype and stays close to the f32 value
    grads = _tree(rng, scale=0.1)
    _, _, fema = _fused_adamw_ema(params, grads, state["opt_state"],
                                  state["ema"], ["0.9999"],
                                  _OPT_HYPERPARAMS[tx])
    for e, p in zip(jax.tree.leaves(fema["0.9999"]), jax.tree.leaves(params)):
        assert e.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(e, np.float32), np.asarray(p),
                                   rtol=2e-2, atol=1e-2)
