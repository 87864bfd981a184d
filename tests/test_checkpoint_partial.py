"""Partial (EMA-only) checkpoint restore for eval entry points.

The reference loads exactly one ``ema_<rate>_<step>.pt`` file for eval
(/root/reference/scripts/video_sample.py:205-207); the orbax equivalent
must not pull the whole train state (params + Adam moments + every EMA
copy) into host memory.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lfvdm_tpu.training import checkpoint as ckpt_lib


def _fake_state(seed=0):
    rng = np.random.default_rng(seed)
    params = {"dense": {"kernel": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32),
                        "bias": jnp.zeros((4,), jnp.float32)}}
    return {
        "params": params,
        "opt_state": {"mu": jax.tree.map(jnp.zeros_like, params)},
        "ema": {
            "0.99": {"dense": {"kernel": params["dense"]["kernel"] + 1.0,
                               "bias": params["dense"]["bias"] + 1.0}},
            "0.9999": {"dense": {"kernel": params["dense"]["kernel"] + 2.0,
                                 "bias": params["dense"]["bias"] + 2.0}},
        },
        "step": jnp.asarray(7, jnp.int32),
    }


def test_load_ema_params_picks_highest_rate(tmp_path):
    state = _fake_state()
    ckpt_lib.save_checkpoint(str(tmp_path), 7, state, config={"num_channels": 8})
    params, rate, step, config = ckpt_lib.load_ema_params(str(tmp_path))
    assert rate == "0.9999" and step == 7
    assert config["num_channels"] == 8
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               np.asarray(state["ema"]["0.9999"]["dense"]["kernel"]))


def test_load_ema_params_explicit_rate(tmp_path):
    state = _fake_state()
    ckpt_lib.save_checkpoint(str(tmp_path), 3, state)
    params, rate, step, _ = ckpt_lib.load_ema_params(str(tmp_path), rate="0.99")
    assert rate == "0.99" and step == 3
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]),
                               np.asarray(state["ema"]["0.99"]["dense"]["bias"]))


def test_load_ema_params_falls_back_to_params(tmp_path):
    state = _fake_state()
    state.pop("ema")
    ckpt_lib.save_checkpoint(str(tmp_path), 1, state)
    params, rate, step, _ = ckpt_lib.load_ema_params(str(tmp_path))
    assert rate is None and step == 1
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               np.asarray(state["params"]["dense"]["kernel"]))


def test_load_ema_params_raw_forces_training_params(tmp_path, capsys):
    """rate='raw' must yield the RAW training params even when EMA trees
    exist — the short-horizon eval estimand: EMA(0.9999) after N steps
    still weights the initial random params by 0.9999^N (74% at the quality
    gate's 3000 steps; every round-3/4 gate row unknowingly sampled that
    near-init blend — BASELINE.md round 5)."""
    state = _fake_state()
    ckpt_lib.save_checkpoint(str(tmp_path), 3000, state)
    params, rate, step, _ = ckpt_lib.load_ema_params(str(tmp_path), rate="raw")
    assert rate is None and step == 3000
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               np.asarray(state["params"]["dense"]["kernel"]))
    # and the default EMA path warns about init contamination at this step
    _, rate2, _, _ = ckpt_lib.load_ema_params(str(tmp_path))
    assert rate2 == "0.9999"
    assert "INITIAL RANDOM weights" in capsys.readouterr().out
