"""Config-surface parity: our defaults dict vs the reference's script_util.

A user switching from the reference must get the SAME model/diffusion for
the same flags. Pin every key of the reference's
``model_and_diffusion_defaults()`` (script_util.py:9-45) to ours — same
keys, same default values — modulo the documented TPU-side renames
(use_fp16 → compute_dtype) and additions (which must not shadow reference
semantics).
"""

import pytest

from lfvdm_tpu.config import model_and_diffusion_defaults

# reference keys intentionally replaced by TPU-native equivalents
RENAMED = {
    "use_fp16": "compute_dtype",  # fp16+loss-scale -> bf16 torso flag
    # the reference bundles {diffusion_space, pre_encoded,
    # pre_encoded_stats_dict} into one nested dict (script_util.py:26); the
    # config flattens the first two to top level and the codec factory
    # (diffusion/codecs.py) owns the stats
    "diffusion_space_kwargs": "diffusion_space",
}
# reference keys our config intentionally drops (with the reason)
DROPPED = {
    "fp16_scale_growth",  # loss-scale machinery is meaningless under bf16
}


def test_flattened_diffusion_space_members_present():
    ours = model_and_diffusion_defaults()
    assert ours["diffusion_space"] == "pixel"
    assert ours["pre_encoded"] is False


def test_reference_defaults_covered(reference):
    from improved_diffusion.script_util import (
        model_and_diffusion_defaults as ref_defaults,
    )

    ref = ref_defaults()
    ours = model_and_diffusion_defaults()
    missing, mismatched = [], []
    for k, v in ref.items():
        if k in DROPPED:
            assert k not in ours, f"{k} both dropped and present"
            continue
        k2 = RENAMED.get(k, k)
        if k2 not in ours:
            missing.append(k)
            continue
        if k in RENAMED:
            continue  # value semantics differ by design
        if ours[k2] != v:
            mismatched.append((k, v, ours[k2]))
    assert not missing, f"reference default keys missing from config: {missing}"
    assert not mismatched, f"default VALUES diverge from the reference: {mismatched}"


def test_respacing_and_rescale_defaults(reference):
    # the two flags that silently change sampler numerics if they drift
    from improved_diffusion.script_util import (
        model_and_diffusion_defaults as ref_defaults,
    )

    ref = ref_defaults()
    ours = model_and_diffusion_defaults()
    assert ours["timestep_respacing"] == ref["timestep_respacing"]
    assert ours["rescale_timesteps"] == ref["rescale_timesteps"]
    assert ours["diffusion_steps"] == ref["diffusion_steps"]
    assert ours["noise_schedule"] == ref["noise_schedule"]
