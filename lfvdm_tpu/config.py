"""Config/flag system: defaults dict -> model + diffusion + argparse flags.

Capability parity: /root/reference/improved_diffusion/script_util.py:9-208.
The defaults dict is the single source of truth; checkpoints embed the full
config so evaluation needs only a checkpoint path.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import jax.numpy as jnp

from .diffusion.gaussian import GaussianDiffusion
from .models.unet import UNetVideoModel

CHANNEL_MULT_BY_IMAGE_SIZE = {
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
}


def model_and_diffusion_defaults() -> Dict[str, Any]:
    """Default model+diffusion config (script_util.py:9-36)."""
    return dict(
        image_size=64,
        in_channels=3,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        attention_resolutions="16,8",
        dropout=0.0,
        learn_sigma=False,
        sigma_small=False,
        class_cond=False,
        diffusion_steps=1000,
        diffusion_space="pixel",
        pre_encoded=False,
        # Levels of the live wavelet diffusion space (diffusion/wavelet.py);
        # the reference sketches the space but ships it NotImplemented.
        wavelet_levels=1,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=True,
        rescale_learned_sigmas=True,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        use_rpe_net=True,
        # TPU-native knob (no reference equivalent): torso compute dtype.
        compute_dtype="bfloat16",
    )


def flagship_config(tiny: bool = False) -> Dict[str, Any]:
    """THE flagship benchmark/entry config — single source of truth.

    Full: the CARLA pixel-space training config of the released reference
    checkpoint (reference README.md:54-57): 128px, 128 channels, 1 res
    block, K=20, bf16 torso. Everything perf-related (bench.py,
    __graft_entry__, benchmarks/*) must import this rather than restating
    the dict, so the numbers can't drift apart.

    Tiny: the shape-compatible miniature used by dryruns and smoke tests.
    """
    if tiny:
        return dict(image_size=32, in_channels=2, num_channels=32, num_res_blocks=1,
                    attention_resolutions="8", diffusion_steps=8,
                    noise_schedule="cosine", compute_dtype="float32")
    return dict(image_size=128, in_channels=3, num_channels=128, num_res_blocks=1,
                attention_resolutions="16,8", diffusion_steps=1000,
                compute_dtype="bfloat16")


def create_model(
    image_size: int,
    in_channels: int,
    num_channels: int,
    num_res_blocks: int,
    *,
    learn_sigma: bool = False,
    use_checkpoint: bool = False,
    attention_resolutions: str = "16,8",
    num_heads: int = 4,
    num_heads_upsample: int = -1,
    use_scale_shift_norm: bool = True,
    dropout: float = 0.0,
    use_rpe_net: bool = True,
    compute_dtype: str = "bfloat16",
    class_cond: bool = False,
) -> UNetVideoModel:
    """Build the video U-Net from config values (script_util.py:93-137)."""
    if image_size not in CHANNEL_MULT_BY_IMAGE_SIZE:
        raise ValueError(f"unsupported image size: {image_size}")
    channel_mult = CHANNEL_MULT_BY_IMAGE_SIZE[image_size]
    attention_ds = tuple(image_size // int(res) for res in str(attention_resolutions).split(","))
    del class_cond  # unsupported in the reference's video model too
    return UNetVideoModel(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=in_channels if not learn_sigma else in_channels * 2,
        num_res_blocks=num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=dropout,
        channel_mult=channel_mult,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        use_rpe_net=use_rpe_net,
        dtype=getattr(jnp, compute_dtype),
        use_remat=use_checkpoint,
    )


def create_gaussian_diffusion(
    *,
    diffusion_steps: int = 1000,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = False,
    timestep_respacing: str = "",
) -> GaussianDiffusion:
    return GaussianDiffusion.create(
        steps=diffusion_steps,
        noise_schedule=noise_schedule,
        timestep_respacing=timestep_respacing,
        learn_sigma=learn_sigma,
        sigma_small=sigma_small,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
    )


def create_model_and_diffusion(config: Dict[str, Any]):
    """Config dict -> (UNetVideoModel, GaussianDiffusion).

    ``config`` may contain extra keys (full argparse dicts are fine); only
    the model/diffusion subset is consumed.
    """
    cfg = {**model_and_diffusion_defaults(), **{k: v for k, v in config.items()
                                                if k in model_and_diffusion_defaults()}}
    model = create_model(
        cfg["image_size"], cfg["in_channels"], cfg["num_channels"], cfg["num_res_blocks"],
        learn_sigma=cfg["learn_sigma"], use_checkpoint=cfg["use_checkpoint"],
        attention_resolutions=cfg["attention_resolutions"], num_heads=cfg["num_heads"],
        num_heads_upsample=cfg["num_heads_upsample"],
        use_scale_shift_norm=cfg["use_scale_shift_norm"], dropout=cfg["dropout"],
        use_rpe_net=cfg["use_rpe_net"], compute_dtype=cfg["compute_dtype"],
        class_cond=cfg["class_cond"],
    )
    diffusion = create_gaussian_diffusion(
        diffusion_steps=cfg["diffusion_steps"], learn_sigma=cfg["learn_sigma"],
        sigma_small=cfg["sigma_small"], noise_schedule=cfg["noise_schedule"],
        use_kl=cfg["use_kl"], predict_xstart=cfg["predict_xstart"],
        rescale_timesteps=cfg["rescale_timesteps"],
        rescale_learned_sigmas=cfg["rescale_learned_sigmas"],
        timestep_respacing=cfg["timestep_respacing"],
    )
    return model, diffusion


def apply_platform_env():
    """Honor $LFVDM_PLATFORM (e.g. "cpu") at the jax.config level.

    Some hosting environments pre-register an accelerator platform and pin
    ``jax_platforms`` in config, which silently overrides the JAX_PLATFORMS
    env var; the config-level update wins. Call early in every CLI entry
    point (before the first backend touch) so debug/CI runs can force CPU.
    """
    import os

    import jax

    platform = os.environ.get("LFVDM_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache.

    First compiles of the flagship model take minutes on TPU; a persistent
    cache makes relaunches (resume, eval, array jobs) near-instant. Uses
    ``path``, else $LFVDM_COMPILE_CACHE, else ``~/.cache/lfvdm_xla``
    (docs/FLAGS.md). Set LFVDM_COMPILE_CACHE to the empty string to disable.
    """
    import os

    import jax

    env = os.environ.get("LFVDM_COMPILE_CACHE")
    if path == "" or (path is None and env == ""):
        return  # explicitly disabled (empty path arg or LFVDM_COMPILE_CACHE="")
    path = path or env or os.path.expanduser("~/.cache/lfvdm_xla")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict: Dict[str, Any]):
    """Auto-generate typed flags from a defaults dict (script_util.py:183-208)."""
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}
