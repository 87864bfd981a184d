"""Convert reference (torch) UNetVideoModel checkpoints to Flax params.

The reference saves ``{"state_dict", "config", "step"}`` torch files
(train_util.py:383-387). This module maps that state_dict onto the parameter
tree of :class:`lfvdm_tpu.models.unet.UNetVideoModel` so released checkpoints
(e.g. ``ema_0.9999_550000.pt``) can be sampled from directly on TPU.

Layout conventions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d weight (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  torch GroupNorm weight/bias          -> GroupNorm32 scale/bias
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t_lin(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _conv(sd, prefix):
    return {"kernel": _t_conv(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin(sd, prefix):
    return {"kernel": _t_lin(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _gn(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _resblock(sd, prefix) -> Dict:
    out = {
        "in_norm": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _lin(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _rpe(sd, prefix) -> Dict:
    if f"{prefix}.rpe_net.embed_distances.weight" in sd:
        return {
            "rpe_net": {
                "embed_distances": _lin(sd, f"{prefix}.rpe_net.embed_distances"),
                "embed_diffusion_time": _lin(sd, f"{prefix}.rpe_net.embed_diffusion_time"),
                "out": _lin(sd, f"{prefix}.rpe_net.out"),
            }
        }
    return {"lookup_table_weight": np.asarray(sd[f"{prefix}.lookup_table_weight"])}


def _rpe_attention(sd, prefix) -> Dict:
    out = {
        "norm": _gn(sd, f"{prefix}.norm"),
        "qkv": _lin(sd, f"{prefix}.qkv"),
        "proj_out": _lin(sd, f"{prefix}.proj_out"),
    }
    for which in ("rpe_q", "rpe_k", "rpe_v"):
        if any(k.startswith(f"{prefix}.{which}.") for k in sd):
            out[which] = _rpe(sd, f"{prefix}.{which}")
    return out


def _attn_block(sd, prefix) -> Dict:
    return {
        "temporal_attention": _rpe_attention(sd, f"{prefix}.temporal_attention"),
        "spatial_attention": _rpe_attention(sd, f"{prefix}.spatial_attention"),
    }


def convert_unet_state_dict(
    state_dict: Dict[str, np.ndarray],
    *,
    num_res_blocks: int,
    channel_mult,
    attention_resolutions,
) -> Dict:
    """Map a reference UNetVideoModel state_dict to our Flax param tree.

    ``attention_resolutions`` here are downsample *factors* (ds values), the
    same as the model's field. Returns {"params": {...}}.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    p["time_embed_1"] = _lin(sd, "time_embed.0")
    p["time_embed_2"] = _lin(sd, "time_embed.2")
    p["stem"] = _conv(sd, "input_blocks.0.0")

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            p[f"down_{level}_{i}"] = _resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                p[f"down_attn_{level}_{i}"] = _attn_block(sd, f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            p[f"downsample_{level}"] = {"conv": _conv(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    p["middle_res_1"] = _resblock(sd, "middle_block.0")
    p["middle_attn"] = _attn_block(sd, "middle_block.1")
    p["middle_res_2"] = _resblock(sd, "middle_block.2")

    jdx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            prefix = f"output_blocks.{jdx}"
            p[f"up_{level}_{i}"] = _resblock(sd, f"{prefix}.0")
            sub = 1
            if ds in attention_resolutions:
                p[f"up_attn_{level}_{i}"] = _attn_block(sd, f"{prefix}.{sub}")
                sub += 1
            if level and i == num_res_blocks:
                p[f"upsample_{level}"] = {"conv": _conv(sd, f"{prefix}.{sub}.conv")}
                ds //= 2
            jdx += 1

    p["out_norm"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


def convert_reference_checkpoint(path: str):
    """Load a reference .pt checkpoint -> (flax_params, config dict).

    Requires torch (CPU is fine). The embedded config drives model
    construction exactly like video_sample.py:205-213.
    """
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.float().numpy() for k, v in data["state_dict"].items()}
    config = dict(data.get("config", {}))
    image_size = config.get("image_size", 64)
    from ..config import CHANNEL_MULT_BY_IMAGE_SIZE

    channel_mult = CHANNEL_MULT_BY_IMAGE_SIZE[image_size]
    attention_ds = tuple(
        image_size // int(r) for r in str(config.get("attention_resolutions", "16,8")).split(",")
    )
    params = convert_unet_state_dict(
        sd,
        num_res_blocks=config.get("num_res_blocks", 2),
        channel_mult=channel_mult,
        attention_resolutions=attention_ds,
    )
    return params, config
