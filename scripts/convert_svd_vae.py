"""Convert the diffusers SVD VAE to the Flax layout and validate numerically.

Run in an environment with ``pip install diffusers`` + egress:
  python scripts/convert_svd_vae.py --out weights/svd_vae
Saves encoder/decoder variable trees as .npz pairs and checks encode/decode
parity against torch on random inputs.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _conv(sd, key):  # torch (out,in,kh,kw) -> flax (kh,kw,in,out)
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0), "bias": sd[f"{key}.bias"]}


def _conv3d(sd, key):  # torch (out,in,kt,kh,kw) -> flax (kt,kh,kw,in,out)
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 4, 1, 0), "bias": sd[f"{key}.bias"]}


def _gn(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _resnet2d(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _attn(sd, p):
    out = {
        "group_norm": _gn(sd, f"{p}.group_norm"),
        "to_q": _dense(sd, f"{p}.to_q"), "to_k": _dense(sd, f"{p}.to_k"),
        "to_v": _dense(sd, f"{p}.to_v"), "to_out": _dense(sd, f"{p}.to_out.0"),
    }
    return out


def _temporal_resnet(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"), "conv1": _conv3d(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"), "conv2": _conv3d(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv3d(sd, f"{p}.conv_shortcut")
    return out


def _st_resblock(sd, p):
    return {
        "spatial_res_block": _resnet2d(sd, f"{p}.spatial_res_block"),
        "temporal_res_block": _temporal_resnet(sd, f"{p}.temporal_res_block"),
        "mix_factor": sd[f"{p}.time_mixer.mix_factor"].reshape(1),
    }


def convert(vae_state: dict):
    sd = {k: np.asarray(v) for k, v in vae_state.items()}
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_res_1": _resnet2d(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res_2": _resnet2d(sd, "encoder.mid_block.resnets.1"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
    }
    for i in range(4):
        for j in range(2):
            enc[f"down_{i}_res_{j}"] = _resnet2d(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res_1": _st_resblock(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res_2": _st_resblock(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "time_conv_out": _conv3d(sd, "decoder.time_conv_out"),
    }
    for i in range(4):
        for j in range(3):
            dec[f"up_{i}_res_{j}"] = _st_resblock(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = {"conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    return {"params": enc}, {"params": dec}


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="weights/svd_vae")
    args = parser.parse_args()

    import torch
    from diffusers import AutoencoderKLTemporalDecoder

    vae = AutoencoderKLTemporalDecoder.from_pretrained(
        "stabilityai/stable-video-diffusion-img2vid", subfolder="vae"
    )
    vae.eval()
    enc_vars, dec_vars = convert({k: v.numpy() for k, v in vae.state_dict().items()})

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(f"{out}_encoder.npz", **flatten(enc_vars))
    np.savez(f"{out}_decoder.npz", **flatten(dec_vars))
    print(f"saved {out}_encoder.npz / {out}_decoder.npz")

    # --- numeric validation ---
    import jax.numpy as jnp

    from lfvdm_tpu.models.vae import (
        Encoder,
        TemporalDecoder,
        decoder_config_from_params,
        encoder_config_from_params,
    )

    enc_cfg = encoder_config_from_params(enc_vars)
    dec_cfg = decoder_config_from_params(dec_vars)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_moments = vae.quant_conv(vae.encoder(torch.tensor(img))).numpy()
    ours = np.asarray(Encoder(**enc_cfg).apply(
        enc_vars, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref_moments, rtol=1e-3, atol=1e-3)
    print("encoder validation OK")

    # Multi-frame latents: exercises the temporal resnets' cross-frame
    # GroupNorm stats and the (3,1,1) time convs with real temporal extent.
    T = 4
    lat = rng.standard_normal((T, enc_cfg["latent_channels"], 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_img = vae.decoder(torch.tensor(lat), num_frames=T).numpy()
    ours = np.asarray(TemporalDecoder(**dec_cfg).apply(
        dec_vars, jnp.asarray(lat.transpose(0, 2, 3, 1)), num_frames=T))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref_img, rtol=1e-3, atol=1e-3)
    print("decoder validation OK")


if __name__ == "__main__":
    main()
