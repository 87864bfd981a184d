"""Drive scripts/convert_svd_vae.py's REAL main() against the torch fixture.

Usage: python tests/fixtures/run_convert_svd_vae.py <out_prefix>

Afterwards exercises the load_svd_vae consumer (the npz naming contract)
end-to-end: encode parity vs the torch fixture's moments, decode parity vs
the torch decoder, through the SVDVae chunked video API.
"""

import os
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import torch_svd_vae_fixture

mod = types.ModuleType("diffusers")
mod.AutoencoderKLTemporalDecoder = torch_svd_vae_fixture.AutoencoderKLTemporalDecoder
sys.modules["diffusers"] = mod

prefix = sys.argv[1]
sys.argv = ["convert_svd_vae.py", "--out", prefix]
runpy.run_path(os.path.join(REPO, "scripts", "convert_svd_vae.py"),
               run_name="__main__")

# ---- consumer round-trip: load_svd_vae reads the npz pair the script wrote
from lfvdm_tpu.models.vae import load_svd_vae

vae_t = torch_svd_vae_fixture.AutoencoderKLTemporalDecoder()
vae_t.eval()
vae = load_svd_vae(prefix)
assert vae.pretrained

rng = np.random.default_rng(1)
video = rng.uniform(-1, 1, (1, 2, 3, 64, 64)).astype(np.float32)  # (B,T,C,H,W)
z = np.asarray(vae.encode_video(video))  # rng=None -> latent means
assert z.shape == (1, 2, 4, 8, 8), z.shape
with torch.no_grad():
    moments = vae_t.quant_conv(vae_t.encoder(torch.tensor(video[0])))
    want_mean = moments[:, :4].numpy()
np.testing.assert_allclose(z[0], want_mean, rtol=1e-3, atol=1e-3)

x = np.asarray(vae.decode_video(z))
assert x.shape == (1, 2, 3, 64, 64), x.shape
with torch.no_grad():
    # decode_video decodes per-frame (num_frames=1), matching the
    # reference's vae.decode(chunk, num_frames=1) call pattern.
    want_img = vae_t.decoder(torch.tensor(z[0]), num_frames=1).numpy()
np.testing.assert_allclose(x[0], want_img, rtol=1e-3, atol=1e-3)
print("codec round-trip OK")
print("RUNNER-OK")
