"""Torch AutoencoderKLTemporalDecoder fixture (diffusers-shaped, miniature).

Independent torch re-implementation of the diffusers SVD VAE semantics —
same state-dict key names, same op semantics (GN32 eps 1e-6, silu-conv
resnets, single-head attention, asymmetric-pad downsample, nearest-up
upsample, spatiotemporal blocks with cross-frame GroupNorm stats and a
learned sigmoid AlphaBlender, (3,1,1) time convs) — at miniature widths
(32, 32, 64, 64) so scripts/convert_svd_vae.py's main() executes verbatim
in-env and its numeric validation is meaningful.
(Reference touchpoint: improved_diffusion/gaussian_diffusion.py:890-947.)
"""

import torch
import torch.nn.functional as F

BLOCKS = (32, 32, 64, 64)
LATENT = 4


def _gn(c):
    return torch.nn.GroupNorm(32, c, eps=1e-6)


class ResnetBlock2D(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class Attention(torch.nn.Module):
    """Single-head spatial self-attention with residual (diffusers VAE)."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = _gn(c)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x.view(B, C, H * W)).transpose(1, 2)  # (B, HW, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * (C ** -0.5), dim=-1)
        out = self.to_out[0](attn @ v)
        return x + out.transpose(1, 2).view(B, C, H, W)


class Downsample2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Upsample2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class DownEncoderBlock2D(torch.nn.Module):
    def __init__(self, cin, cout, add_downsample):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [ResnetBlock2D(cin, cout), ResnetBlock2D(cout, cout)])
        if add_downsample:
            self.downsamplers = torch.nn.ModuleList([Downsample2D(cout)])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class MidBlock2D(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [ResnetBlock2D(c, c), ResnetBlock2D(c, c)])
        self.attentions = torch.nn.ModuleList([Attention(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class Encoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = torch.nn.Conv2d(3, BLOCKS[0], 3, padding=1)
        blocks = []
        cin = BLOCKS[0]
        for i, c in enumerate(BLOCKS):
            blocks.append(DownEncoderBlock2D(cin, c, i != len(BLOCKS) - 1))
            cin = c
        self.down_blocks = torch.nn.ModuleList(blocks)
        self.mid_block = MidBlock2D(BLOCKS[-1])
        self.conv_norm_out = _gn(BLOCKS[-1])
        self.conv_out = torch.nn.Conv2d(BLOCKS[-1], 2 * LATENT, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            h = b(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TemporalResnetBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = torch.nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = _gn(cout)
        self.conv2 = torch.nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        if cin != cout:
            self.conv_shortcut = torch.nn.Conv3d(cin, cout, 1)

    def forward(self, x):  # (B, C, T, H, W): GN stats span (T, H, W)
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class AlphaBlender(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mix_factor = torch.nn.Parameter(torch.tensor([0.5]))


class SpatioTemporalResBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(cin, cout)
        self.temporal_res_block = TemporalResnetBlock(cout, cout)
        self.time_mixer = AlphaBlender()

    def forward(self, x, num_frames):  # x: (B*T, C, H, W)
        hs = self.spatial_res_block(x)
        BT, C, H, W = hs.shape
        h5 = hs.view(BT // num_frames, num_frames, C, H, W).permute(0, 2, 1, 3, 4)
        ht = self.temporal_res_block(h5)
        alpha = torch.sigmoid(self.time_mixer.mix_factor)
        out = alpha * h5 + (1 - alpha) * ht
        return out.permute(0, 2, 1, 3, 4).reshape(BT, C, H, W)


class MidBlockTemporalDecoder(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [SpatioTemporalResBlock(c, c), SpatioTemporalResBlock(c, c)])
        self.attentions = torch.nn.ModuleList([Attention(c)])

    def forward(self, x, num_frames):
        x = self.resnets[0](x, num_frames)
        x = self.attentions[0](x)
        return self.resnets[1](x, num_frames)


class UpBlockTemporalDecoder(torch.nn.Module):
    def __init__(self, cin, cout, add_upsample):
        super().__init__()
        self.resnets = torch.nn.ModuleList(
            [SpatioTemporalResBlock(cin, cout),
             SpatioTemporalResBlock(cout, cout),
             SpatioTemporalResBlock(cout, cout)])
        if add_upsample:
            self.upsamplers = torch.nn.ModuleList([Upsample2D(cout)])

    def forward(self, x, num_frames):
        for r in self.resnets:
            x = r(x, num_frames)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class TemporalDecoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        rev = tuple(reversed(BLOCKS))
        self.conv_in = torch.nn.Conv2d(LATENT, rev[0], 3, padding=1)
        self.mid_block = MidBlockTemporalDecoder(rev[0])
        blocks = []
        cin = rev[0]
        for i, c in enumerate(rev):
            blocks.append(UpBlockTemporalDecoder(cin, c, i != len(rev) - 1))
            cin = c
        self.up_blocks = torch.nn.ModuleList(blocks)
        self.conv_norm_out = _gn(rev[-1])
        self.conv_out = torch.nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.time_conv_out = torch.nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames=1):  # z: (B*T, LATENT, h, w)
        h = self.conv_in(z)
        h = self.mid_block(h, num_frames)
        for b in self.up_blocks:
            h = b(h, num_frames)
        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        BT, C, H, W = h.shape
        h5 = h.view(BT // num_frames, num_frames, C, H, W).permute(0, 2, 1, 3, 4)
        h5 = self.time_conv_out(h5)
        return h5.permute(0, 2, 1, 3, 4).reshape(BT, C, H, W)


class AutoencoderKLTemporalDecoder(torch.nn.Module):
    """Drop-in for diffusers' class as scripts/convert_svd_vae.py uses it."""

    def __init__(self, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.encoder = Encoder()
        self.quant_conv = torch.nn.Conv2d(2 * LATENT, 2 * LATENT, 1)
        self.decoder = TemporalDecoder()

    @classmethod
    def from_pretrained(cls, repo, subfolder=None, **kwargs):
        return cls()
