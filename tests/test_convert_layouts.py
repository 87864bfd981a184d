"""Golden fixtures for the torch/TF -> Flax weight-conversion conventions.

The three offline converters (scripts/convert_svd_vae.py,
convert_lpips.py, convert_i3d.py, plus carla_regressor's
convert_resnet152_state_dict) cannot run end-to-end in this environment
(no diffusers/lpips/tfhub, zero egress), but every transpose/naming
convention they rely on CAN be pinned numerically against oracles that ARE
installed (torch CPU, tensorflow). Breaking any of these conventions would
silently corrupt the converted weights — these tests fail instead.
"""

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # compile-heavy / oracle tier

import jax
import jax.numpy as jnp
from flax import linen as nn

RNG = np.random.default_rng(0)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---- scripts/convert_svd_vae.py conventions ----


def test_conv2d_kernel_transpose_convention():
    """torch (out,in,kh,kw) --(2,3,1,0)--> flax (kh,kw,in,out); SAME pad."""
    w = RNG.standard_normal((5, 3, 3, 3)).astype(np.float32)
    b = RNG.standard_normal((5,)).astype(np.float32)
    x = RNG.standard_normal((2, 3, 8, 8)).astype(np.float32)  # NCHW

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(_t(w)), tconv.bias.copy_(_t(b))
        want = tconv(_t(x)).numpy()

    flax_vars = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                            "bias": jnp.asarray(b)}}
    got = nn.Conv(5, (3, 3), padding="SAME").apply(
        flax_vars, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_conv3d_kernel_transpose_convention():
    """torch (out,in,kt,kh,kw) --(2,3,4,1,0)--> flax (kt,kh,kw,in,out)."""
    w = RNG.standard_normal((4, 2, 3, 1, 1)).astype(np.float32)
    b = RNG.standard_normal((4,)).astype(np.float32)
    x = RNG.standard_normal((1, 2, 5, 4, 4)).astype(np.float32)  # NCTHW

    tconv = torch.nn.Conv3d(2, 4, (3, 1, 1), padding=(1, 0, 0))
    with torch.no_grad():
        tconv.weight.copy_(_t(w)), tconv.bias.copy_(_t(b))
        want = tconv(_t(x)).numpy()

    flax_vars = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
                            "bias": jnp.asarray(b)}}
    got = nn.Conv(4, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0))).apply(
        flax_vars, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))  # NTHWC
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3), want,
                               rtol=1e-4, atol=1e-5)


def test_dense_kernel_transpose_convention():
    """torch Linear weight (out,in) --.T--> flax Dense kernel (in,out)."""
    w = RNG.standard_normal((6, 4)).astype(np.float32)
    b = RNG.standard_normal((6,)).astype(np.float32)
    x = RNG.standard_normal((3, 4)).astype(np.float32)
    lin = torch.nn.Linear(4, 6)
    with torch.no_grad():
        lin.weight.copy_(_t(w)), lin.bias.copy_(_t(b))
        want = lin(_t(x)).numpy()
    got = nn.Dense(6).apply(
        {"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_groupnorm_matches_diffusers_convention():
    """vae.GN (eps 1e-6, NHWC) == torch GroupNorm(32, eps=1e-6) (NCHW)."""
    from lfvdm_tpu.models.vae import GN

    C = 64
    scale = RNG.standard_normal((C,)).astype(np.float32)
    bias = RNG.standard_normal((C,)).astype(np.float32)
    x = RNG.standard_normal((2, C, 6, 6)).astype(np.float32)

    tgn = torch.nn.GroupNorm(32, C, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(_t(scale)), tgn.bias.copy_(_t(bias))
        want = tgn(_t(x)).numpy()

    got = GN(groups=32).apply(
        {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


# ---- carla_regressor conversion (torchvision eval-mode BatchNorm) ----


def test_batchnorm_eval_semantics_match_torch():
    from lfvdm_tpu.evals.carla_regressor import BatchNorm

    C = 8
    x = RNG.standard_normal((2, C, 5, 5)).astype(np.float32)
    weight = RNG.standard_normal((C,)).astype(np.float32)
    bias = RNG.standard_normal((C,)).astype(np.float32)
    mean = RNG.standard_normal((C,)).astype(np.float32)
    var = RNG.uniform(0.5, 2.0, (C,)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(C)
    tbn.eval()
    with torch.no_grad():
        tbn.weight.copy_(_t(weight)), tbn.bias.copy_(_t(bias))
        tbn.running_mean.copy_(_t(mean)), tbn.running_var.copy_(_t(var))
        want = tbn(_t(x)).numpy()

    got = BatchNorm(C).apply(
        {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
         "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_train_semantics_match_torch():
    """Train-mode BN (batch stats + running-stat update, torch momentum 0.1)
    matches torch — the regressor-training path (scripts/carla_regressor_train.py),
    where a random-init 152-layer trunk would blow up under frozen init stats."""
    from lfvdm_tpu.evals.carla_regressor import BatchNorm

    C = 8
    x = RNG.standard_normal((4, C, 5, 5)).astype(np.float32)
    weight = RNG.standard_normal((C,)).astype(np.float32)
    bias = RNG.standard_normal((C,)).astype(np.float32)
    mean = RNG.standard_normal((C,)).astype(np.float32)
    var = RNG.uniform(0.5, 2.0, (C,)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(C)
    tbn.train()
    with torch.no_grad():
        tbn.weight.copy_(_t(weight)), tbn.bias.copy_(_t(bias))
        tbn.running_mean.copy_(_t(mean)), tbn.running_var.copy_(_t(var))
        want = tbn(_t(x)).numpy()
        want_mean = tbn.running_mean.numpy().copy()
        want_var = tbn.running_var.numpy().copy()

    got, mut = BatchNorm(C, train=True).apply(
        {"params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
         "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), want_mean,
                               rtol=1e-4, atol=1e-5)
    # torch updates running_var with the UNBIASED batch variance; flax uses
    # the biased one — for N=100 samples/channel the relative gap is 1/99.
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]), want_var,
                               rtol=2e-2, atol=1e-3)


def test_resnet_bottleneck_block_parity_with_torch():
    """One converted bottleneck (stride-2, downsample) matches a hand-built
    torch equivalent of torchvision's Bottleneck in eval mode."""
    from lfvdm_tpu.evals.carla_regressor import Bottleneck

    f, cin = 4, 8

    class TorchBottleneck(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, f, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(f)
            self.conv2 = torch.nn.Conv2d(f, f, 3, stride=2, padding=1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(f)
            self.conv3 = torch.nn.Conv2d(f, f * 4, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(f * 4)
            self.down_conv = torch.nn.Conv2d(cin, f * 4, 1, stride=2, bias=False)
            self.down_bn = torch.nn.BatchNorm2d(f * 4)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + self.down_bn(self.down_conv(x)))

    tb = TorchBottleneck().eval()
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(_t(RNG.standard_normal(m.weight.shape) * 0.1))
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(_t(RNG.standard_normal(m.weight.shape)))
                m.bias.copy_(_t(RNG.standard_normal(m.bias.shape)))
                m.running_mean.copy_(_t(RNG.standard_normal(m.running_mean.shape) * 0.1))
                m.running_var.copy_(_t(RNG.uniform(0.5, 2.0, m.running_var.shape)))
        x = RNG.standard_normal((2, cin, 8, 8)).astype(np.float32)
        want = tb(_t(x)).numpy()

    def conv(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))}

    def bn(m):
        return ({"scale": jnp.asarray(m.weight.detach().numpy()),
                 "bias": jnp.asarray(m.bias.detach().numpy())},
                {"mean": jnp.asarray(m.running_mean.numpy()),
                 "var": jnp.asarray(m.running_var.numpy())})

    p, s = {}, {}
    for i, (c, b) in enumerate([(tb.conv1, tb.bn1), (tb.conv2, tb.bn2),
                                (tb.conv3, tb.bn3)], start=1):
        p[f"conv{i}"] = conv(c)
        p[f"bn{i}"], s[f"bn{i}"] = bn(b)
    p["downsample_conv"] = conv(tb.down_conv)
    p["downsample_bn"], s["downsample_bn"] = bn(tb.down_bn)

    got = Bottleneck(features=f, strides=2, downsample=True).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


# ---- scripts/convert_i3d.py conventions (TF oracle) ----


def test_i3d_unit3d_consumes_tf_kernel_unchanged():
    """TF conv3d kernels are (t,h,w,in,out) already; Unit3D + frozen BN must
    reproduce tf.nn.conv3d + batch-norm-with-beta (eps 1e-3, slim default)."""
    tf = pytest.importorskip("tensorflow")

    from lfvdm_tpu.evals.i3d import Unit3D

    k = RNG.standard_normal((3, 3, 3, 2, 4)).astype(np.float32) * 0.2
    beta = RNG.standard_normal((4,)).astype(np.float32)
    mean = RNG.standard_normal((4,)).astype(np.float32) * 0.1
    var = RNG.uniform(0.5, 2.0, (4,)).astype(np.float32)
    x = RNG.standard_normal((1, 6, 8, 8, 2)).astype(np.float32)

    y = tf.nn.conv3d(tf.constant(x), tf.constant(k), strides=[1] * 5, padding="SAME")
    y = (y - mean) * tf.math.rsqrt(var + 1e-3) + beta
    want = tf.nn.relu(y).numpy()

    got = Unit3D(features=4, kernel=(3, 3, 3)).apply(
        {"params": {"conv_3d": {"kernel": jnp.asarray(k)}, "beta": jnp.asarray(beta)},
         "batch_stats": {"moving_mean": jnp.asarray(mean),
                         "moving_variance": jnp.asarray(var)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_i3d_tf_var_name_mapping():
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from convert_i3d import tf_var_to_flax

    v = np.zeros((7, 7, 7, 3, 64), np.float32)
    key, val = tf_var_to_flax("RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w", v)
    assert key == "params/Conv3d_1a_7x7/conv_3d/kernel" and val.shape == v.shape

    key, _ = tf_var_to_flax(
        "RGB/inception_i3d/Mixed_3b/Branch_0/Conv3d_0a_1x1/batch_norm/beta",
        np.zeros((1, 1, 1, 64), np.float32))
    assert key == "params/Mixed_3b/Branch_0/Conv3d_0a_1x1/beta"

    key, _ = tf_var_to_flax(
        "RGB/inception_i3d/Mixed_3b/Branch_1/Conv3d_0b_3x3/batch_norm/moving_variance",
        np.zeros((1, 1, 1, 128), np.float32))
    assert key == "batch_stats/Mixed_3b/Branch_1/Conv3d_0b_3x3/moving_variance"


# ---- lpips embedder conv convention (same (2,3,1,0) + VALID/stride) ----


def test_lpips_alexnet_first_conv_matches_torch():
    """AlexNetFeatures conv1 (11x11 stride 4, VALID) under the lpips
    converter's transpose must match torch's AlexNet features[0]."""
    from lfvdm_tpu.evals.lpips import AlexNetFeatures

    w = (RNG.standard_normal((64, 3, 11, 11)) * 0.05).astype(np.float32)
    b = RNG.standard_normal((64,)).astype(np.float32)
    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 64, 11, stride=4, padding=2)
    with torch.no_grad():
        tconv.weight.copy_(_t(w)), tconv.bias.copy_(_t(b))
        want = torch.relu(tconv(_t(x))).numpy()

    model = AlexNetFeatures()
    vars0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    params = jax.tree.map(lambda p: p, vars0["params"])
    conv1_name = sorted(params.keys())[0]
    assert params[conv1_name]["kernel"].shape == w.transpose(2, 3, 1, 0).shape, (
        conv1_name, params[conv1_name]["kernel"].shape)
    params[conv1_name]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    params[conv1_name]["bias"] = jnp.asarray(b)
    feats = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(feats[0]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_torch_default_init_matches_torch_bounds():
    """torch_style_conv_init must match torch's kaiming_uniform(a=sqrt(5))
    default: uniform in [-1/sqrt(fan_in), 1/sqrt(fan_in)] — NOT sqrt(3)x
    wider (the reviewer-caught 3x-variance bug)."""
    from lfvdm_tpu.models.nn import torch_style_conv_init

    shape = (3, 3, 64, 128)  # conv: fan_in = 3*3*64 = 576
    w = np.asarray(torch_style_conv_init(jax.random.PRNGKey(0), shape))
    bound = 1.0 / np.sqrt(576)
    assert np.abs(w).max() <= bound + 1e-7
    # matches torch's empirical std for the same layer shape
    tconv = torch.nn.Conv2d(64, 128, 3)
    torch_std = float(tconv.weight.detach().std())
    np.testing.assert_allclose(w.std(), torch_std, rtol=0.05)
    # uniform, not clipped-normal: near-full support coverage
    assert np.abs(w).max() > 0.95 * bound
