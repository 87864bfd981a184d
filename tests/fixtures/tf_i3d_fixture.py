"""TF1 I3D graph fixture exposing the tensorflow_hub Module interface.

An INDEPENDENT re-implementation (raw TF1 ops, no sonnet/hub) of the
``deepmind/i3d-kinetics-400/1`` graph structure — same variable names, same
op semantics (conv3d SAME, frozen batch-norm beta/eps 1e-3, the (2,7,7)
stride-1 VALID logits avg-pool) — with seeded random weights. Driving
``scripts/convert_i3d.py``'s real ``main()`` against this fixture executes
the converter's variable walking, npz naming contract, and consumer loading
verbatim, and doubles as a full-network oracle for the Flax I3D port
(reference touchpoint: improved_diffusion/frechet_video_distance.py:72-134).
"""

import numpy as np
import tensorflow.compat.v1 as tf

# Inception-v1 mixed-block channel table (public architecture constants).
MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}

GRAPH_SEED = 20260819


def _unit3d(x, name, filters, kernel=(1, 1, 1), strides=(1, 1, 1),
            use_bn=True, relu=True):
    with tf.variable_scope(name):
        cin = int(x.shape[-1])
        w = tf.get_variable(
            "conv_3d/w", list(kernel) + [cin, filters],
            initializer=tf.truncated_normal_initializer(
                stddev=1.0 / np.sqrt(np.prod(kernel) * cin)),
        )
        y = tf.nn.conv3d(x, w, strides=[1, *strides, 1], padding="SAME")
        if use_bn:
            beta = tf.get_variable(
                "batch_norm/beta", (1, 1, 1, 1, filters),
                initializer=tf.random_normal_initializer(stddev=0.2))
            mm = tf.get_variable(
                "batch_norm/moving_mean", (1, 1, 1, 1, filters),
                initializer=tf.random_normal_initializer(stddev=0.2))
            mv = tf.get_variable(
                "batch_norm/moving_variance", (1, 1, 1, 1, filters),
                initializer=tf.random_uniform_initializer(0.5, 1.5))
            y = (y - mm) * tf.math.rsqrt(mv + 1e-3) + beta
        else:
            b = tf.get_variable(
                "conv_3d/b", (filters,),
                initializer=tf.random_normal_initializer(stddev=0.1))
            y = y + b
        if relu:
            y = tf.nn.relu(y)
        return y


def _inception(x, name, cfg):
    b0, b1a, b1b, b2a, b2b, b3 = cfg
    with tf.variable_scope(name):
        br0 = _unit3d(x, "Branch_0/Conv3d_0a_1x1", b0)
        br1 = _unit3d(x, "Branch_1/Conv3d_0a_1x1", b1a)
        br1 = _unit3d(br1, "Branch_1/Conv3d_0b_3x3", b1b, kernel=(3, 3, 3))
        br2 = _unit3d(x, "Branch_2/Conv3d_0a_1x1", b2a)
        br2 = _unit3d(br2, "Branch_2/Conv3d_0b_3x3", b2b, kernel=(3, 3, 3))
        br3 = tf.nn.max_pool3d(x, ksize=[1, 3, 3, 3, 1], strides=[1] * 5,
                               padding="SAME")
        br3 = _unit3d(br3, "Branch_3/Conv3d_0b_1x1", b3)
        return tf.concat([br0, br1, br2, br3], axis=-1)


def build_i3d(inp):
    """Full I3D logits graph under RGB/inception_i3d scopes (seeded init)."""
    tf.set_random_seed(GRAPH_SEED)
    with tf.variable_scope("RGB"):
        with tf.variable_scope("inception_i3d"):
            x = _unit3d(inp, "Conv3d_1a_7x7", 64, kernel=(7, 7, 7),
                        strides=(2, 2, 2))
            x = tf.nn.max_pool3d(x, [1, 1, 3, 3, 1], [1, 1, 2, 2, 1], "SAME")
            x = _unit3d(x, "Conv3d_2b_1x1", 64)
            x = _unit3d(x, "Conv3d_2c_3x3", 192, kernel=(3, 3, 3))
            x = tf.nn.max_pool3d(x, [1, 1, 3, 3, 1], [1, 1, 2, 2, 1], "SAME")
            x = _inception(x, "Mixed_3b", MIXED["Mixed_3b"])
            x = _inception(x, "Mixed_3c", MIXED["Mixed_3c"])
            x = tf.nn.max_pool3d(x, [1, 3, 3, 3, 1], [1, 2, 2, 2, 1], "SAME")
            for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                         "Mixed_4f"):
                x = _inception(x, name, MIXED[name])
            x = tf.nn.max_pool3d(x, [1, 2, 2, 2, 1], [1, 2, 2, 2, 1], "SAME")
            x = _inception(x, "Mixed_5b", MIXED["Mixed_5b"])
            x = _inception(x, "Mixed_5c", MIXED["Mixed_5c"])
            # Hub logits head: (2,7,7) stride-1 VALID avg-pool -> 1x1x1 conv
            # with bias -> squeeze spatial -> mean over remaining time.
            x = tf.nn.avg_pool3d(x, ksize=[1, 2, 7, 7, 1], strides=[1] * 5,
                                 padding="VALID")
            x = _unit3d(x, "Logits/Conv3d_0c_1x1", 400, use_bn=False,
                        relu=False)
            x = tf.squeeze(x, axis=[2, 3])
            return tf.reduce_mean(x, axis=1)


class Module:
    """tensorflow_hub.Module stand-in: callable building the graph above."""

    def __init__(self, url):
        self.url = url

    def __call__(self, inp):
        return build_i3d(inp)


def validate_long_clip(npz_path, T=32, rtol=1e-3, atol=1e-3):
    """Re-build the seeded fixture graph at a LONGER clip length and check
    the Flax consumer matches — this exercises the (2,7,7) stride-1 temporal
    pooling regime (T' > 2) that a 16-frame clip cannot distinguish from a
    plain time-mean."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from lfvdm_tpu.evals.i3d import I3DFeatureExtractor

    with tf.Graph().as_default():
        inp = tf.placeholder(tf.float32, [1, T, 224, 224, 3])
        logits = build_i3d(inp)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            # The seeded graph must reproduce the exact weights the converter
            # saved (same graph seed + same build order) — assert on one
            # tensor so a reproducibility failure can't silently pass.
            saved = dict(np.load(npz_path))
            var = [v for v in tf.global_variables()
                   if v.name.startswith("RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w")][0]
            np.testing.assert_array_equal(
                sess.run(var), saved["params/Conv3d_1a_7x7/conv_3d/kernel"])
            clip = np.random.default_rng(1).uniform(
                -1, 1, (1, T, 224, 224, 3)).astype(np.float32)
            want = sess.run(logits, {inp: clip})
    ext = I3DFeatureExtractor(weights_path=npz_path)
    assert ext.pretrained
    got = ext(clip)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
    print(f"long-clip (T={T}) I3D parity OK")
