"""Convert the TF-Hub I3D (kinetics-400) checkpoint to the Flax .npz layout.

Run in an environment with tensorflow + tensorflow_hub + egress:
  python scripts/convert_i3d.py --out weights/i3d_kinetics400.npz
Then validate feature parity against the TF graph on a random clip.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

HUB_URL = "https://tfhub.dev/deepmind/i3d-kinetics-400/1"


def tf_var_to_flax(name: str, value: np.ndarray):
    """Map one TF-slim variable to its 'collection/path' npz key.

    TF names look like: RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w
    or .../batch_norm/{beta,moving_mean,moving_variance}
    or Mixed_3b/Branch_0/Conv3d_0a_1x1/...
    """
    parts = name.split("/")
    assert parts[0] == "RGB" and parts[1] == "inception_i3d"
    parts = parts[2:]
    # module path: join block names with '/', matching Flax name= values.
    if parts[-1] == "w":
        key = "params/" + "/".join(parts[:-1]) + "/kernel"
        return key, value  # TF conv3d kernel already (t, h, w, in, out)
    if parts[-1] == "b":
        return "params/" + "/".join(parts[:-1]) + "/bias", value
    if parts[-2] == "batch_norm":
        base = "/".join(parts[:-2])
        leaf = parts[-1]
        if leaf == "beta":
            return f"params/{base}/beta", value.reshape(-1)
        if leaf == "moving_mean":
            return f"batch_stats/{base}/moving_mean", value.reshape(-1)
        if leaf == "moving_variance":
            return f"batch_stats/{base}/moving_variance", value.reshape(-1)
    raise ValueError(f"unmapped variable {name}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="weights/i3d_kinetics400.npz")
    args = parser.parse_args()

    import tensorflow.compat.v1 as tf
    import tensorflow_hub as hub

    tf.disable_eager_execution()
    with tf.Graph().as_default():
        module = hub.Module(HUB_URL)
        inp = tf.placeholder(tf.float32, [1, 16, 224, 224, 3])
        logits = module(inp)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            sess.run(tf.tables_initializer())
            out = {}
            for var in tf.global_variables():
                key, val = tf_var_to_flax(var.name.split(":")[0], sess.run(var))
                out[key] = val
            clip = np.random.default_rng(0).uniform(-1, 1, (1, 16, 224, 224, 3)).astype(np.float32)
            ref_logits = sess.run(logits, {inp: clip})

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **out)
    print(f"saved {args.out} ({len(out)} tensors)")

    from lfvdm_tpu.evals.i3d import I3DFeatureExtractor

    ext = I3DFeatureExtractor(weights_path=args.out)
    ours = ext(clip)
    print("max abs diff:", np.abs(ours - ref_logits).max())
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-3)
    print("validation OK")


if __name__ == "__main__":
    main()
