"""Drive scripts/convert_i3d.py's REAL main() against the TF1 fixture.

Usage: python tests/fixtures/run_convert_i3d.py <out.npz>

Installs a fake ``tensorflow_hub`` module whose Module builds the seeded
fixture graph, then executes the converter script verbatim (argument
plumbing, tf.global_variables walking, npz naming, consumer load, numeric
validation). Afterwards runs the long-clip head check the 16-frame protocol
can't see. Run in a subprocess: the script disables TF eager globally.
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

import tf_i3d_fixture

hub = types.ModuleType("tensorflow_hub")
hub.Module = tf_i3d_fixture.Module
sys.modules["tensorflow_hub"] = hub

out = sys.argv[1]
sys.argv = ["convert_i3d.py", "--out", out]
runpy.run_path(os.path.join(REPO, "scripts", "convert_i3d.py"), run_name="__main__")

tf_i3d_fixture.validate_long_clip(out)
print("RUNNER-OK")
