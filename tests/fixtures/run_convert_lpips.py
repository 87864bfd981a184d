"""Drive scripts/convert_lpips.py's REAL main() against the torch fixture.

Usage: python tests/fixtures/run_convert_lpips.py <out.npz>
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

import torch_lpips_fixture

mod = types.ModuleType("lpips")
mod.LPIPS = torch_lpips_fixture.LPIPS
sys.modules["lpips"] = mod

out = sys.argv[1]
sys.argv = ["convert_lpips.py", "--out", out]
runpy.run_path(os.path.join(REPO, "scripts", "convert_lpips.py"), run_name="__main__")
print("RUNNER-OK")
