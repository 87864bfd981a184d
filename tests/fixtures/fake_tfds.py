"""Minimal in-memory ``tensorflow_datasets`` stand-in for executing the
dataset-prep scripts (datasets/minerl.py, datasets/mazes.py) in-env.

tfds is not installed here (and its real builders need network egress), so
these fixtures implement EXACTLY the tfds API surface the two scripts
touch — ``tfds.load``, ``tfds.core.{Version,DatasetInfo,
GeneratorBasedBuilder}``, ``tfds.features.{FeaturesDict,Video}``, and the
download-manager handshake — backed by deterministic in-memory data. The
fidelity boundary is the tfds API: everything in the scripts themselves
(builder subclass, split generators, glob, export loop, on-disk layout)
executes verbatim; only the library underneath is substituted.

Video decoding note: real tfds decodes .mp4 via ffmpeg, which this image
does not have. The mazes fixture therefore writes its clip files as
npy-serialized frames with an ``.mp4`` extension, and this fake's
``Video.decode`` reads that format (after trying imageio) — the decode
happens inside the (substituted) library, exactly where ffmpeg would run.
"""

import os
import re
from pathlib import Path

import numpy as np

# name -> {split: [example dict of decoded arrays]}
_REGISTRY = {}


class _Tensor:
    """Mimics the ``.numpy()`` handle tfds items expose."""

    def __init__(self, arr):
        self._arr = np.asarray(arr)

    def numpy(self):
        return self._arr


def _snake(name):
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


class _DownloadManager:
    """``download_and_extract(url)`` -> the pre-provisioned fixture dir
    (set via FAKE_TFDS_EXTRACT_DIR), standing in for the archive.org
    download the real manager performs."""

    def download_and_extract(self, url):
        assert url.startswith("http"), url
        return Path(os.environ["FAKE_TFDS_EXTRACT_DIR"])


class Version(str):
    def __new__(cls, s):
        return super().__new__(cls, s)


class DatasetInfo:
    def __init__(self, builder=None, features=None, supervised_keys=None,
                 homepage=None):
        self.features = features


class Video:
    def __init__(self, shape=None):
        self.shape = shape

    def decode(self, v):
        if not isinstance(v, (str, Path)):
            return np.asarray(v)
        try:
            import imageio.v2 as imageio

            return np.stack(imageio.mimread(v)).astype(np.uint8)
        except Exception:
            return np.load(v, allow_pickle=False)  # fixture pseudo-mp4


class FeaturesDict:
    def __init__(self, d):
        self.d = dict(d)

    def decode(self, key, v):
        f = self.d[key]
        return f.decode(v) if hasattr(f, "decode") else np.asarray(v)


class GeneratorBasedBuilder:
    def __init__(self, data_dir=None):
        self.data_dir = data_dir

    def download_and_prepare(self):
        info = self._info()
        prepared = {}
        for split, gen in self._split_generators(_DownloadManager()).items():
            examples = sorted(gen, key=lambda kv: str(kv[0]))
            prepared[split] = [
                {k: info.features.decode(k, v) for k, v in ex.items()}
                for _, ex in examples
            ]
        _REGISTRY[_snake(type(self).__name__)] = prepared


def register(name, prepared):
    """Direct registration hook for fixture builders (e.g. the fake
    ``minerl_navigate`` package registers its data at import, the way the
    real package registers its tfds builder)."""
    _REGISTRY[name] = prepared


def load(name, data_dir=None, shuffle_files=False):
    assert not shuffle_files
    if name not in _REGISTRY:
        raise KeyError(
            f"tfds dataset {name!r} not prepared (registry: {sorted(_REGISTRY)})")
    return {
        split: [{k: _Tensor(v) for k, v in ex.items()} for ex in examples]
        for split, examples in _REGISTRY[name].items()
    }


class _Namespace:
    pass


core = _Namespace()
core.Version = Version
core.DatasetInfo = DatasetInfo
core.GeneratorBasedBuilder = GeneratorBasedBuilder

features = _Namespace()
features.FeaturesDict = FeaturesDict
features.Video = Video


def install(monkeypatch=None):
    """Install this module as ``tensorflow_datasets`` in sys.modules."""
    import sys

    this = sys.modules[__name__]
    if monkeypatch is not None:
        monkeypatch.setitem(sys.modules, "tensorflow_datasets", this)
    else:
        sys.modules["tensorflow_datasets"] = this
    return this
