"""File locking for concurrent array jobs writing shared files.

Capability parity: /root/reference/improved_diffusion/test_util.py:10-17
(``Protect(FileLock)``). Uses the ``filelock`` package when present, else a
POSIX fcntl lock — both guard the copy-on-first-read dataset cache and
idempotent eval outputs against races across concurrent jobs.
"""

from __future__ import annotations

import os


try:
    from filelock import FileLock as _FileLock

    class Protect(_FileLock):
        """Given a file path, protects concurrent accesses to it via a
        sibling .lock file (usable before the protected file exists)."""

        def __init__(self, file_path, timeout=2, **kwargs):
            path = f"{file_path}.lock"
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            super().__init__(path, timeout=timeout, **kwargs)

except ImportError:  # pragma: no cover - fcntl fallback
    import fcntl

    class Protect:  # type: ignore[no-redef]
        def __init__(self, file_path, timeout=2, **kwargs):
            self._path = f"{file_path}.lock"
            os.makedirs(os.path.dirname(os.path.abspath(self._path)), exist_ok=True)
            self._fd = None

        def __enter__(self):
            self._fd = open(self._path, "w")
            fcntl.flock(self._fd, fcntl.LOCK_EX)
            return self

        def __exit__(self, *exc):
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            self._fd.close()
            return False
