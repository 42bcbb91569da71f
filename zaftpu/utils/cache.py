"""Disk cache for precomputed operators (mel filterbanks, CQT kernels).

The reference's closest checkpointing analog is caller-side operator reuse
(kernels built once and passed around, zaf.py:354-357, 588-592; SURVEY.md
§5). The framework adds an explicit cache layer: in-memory ``lru_cache`` for
the session (in the builders themselves) plus this content-addressed ``.npz``
disk cache so expensive precomputes (the ~1 s CQT kernel FFT, and any future
large operators) survive process restarts. Keyed by builder name + exact
parameters; safe to delete at any time.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def operator_cache_dir() -> str:
    root = os.environ.get("ZAFTPU_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "zaftpu"))
    os.makedirs(root, exist_ok=True)
    return root


def _key(name: str, params: tuple) -> str:
    blob = repr((name, params)).encode()
    return f"{name}-{hashlib.sha256(blob).hexdigest()[:16]}.npz"


def cached_operator(name: str, params: tuple, build):
    """Return ``build()``'s dict of arrays, loading/saving the disk cache.

    ``build`` must return ``dict[str, np.ndarray]``; non-array metadata is
    not supported (keep it derivable from ``params``).
    """
    if os.environ.get("ZAFTPU_CACHE", "1") == "0":
        return build()
    path = os.path.join(operator_cache_dir(), _key(name, params))
    if os.path.exists(path):
        try:
            with np.load(path) as data:
                return {k: data[k] for k in data.files}
        except Exception:
            pass  # corrupt cache entry: rebuild
    arrays = build()
    # np.savez appends ".npz" when missing — keep the suffix on the temp name.
    tmp = path[:-4] + f".tmp{os.getpid()}.npz"
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    except OSError:
        pass  # cache write failure is non-fatal
    return arrays
