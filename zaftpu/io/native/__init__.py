"""ctypes loader for the native WAV codec (zaftpu/io/native/wavio.cpp).

Compiles the shared library on first use (g++, ~1 s, cached beside the
source) and exposes typed wrappers. Everything degrades gracefully: if no
compiler is available the callers fall back to the SciPy path.
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "wavio.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _lib_path() -> str:
    """Cache path keyed on the *content* of wavio.cpp — mtimes are not
    preserved by git, so an mtime-keyed cache could silently load a binary
    that predates the checked-out source."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_wavio-{digest}.so")


def _build(lib_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path + ".tmp", _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(lib_path + ".tmp", lib_path)
    except Exception:
        return False
    for stale in glob.glob(os.path.join(_DIR, "_wavio*.so")):
        if stale != lib_path:
            try:
                os.remove(stale)
            except OSError:
                pass
    return True


def load():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib_path = _lib_path()
        if not os.path.exists(lib_path) and not _build(lib_path):
            return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None
        lib.zaftpu_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        lib.zaftpu_wav_info.restype = ctypes.c_int
        lib.zaftpu_wav_read_block.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.zaftpu_wav_read_block.restype = ctypes.c_int64
        lib.zaftpu_wav_write_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.zaftpu_wav_write_f32.restype = ctypes.c_int
        lib.zaftpu_wav_write_i16.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16)]
        lib.zaftpu_wav_write_i16.restype = ctypes.c_int
        _lib = lib
        return _lib


class WavFile:
    """Seekable WAV handle backed by the native codec."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native wav codec unavailable")
        self._lib = lib
        self.path = os.fspath(path)
        sr = ctypes.c_int32()
        ch = ctypes.c_int32()
        bits = ctypes.c_int32()
        fmt = ctypes.c_int32()
        frames = ctypes.c_int64()
        rc = lib.zaftpu_wav_info(self.path.encode(), ctypes.byref(sr),
                                 ctypes.byref(ch), ctypes.byref(bits),
                                 ctypes.byref(fmt), ctypes.byref(frames))
        if rc != 0:
            raise ValueError(f"cannot parse WAV header: {path} (rc={rc})")
        self.sample_rate = sr.value
        self.channels = ch.value
        self.bits = bits.value
        self.format = fmt.value
        self.frames = frames.value

    def read(self, start: int = 0, count: int | None = None) -> np.ndarray:
        """Decode ``count`` frames from ``start`` as float32
        ``(count, channels)``, normalized to the reference contract."""
        if count is None:
            count = self.frames - start
        out = np.empty((count, self.channels), dtype=np.float32)
        got = self._lib.zaftpu_wav_read_block(
            self.path.encode(), start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got < 0:
            raise IOError(f"wav read failed (rc={got})")
        return out[:got]


def write_f32(path: str, sample_rate: int, data: np.ndarray) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native wav codec unavailable")
    data = np.ascontiguousarray(data, dtype=np.float32)
    frames = data.shape[0]
    channels = 1 if data.ndim == 1 else data.shape[1]
    rc = lib.zaftpu_wav_write_f32(
        os.fspath(path).encode(), int(sample_rate), channels, frames,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"wav write failed (rc={rc})")


def write_i16(path: str, sample_rate: int, data: np.ndarray) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native wav codec unavailable")
    data = np.ascontiguousarray(data, dtype=np.int16)
    frames = data.shape[0]
    channels = 1 if data.ndim == 1 else data.shape[1]
    rc = lib.zaftpu_wav_write_i16(
        os.fspath(path).encode(), int(sample_rate), channels, frames,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if rc != 0:
        raise IOError(f"wav write failed (rc={rc})")
