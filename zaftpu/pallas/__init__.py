"""Pallas TPU kernels and their dispatch policy.

Kernels are used automatically when running on TPU with aligned shapes
(``step % 128 == 0``, ``window_length % step == 0``, float32) and fall back
to the equivalent XLA programs otherwise. Override with ``ZAFTPU_PALLAS=1``
(force, e.g. interpret-mode debugging) or ``ZAFTPU_PALLAS=0`` (disable).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from zaftpu.core import frame as _xla_frame
from zaftpu.pallas import framing as _framing
from zaftpu.pallas import ola as _ola


def enabled() -> bool:
    env = os.environ.get("ZAFTPU_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def windowed_frames(padded, window, window_length: int, step: int,
                    number_times: int):
    """Windowed overlapped frames — Pallas single-pass kernel when eligible,
    else the XLA slice-view path. 1-D signals only hit the kernel; batched
    inputs use XLA (which vectorizes the same program)."""
    if (enabled() and padded.ndim == 1
            and _framing.supported(window_length, step, padded.dtype)):
        return _framing.frame_window(padded, window, window_length, step,
                                     number_times)
    frames = _xla_frame.extract_frames(padded, window_length, step,
                                       number_times)
    return frames * window.astype(frames.dtype)


def overlap_add(frames, step: int):
    """Overlap-add — Pallas one-write-pass kernel when eligible, else the
    XLA K-shifted-view accumulation."""
    wl = frames.shape[-1]
    if (enabled() and frames.ndim == 2 and frames.dtype == jnp.float32
            and _framing.supported(wl, step, frames.dtype)):
        return _ola.overlap_add(frames, step)
    return _xla_frame.overlap_add(frames, step)
