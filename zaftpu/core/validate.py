"""Input validation for the public transform surface.

The reference fails deep inside NumPy (or silently returns garbage) on
malformed inputs — e.g. a non-COLA window makes ``istft`` divide by a
near-zero gain (zaf.py:241), an odd-length MDCT window is silently floored
(zaf.py:1029), and a wrong-shape filterbank dies inside a matmul. Here every
public entry point raises a clear ``ValueError`` up front. All checks are
host-side shape/dtype/static-parameter checks, so they add nothing to the
traced program and work on tracer inputs inside a user's ``jax.jit``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_REAL_DTYPES = ("float32", "float64", "bfloat16")


def check_signal(x, name: str = "audio_signal"):
    """Real floating input of supported dtype with at least one sample."""
    dtype = jnp.asarray(x).dtype if not hasattr(x, "dtype") else x.dtype
    if str(dtype) not in _REAL_DTYPES:
        raise ValueError(
            f"{name} must be float32/float64/bfloat16 (got {dtype}); "
            "f16/int inputs have no defined parity contract — cast first")
    shape = np.shape(x) if not hasattr(x, "shape") else x.shape
    if len(shape) == 0 or shape[-1] == 0:
        raise ValueError(f"{name} needs at least one sample, got shape {shape}")
    return x


def check_spectrum(x, name: str = "audio_stft"):
    """Complex input for inverse transforms."""
    dtype = x.dtype if hasattr(x, "dtype") else jnp.asarray(x).dtype
    if not jnp.issubdtype(dtype, jnp.complexfloating):
        raise ValueError(f"{name} must be complex (got {dtype})")
    if len(x.shape) < 2:
        raise ValueError(
            f"{name} must be (window_length, number_times), got {x.shape}")
    return x


def check_window(window, name: str = "window_function", even: bool = False):
    """1-D window of length >= 2 (optionally even — the MDCT's TDAC split
    needs WL/2 exact; the reference silently floors odd lengths,
    zaf.py:1029)."""
    shape = window.shape if hasattr(window, "shape") else np.shape(window)
    if len(shape) != 1 or shape[0] < 2:
        raise ValueError(f"{name} must be 1-D with length >= 2, got {shape}")
    if even and shape[0] % 2 != 0:
        raise ValueError(
            f"{name} length must be even for the TDAC split (got {shape[0]}; "
            "the reference silently floors odd lengths — zaf.py:1029)")
    return window


def check_step(step_length: int, window_length: int) -> int:
    step_length = int(step_length)
    if not 1 <= step_length <= window_length:
        raise ValueError(
            f"step_length must be in [1, window_length={window_length}], "
            f"got {step_length}")
    return step_length


def check_cola(window, step_length: int, gain: float) -> float:
    """Reject windows whose COLA gain is effectively zero — dividing by it
    would silently amplify garbage (reference zaf.py:241 divides blindly)."""
    scale = float(np.abs(np.asarray(window, dtype=np.float64)).max())
    if abs(gain) <= 1e-9 * max(scale, 1e-30):
        raise ValueError(
            f"window has near-zero COLA gain {gain:.3e} at step "
            f"{step_length}: not a valid analysis/synthesis pair "
            "(use a periodic window with step dividing its length)")
    return gain


def check_filterbank(fbank: np.ndarray, window_length: int):
    """Filterbank columns must span bins 1..WL/2 (the reference's DC-dropped,
    Nyquist-kept convention, zaf.py:298/370)."""
    if fbank.ndim != 2 or fbank.shape[1] != window_length // 2:
        raise ValueError(
            f"mel_filterbank must be (number_mels, window_length//2 = "
            f"{window_length // 2}) for this window, got {fbank.shape}")
    return fbank
