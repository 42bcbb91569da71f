"""FFT wrappers and spectrum-layout helpers.

The reference computes full complex FFTs everywhere — it never uses ``rfft``
(SURVEY.md L0 note). On TPU the real-input halves the FFT work and the HBM
traffic, so analysis paths here run ``rfft`` internally and reconstruct the
reference's full-spectrum convention (DC + positive + mirrored negative bins,
zaf.py:139) only at the API boundary via conjugate symmetry.

Dtype policy: all functions follow the input dtype — float32 in (TPU fast
path) gives complex64 out; float64 in (CPU parity mode with
``jax_enable_x64``) gives complex128, matching the reference bit-for-bit up to
rounding.
"""

from __future__ import annotations

import jax.numpy as jnp


def rfft(frames: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Real FFT along the last axis: ``(..., N)`` -> ``(..., N//2 + 1)``."""
    return jnp.fft.rfft(frames, n=n, axis=-1)


def fft(frames: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Full complex FFT along the last axis."""
    return jnp.fft.fft(frames, n=n, axis=-1)


def ifft(spectra: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Full complex inverse FFT along the last axis."""
    return jnp.fft.ifft(spectra, n=n, axis=-1)


def full_from_half(half: jnp.ndarray, n: int) -> jnp.ndarray:
    """Reconstruct a length-``n`` full spectrum from ``rfft`` output.

    For real input ``x``, ``FFT(x)[k] = conj(FFT(x)[n-k])``; this appends the
    mirrored conjugate bins so the result matches ``np.fft.fft`` of the real
    signal (the reference's output convention, zaf.py:139) without computing
    them.
    """
    if n % 2 == 0:
        mirror = jnp.conj(half[..., -2:0:-1])
    else:
        mirror = jnp.conj(half[..., -1:0:-1])
    return jnp.concatenate([half, mirror], axis=-1)


def real_ifft(spectra: jnp.ndarray) -> jnp.ndarray:
    """``real(ifft(X))`` along the last axis (reference zaf.py:223).

    Kept as a full complex inverse FFT (not ``irfft``) on purpose: the
    reference's ISTFT accepts arbitrary — possibly non-Hermitian, e.g.
    masked — spectra and defines the output as the real part of the complex
    inverse; ``irfft`` would silently assume symmetry and change semantics.
    """
    return jnp.real(jnp.fft.ifft(spectra, axis=-1))
