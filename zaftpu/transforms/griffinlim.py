"""Griffin-Lim phase reconstruction (magnitude spectrogram -> waveform).

Not in the reference — an addition showcasing the framework as a substrate:
the whole iteration (inverse frames -> window-squared-normalized overlap-add
-> re-framing -> forward rfft -> phase projection) is one jitted
``lax.fori_loop`` device program over the frames-major layout, so a 32-step
reconstruction is a single dispatch.

Conventions: magnitude is ``(WL/2+1, T)`` over rfft bins 0..WL/2 (DC kept —
unlike the analysis-slice convention, reconstruction needs every bin);
framing follows the STFT grid (centering pad ``WL/2``), and the returned
signal is trimmed like :func:`zaftpu.istft`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from zaftpu.core.dispatch import zjit
from zaftpu.core import fft as _fft
from zaftpu.core import frame as _frame


@partial(zjit, static_argnames=("step_length", "iterations", "momentum"))
def _griffin_lim_core(magnitude_tf, window_function, step_length,
                      iterations, momentum):
    t, _ = magnitude_tf.shape
    wl = window_function.shape[0]
    win = window_function
    # Least-squares inverse normalization: sum of squared shifted windows
    # per output sample (floored to avoid division blowups at the edges).
    wsq = _frame.overlap_add(jnp.tile((win * win)[None, :], (t, 1)),
                             step_length)
    wsq = jnp.maximum(wsq, jnp.asarray(1e-12, wsq.dtype))

    def synthesize(spec_half):
        full = _fft.full_from_half(spec_half, wl)
        frames = _fft.real_ifft(full) * win
        return _frame.overlap_add(frames, step_length) / wsq

    def analyze(signal):
        frames = _frame.extract_frames(signal, wl, step_length, t) * win
        return _fft.rfft(frames)

    eps = jnp.asarray(1e-16, wsq.dtype)
    beta = momentum / (1.0 + momentum)

    def body(_, carry):
        angles, prev = carry
        rebuilt = analyze(synthesize(magnitude_tf * angles))
        # Fast Griffin-Lim momentum step (Perraudin et al. 2013).
        accel = rebuilt - jnp.asarray(beta, wsq.dtype) * prev
        angles = accel / jnp.maximum(jnp.abs(accel), eps)
        return angles, rebuilt

    ctype = jnp.complex64 if magnitude_tf.dtype == jnp.float32 \
        else jnp.complex128
    ones = jnp.ones_like(magnitude_tf).astype(ctype)  # zero phase start
    angles, _ = jax.lax.fori_loop(
        0, iterations, body, (ones, jnp.zeros_like(ones)))
    signal = synthesize(magnitude_tf * angles)
    edge = wl - step_length
    return signal[edge:signal.shape[0] - edge]


def griffin_lim(magnitude, window_function, step_length: int,
                iterations: int = 32, momentum: float = 0.99):
    """Reconstruct a waveform from a magnitude spectrogram.

    Inputs:
        magnitude: ``(WL/2+1, T)`` nonnegative rfft-bin magnitudes
            (DC..Nyquist).
        window_function: COLA analysis window ``(WL,)``.
        step_length: hop in samples.
        iterations: projections (one fused device loop).
        momentum: fast-Griffin-Lim acceleration (0 = classic).
    Output:
        real signal ``(T*step - WL + step,)`` (ISTFT trim conventions).
    """
    from zaftpu.utils.devcache import as_device_constant

    magnitude = jnp.asarray(magnitude)
    window_function = as_device_constant(window_function, magnitude.dtype)
    return _griffin_lim_core(jnp.swapaxes(magnitude, -1, -2),
                             window_function,
                             int(step_length), int(iterations),
                             float(momentum))
