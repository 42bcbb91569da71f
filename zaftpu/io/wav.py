"""WAV file I/O.

Normalization contract: integer samples are scaled by ``2^(8*itemsize - 1)``
on read (int16 -> [-1, 1)), matching the reference (zaf.py:1187-1219); write
passes data through unscaled, so float in -> float WAV out.

Deliberate divergence from the reference for *float-format* WAV files: the
reference divides every dtype by ``2^(8*itemsize - 1)`` including float32/64
(zaf.py:1202), which shrinks already-normalized float data by 2^31/2^63 and
breaks its own read(write(x)) round trip. Here float samples pass through
unscaled (round trips are identity; gated in tests/test_io_viz.py).

A native C++ block reader (``zaftpu.io.native``) backs the streaming path for
long recordings when available; this module is the portable front end.
"""

from __future__ import annotations

import numpy as np
import scipy.io.wavfile


def wavread(audio_file):
    """Read a WAV file.

    Input:
        audio_file: path to the file
    Outputs:
        ``(audio_signal, sampling_frequency)`` — signal is float64
        ``(number_samples, number_channels)`` normalized to [-1, 1) for
        integer formats (reference zaf.py:1199-1202 contract).
    """
    sampling_frequency, audio_signal = scipy.io.wavfile.read(audio_file)
    if np.issubdtype(audio_signal.dtype, np.integer):
        audio_signal = audio_signal / float(2 ** (audio_signal.itemsize * 8 - 1))
    else:
        audio_signal = audio_signal.astype(np.float64)
    return audio_signal, sampling_frequency


def wavwrite(audio_signal, sampling_frequency, audio_file):
    """Write a WAV file (no rescaling — reference zaf.py:1207-1219 contract)."""
    scipy.io.wavfile.write(audio_file, int(sampling_frequency),
                           np.asarray(audio_signal))


def wavread_f32(audio_file):
    """Float32 fast-path read via the native C++ codec (seek-capable, no
    whole-file double conversion); SciPy fallback. Same normalization as
    :func:`wavread`.

    Returns ``(signal (N, channels) float32, sampling_frequency)``.
    """
    try:
        from zaftpu.io.native import WavFile

        handle = WavFile(audio_file)
        return handle.read(), handle.sample_rate
    except Exception:
        signal, sr = wavread(audio_file)
        return np.asarray(signal, dtype=np.float32), sr
