"""Resumable streaming analysis of arbitrarily long recordings.

The failure-recovery model (SURVEY.md §5): transforms are stateless and
frame-local, so recovery = re-run the failed frame block. This module makes
that operational — a long WAV is analyzed block-by-block through
:class:`zaftpu.io.stream.BlockReader` spans, each block's features are
checkpointed to disk as soon as they're computed, and a restarted job skips
every block that already has a checkpoint. Host memory and device memory stay
bounded regardless of signal length; results are bit-identical to the
whole-signal transforms (gated in tests/test_pipeline.py).

Frame-grid geometry: global frame ``j`` covers padded-signal samples
``[j*step, j*step + window_length)`` where the padded stream is
``pad_front`` zeros + signal + trailing zeros — exactly the single-device
transform geometry, served lazily via ``read_span``.
"""

from __future__ import annotations

import os

import numpy as np

from zaftpu.io.stream import BlockReader


class StreamingTransform:
    """Drive a per-frame-block feature function over a long WAV, resumably.

    Args:
        path: WAV file.
        window_length, step: frame geometry.
        pad_front: zeros prepended to the stream (centering pad).
        number_times: total frames to produce.
        block_fn: ``(samples (block_frames*step + window_length - step,))
            -> features (block_frames, F)`` — a jitted device function.
        block_frames: frames per block.
        checkpoint_dir: directory for per-block ``.npy`` checkpoints
            (None = no checkpointing).
    """

    def __init__(self, path, window_length: int, step: int, pad_front: int,
                 number_times: int, block_fn, block_frames: int = 4096,
                 checkpoint_dir: str | None = None):
        self.reader = BlockReader(path, block_samples=block_frames * step,
                                  overlap=window_length - step)
        self.window_length = window_length
        self.step = step
        self.pad_front = pad_front
        self.number_times = number_times
        self.block_fn = block_fn
        self.block_frames = block_frames
        self.checkpoint_dir = checkpoint_dir
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    @property
    def num_blocks(self) -> int:
        return -(-self.number_times // self.block_frames)

    def _ckpt_path(self, index: int) -> str:
        return os.path.join(self.checkpoint_dir, f"block{index:08d}.npy")

    def compute_block(self, index: int) -> np.ndarray:
        """Features for frames ``[index*B, min((index+1)*B, T))``."""
        first_frame = index * self.block_frames
        span_start = first_frame * self.step - self.pad_front
        span_len = (self.block_frames * self.step
                    + self.window_length - self.step)
        samples = self.reader.read_span(span_start, span_len)
        out = np.asarray(self.block_fn(samples))
        keep = min(self.block_frames,
                   self.number_times - first_frame)
        return out[:keep]

    def run(self, progress=None):
        """All blocks, resuming from checkpoints; returns ``(T, F)``."""
        pieces = []
        for index in range(self.num_blocks):
            if self.checkpoint_dir:
                path = self._ckpt_path(index)
                if os.path.exists(path):
                    pieces.append(np.load(path))
                    continue
            block = self.compute_block(index)
            if self.checkpoint_dir:
                tmp = path + f".tmp{os.getpid()}.npy"
                np.save(tmp, block)
                os.replace(tmp, path)
            if progress:
                progress(index, self.num_blocks)
            pieces.append(block)
        return np.concatenate(pieces, axis=0)


def _frame_plan(path, window_length: int, step: int):
    from zaftpu.core import frame as _frame

    reader = BlockReader(path, block_samples=1)
    pad_front, _, t = _frame.stft_padding(reader.frames, window_length, step)
    return pad_front, t


def streaming_spectrogram(path, window, step: int, block_frames: int = 4096,
                          checkpoint_dir: str | None = None):
    """Magnitude spectrogram ``(WL/2, T)`` of an arbitrarily long WAV,
    computed in resumable blocks; bins 1..WL/2 (reference convention)."""
    import jax
    import jax.numpy as jnp

    from zaftpu.core import fft as _fft
    from zaftpu.core import frame as _frame

    window = np.asarray(window, dtype=np.float32)
    wl = len(window)
    pad_front, t = _frame_plan(path, wl, step)
    window_dev = jnp.asarray(window)

    @jax.jit
    def block_fn(samples):
        b = (samples.shape[0] - (wl - step)) // step
        frames = _frame.extract_frames(samples, wl, step, b)
        half = _fft.rfft(frames * window_dev)
        return jnp.abs(half[:, 1:])

    st = StreamingTransform(path, wl, step, pad_front, t, block_fn,
                            block_frames, checkpoint_dir)
    return st.run().T


def streaming_melspectrogram(path, window, step: int, mel_filterbank,
                             block_frames: int = 4096,
                             checkpoint_dir: str | None = None):
    """Mel spectrogram ``(M, T)`` of an arbitrarily long WAV, resumable."""
    import jax
    import jax.numpy as jnp

    from zaftpu.core import fft as _fft
    from zaftpu.core import frame as _frame
    from zaftpu.features.mel import _as_dense

    window = np.asarray(window, dtype=np.float32)
    wl = len(window)
    pad_front, t = _frame_plan(path, wl, step)
    window_dev = jnp.asarray(window)
    fbank_t = jnp.asarray(_as_dense(mel_filterbank).T.astype(np.float32))

    @jax.jit
    def block_fn(samples):
        b = (samples.shape[0] - (wl - step)) // step
        frames = _frame.extract_frames(samples, wl, step, b)
        mag = jnp.abs(_fft.rfft(frames * window_dev))[:, 1:]
        return jnp.matmul(mag, fbank_t, preferred_element_type=mag.dtype,
                          precision=jax.lax.Precision.HIGHEST)

    st = StreamingTransform(path, wl, step, pad_front, t, block_fn,
                            block_frames, checkpoint_dir)
    return st.run().T


def streaming_mfcc(path, window, step: int, mel_filterbank,
                   number_coefficients: int, block_frames: int = 4096,
                   checkpoint_dir: str | None = None):
    """MFCCs ``(number_coefficients, T)`` of an arbitrarily long WAV,
    resumable — the zaf.py:378-454 chain (power spectrogram -> mel matmul
    -> log(+eps) -> orthonormal DCT-II -> coefficients 1..C) applied per
    frame block."""
    import jax
    import jax.numpy as jnp

    from zaftpu.core import fft as _fft
    from zaftpu.core import frame as _frame
    from zaftpu.features.mel import _LOG_EPS, _as_dense, dct_ii_ortho_matrix

    window = np.asarray(window, dtype=np.float32)
    wl = len(window)
    pad_front, t = _frame_plan(path, wl, step)
    window_dev = jnp.asarray(window)
    fbank = _as_dense(mel_filterbank).astype(np.float32)
    fbank_t = jnp.asarray(fbank.T)
    dct_t = jnp.asarray(dct_ii_ortho_matrix(fbank.shape[0])
                        .T.astype(np.float32))
    c = int(number_coefficients)

    @jax.jit
    def block_fn(samples):
        b = (samples.shape[0] - (wl - step)) // step
        frames = _frame.extract_frames(samples, wl, step, b)
        power = jnp.abs(_fft.rfft(frames * window_dev))[:, 1:] ** 2
        mel = jnp.matmul(power, fbank_t, preferred_element_type=power.dtype,
                         precision=jax.lax.Precision.HIGHEST)
        logmel = jnp.log(mel + jnp.asarray(_LOG_EPS, dtype=mel.dtype))
        cep = jnp.matmul(logmel, dct_t, preferred_element_type=logmel.dtype,
                         precision=jax.lax.Precision.HIGHEST)
        return cep[:, 1:c + 1]

    st = StreamingTransform(path, wl, step, pad_front, t, block_fn,
                            block_frames, checkpoint_dir)
    return st.run().T


def streaming_cqtspectrogram(path, sampling_frequency, time_resolution,
                             cqt_kernel, block_frames: int = 256,
                             checkpoint_dir: str | None = None):
    """CQT spectrogram ``(F, T)`` of an arbitrarily long WAV, resumable.

    Frame geometry follows reference zaf.py:602-620: hop
    ``round(sr/time_resolution)``, each frame reaching ``fft_length``
    samples (the streaming "window length"), asymmetric centering pad.
    The per-block body is the fused time-domain kernel matmul
    (:func:`zaftpu.transforms.cqt._blocked_matmul_impl`), so no 32k FFT is
    ever compiled."""
    import jax
    import jax.numpy as jnp

    from zaftpu.core import policy as _policy
    from zaftpu.io.stream import BlockReader
    from zaftpu.transforms import cqt as _cqt

    kern = _cqt._as_kernel(cqt_kernel)
    step = round(float(sampling_frequency) / float(time_resolution))
    fft_length = kern.fft_length
    reader = BlockReader(path, block_samples=1)
    t = reader.frames // step
    if t < 1:
        raise ValueError("signal shorter than one CQT hop")
    pad_front = int(np.ceil((fft_length - step) / 2))
    kdtype = _policy.operator_dtype(np.float32)
    m_real, m_imag = _cqt._device_time_kernel(kern, kdtype)

    @jax.jit
    def _block_jit(samples, mr, mi):
        # Kernel operators ride as traced args, not 37 MB jaxpr constants.
        b = (samples.shape[0] - (fft_length - step)) // step
        need = _cqt._blocked_needed(b, step, fft_length)
        padded = jnp.pad(samples, (0, max(0, need - samples.shape[0])))
        return _cqt._blocked_matmul_impl(padded, mr, mi, step, fft_length,
                                         b, min(b, block_frames))

    def block_fn(samples):
        return _block_jit(samples, m_real, m_imag)

    st = StreamingTransform(path, fft_length, step, pad_front, t, block_fn,
                            block_frames, checkpoint_dir)
    return st.run().T
