"""Streaming block reader: the data-loading path for long recordings.

Hour-scale audio should not be materialized whole before analysis. A
:class:`BlockReader` yields fixed-size float32 sample blocks with
``window_length - step`` overlap carried between blocks, so per-block STFT /
mel / CQT results concatenate exactly to the whole-signal result (the same
halo geometry the sharded transforms use across devices — here applied
across time on one host). Decoding runs on the native C++ codec
(``zaftpu.io.native``) when available — seek-by-frame, no whole-file load —
with a SciPy ``mmap`` fallback.
"""

from __future__ import annotations

import numpy as np


class BlockReader:
    """Iterate a WAV file as overlapping mono float32 blocks.

    Args:
        path: WAV file path.
        block_samples: samples per yielded block (hop between block starts).
        overlap: extra trailing samples appended to each block (e.g.
            ``window_length - step`` so frame analysis is seamless across
            block boundaries); the final block is zero-padded to full size.
        mono: average channels (the reference examples' convention).

    Yields ``(start_sample, block)`` with ``block.shape == (block_samples +
    overlap,)``.
    """

    def __init__(self, path, block_samples: int, overlap: int = 0,
                 mono: bool = True):
        self.path = path
        self.block_samples = int(block_samples)
        self.overlap = int(overlap)
        self.mono = mono
        self._native = None
        self._mmap = None
        try:
            from zaftpu.io.native import WavFile

            self._native = WavFile(path)
            self.sample_rate = self._native.sample_rate
            self.channels = self._native.channels
            self.frames = self._native.frames
        except Exception:
            import scipy.io.wavfile

            sr, data = scipy.io.wavfile.read(path, mmap=True)
            self.sample_rate = sr
            self._mmap = data
            self.channels = 1 if data.ndim == 1 else data.shape[1]
            self.frames = data.shape[0]

    @property
    def num_blocks(self) -> int:
        return -(-self.frames // self.block_samples)

    def read_block(self, index: int) -> np.ndarray:
        """Block ``index`` as ``(block_samples + overlap,)`` float32."""
        start = index * self.block_samples
        want = self.block_samples + self.overlap
        if self._native is not None:
            data = self._native.read(start, min(want, self.frames - start))
        else:
            raw = self._mmap[start:start + want]
            if np.issubdtype(raw.dtype, np.integer):
                data = raw.astype(np.float32) / float(
                    2 ** (raw.dtype.itemsize * 8 - 1))
            else:
                data = raw.astype(np.float32)
            if data.ndim == 1:
                data = data[:, None]
        block = data.mean(axis=1) if self.mono else data
        if block.shape[0] < want:
            pad = [(0, want - block.shape[0])] + [(0, 0)] * (block.ndim - 1)
            block = np.pad(block, pad)
        return np.ascontiguousarray(block, dtype=np.float32)

    def read_span(self, start: int, count: int) -> np.ndarray:
        """Arbitrary ``(count,)`` span in sample coordinates, zero-filled
        outside the file — the primitive the resumable pipelines use to read
        the *padded* signal stream without materializing it."""
        width = () if self.mono else (self.channels,)
        lo = max(start, 0)
        hi = min(start + count, self.frames)
        if hi <= lo:
            return np.zeros((count, *width), dtype=np.float32)
        if self._native is not None:
            data = self._native.read(lo, hi - lo)
        else:
            raw = self._mmap[lo:hi]
            if np.issubdtype(raw.dtype, np.integer):
                data = raw.astype(np.float32) / float(
                    2 ** (raw.dtype.itemsize * 8 - 1))
            else:
                data = raw.astype(np.float32)
            if data.ndim == 1:
                data = data[:, None]
        chunk = data.mean(axis=1) if self.mono else data
        out = np.zeros((count, *width), dtype=np.float32)
        out[lo - start:lo - start + chunk.shape[0]] = chunk
        return out

    def __iter__(self):
        for i in range(self.num_blocks):
            yield i * self.block_samples, self.read_block(i)
