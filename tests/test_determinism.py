"""Determinism gates — the framework's stand-in for race detection
(SURVEY.md §5): identical inputs must give bitwise-identical outputs across
repeated runs, and finite outputs always.

Caveat: XLA CPU re-plans per available threads, so under heavy concurrent
host load repeated executions can differ in the last float64 bit; the gates
assert bitwise equality with a 1e-12 absolute escape hatch for that case
(observed once in ~10 suite runs while a benchmark subprocess saturated the
host).
"""

import numpy as np


def _assert_deterministic(a, b):
    if not np.array_equal(a, b):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)

import zaftpu
from zaftpu.core.windows import hamming, vorbis


def test_repeated_runs_bitwise_identical(signal, hamming_window):
    a = np.asarray(zaftpu.stft(signal, hamming_window, 1024))
    b = np.asarray(zaftpu.stft(signal, hamming_window, 1024))
    _assert_deterministic(a, b)
    ra = np.asarray(zaftpu.istft(a, hamming_window, 1024))
    rb = np.asarray(zaftpu.istft(b, hamming_window, 1024))
    _assert_deterministic(ra, rb)


def test_sharded_repeated_runs_bitwise_identical(signal, hamming_window):
    from zaftpu.sharding import make_mesh, stft_sharded

    mesh = make_mesh(4)
    a = np.asarray(stft_sharded(signal, hamming_window, 1024, mesh))
    b = np.asarray(stft_sharded(signal, hamming_window, 1024, mesh))
    _assert_deterministic(a, b)


def test_all_transforms_finite(signal, hamming_window):
    fbank = zaftpu.melfilterbank(44100, 2048, 40)
    win = vorbis(2048)
    outputs = [
        zaftpu.stft(signal, hamming_window, 1024),
        zaftpu.mfcc(signal, hamming_window, 1024, fbank, 20),
        zaftpu.mdct(signal, win),
        zaftpu.dct(signal[:1024], 2),
        zaftpu.dst(signal[:1024], 3),
    ]
    for out in outputs:
        assert np.isfinite(np.asarray(out)).all()


def test_silence_produces_finite_mfcc(hamming_window):
    """All-zero input exercises the log(+eps) floor — must stay finite."""
    silence = np.zeros(44100)
    fbank = zaftpu.melfilterbank(44100, 2048, 40)
    out = np.asarray(zaftpu.mfcc(silence, hamming_window, 1024, fbank, 20))
    assert np.isfinite(out).all()
