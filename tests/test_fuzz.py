"""Property/fuzz tests: random geometries vs independent NumPy oracles.

The oracles here are written directly from the documented formulas
(SURVEY.md §2.2) with plain NumPy loops — an implementation independent of
both the reference's code and the framework's vectorized programs.
"""

import numpy as np
import pytest

import zaftpu
from zaftpu.core.windows import hamming

RNG = np.random.default_rng(123)

CONFIGS = [
    # (signal_len, window_len, step)
    (5000, 256, 128),
    (5000, 256, 64),
    (4097, 512, 256),
    (12345, 1024, 512),
    (999, 128, 128),     # no overlap
    (3000, 300, 150),    # non-power-of-two window
    (2048, 2048, 1024),  # signal length == window
    (7777, 256, 100),    # step does not divide window
]


def oracle_stft(signal, window, step):
    """Loop-and-fft oracle from the documented framing formulas."""
    n, wl = len(signal), len(window)
    pad = wl // 2
    t = int(np.ceil(((n + 2 * pad) - wl) / step)) + 1
    padded = np.zeros(t * step + (wl - step))
    padded[pad:pad + n] = signal
    frames = np.stack([padded[j * step:j * step + wl] * window
                       for j in range(t)], axis=1)
    return np.fft.fft(frames, axis=0)


def oracle_istft(spec, window, step):
    wl, t = spec.shape
    out = np.zeros(t * step + (wl - step))
    frames = np.real(np.fft.ifft(spec, axis=0))
    for j in range(t):
        out[j * step:j * step + wl] += frames[:, j]
    out = out[wl - step:len(out) - (wl - step)]
    return out / window[::step].sum()


@pytest.mark.parametrize("n,wl,step", CONFIGS)
def test_stft_matches_oracle(n, wl, step):
    signal = RNG.standard_normal(n)
    window = hamming(wl)
    mine = np.asarray(zaftpu.stft(signal, window, step))
    ref = oracle_stft(signal, window, step)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-11)


@pytest.mark.parametrize("n,wl,step", CONFIGS)
def test_istft_matches_oracle(n, wl, step):
    signal = RNG.standard_normal(n)
    window = hamming(wl)
    spec = oracle_stft(signal, window, step)
    mine = np.asarray(zaftpu.istft(spec, window, step))
    ref = oracle_istft(spec, window, step)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-11)


@pytest.mark.parametrize("n,wl,step", [(5000, 256, 128), (12345, 1024, 512),
                                       (999, 128, 32)])
def test_cola_roundtrip_random_configs(n, wl, step):
    """COLA windows (periodic hamming, step | wl, overlap >= 2x) reconstruct
    exactly — up to the reference's trim shift: istft trims ``wl - step``
    but the analysis pad is ``wl//2`` (zaf.py:99,236), so at hops other than
    50% the output is offset by ``(wl - step) - wl//2`` samples. We
    reproduce that semantic faithfully."""
    signal = RNG.standard_normal(n)
    window = hamming(wl)
    rec = np.asarray(zaftpu.istft(zaftpu.stft(signal, window, step), window,
                                  step))
    offset = (wl - step) - wl // 2
    aligned = signal[offset:offset + len(rec)]
    m = min(len(aligned), len(rec))
    err = rec[:m] - aligned[:m]
    snr = 10 * np.log10((aligned[:m] ** 2).sum() / (err ** 2).sum())
    assert snr > 280


@pytest.mark.parametrize("wl", [64, 100, 255, 1024])
@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_dct_dst_random_lengths(wl, ttype):
    import scipy.fftpack

    seg = RNG.standard_normal(wl)
    np.testing.assert_allclose(np.asarray(zaftpu.dct(seg, ttype)),
                               scipy.fftpack.dct(seg, ttype, norm="ortho"),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(zaftpu.dst(seg, ttype)),
                               scipy.fftpack.dst(seg, ttype, norm="ortho"),
                               atol=1e-12)


@pytest.mark.parametrize("wl", [64, 256, 1000])
def test_mdct_roundtrip_random_windows(wl):
    from zaftpu.core.windows import sine

    if wl % 2:
        pytest.skip("MDCT needs even window")
    signal = RNG.standard_normal(4 * wl + 17)
    win = sine(wl)
    rec = np.asarray(zaftpu.imdct(zaftpu.mdct(signal, win), win))
    m = min(len(signal), len(rec))
    err = rec[:m] - signal[:m]
    snr = 10 * np.log10((signal[:m] ** 2).sum() / (err ** 2).sum())
    assert snr > 250
