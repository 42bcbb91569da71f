"""STFT/ISTFT parity, round-trip SNR gates, batching, and dtype policy."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import snr_db
from zaftpu import istft, stft
from zaftpu.core import frame as zframe
from zaftpu.core.windows import hamming
from zaftpu.transforms.stft import spectrogram

STEP = 1024


def test_stft_matches_reference_golden(golden, signal, hamming_window):
    mine = np.asarray(stft(signal, hamming_window, STEP))
    ref = golden["stft"]
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_istft_matches_reference_golden(golden, hamming_window):
    mine = np.asarray(istft(golden["stft"], hamming_window, STEP))
    np.testing.assert_allclose(mine, golden["istft"], atol=1e-12)


def test_roundtrip_snr_f64(signal, hamming_window):
    rec = np.asarray(istft(stft(signal, hamming_window, STEP),
                           hamming_window, STEP))
    # Reference measures 311.7 dB on its fixture (BASELINE.md).
    assert snr_db(signal, rec) > 300.0


def test_roundtrip_snr_f32(signal, hamming_window):
    x32 = signal.astype(np.float32)
    spec = stft(x32, hamming_window.astype(np.float32), STEP)
    assert spec.dtype == jnp.complex64
    rec = np.asarray(istft(spec, hamming_window.astype(np.float32), STEP))
    assert rec.dtype == np.float32
    assert snr_db(x32, rec) > 100.0


def test_frame_count_formula(signal, hamming_window):
    # T = ceil(((N + 2*floor(WL/2)) - WL)/step) + 1 (reference zaf.py:102-109)
    n, wl = len(signal), len(hamming_window)
    _, _, t = zframe.stft_padding(n, wl, STEP)
    expected = int(np.ceil(((n + 2 * (wl // 2)) - wl) / STEP)) + 1
    assert t == expected
    assert stft(signal, hamming_window, STEP).shape == (wl, t)


def test_non_dividing_step_gather_path(signal):
    # step that does not divide WL exercises the gather fallback.
    win = hamming(2048)
    s = 1000
    spec = np.asarray(stft(signal, win, s))
    rec = np.asarray(istft(spec, win, s))
    # Not COLA-exact for arbitrary hops, but framing/OLA geometry must agree
    # with the formulas: output length = T*s + WL - s - 2*(WL - s).
    _, _, t = zframe.stft_padding(len(signal), 2048, s)
    assert spec.shape == (2048, t)
    assert rec.shape == (t * s + 2048 - s - 2 * (2048 - s),)


def test_batched_matches_loop(signal, hamming_window):
    batch = np.stack([signal, signal[::-1]])
    spec = np.asarray(stft(batch, hamming_window, STEP))
    for i in range(2):
        np.testing.assert_allclose(
            spec[i], np.asarray(stft(batch[i], hamming_window, STEP)),
            atol=1e-12)
    rec = np.asarray(istft(spec, hamming_window, STEP))
    for i in range(2):
        np.testing.assert_allclose(
            rec[i], np.asarray(istft(spec[i], hamming_window, STEP)),
            atol=1e-12)


def test_spectrogram_fast_path(golden, signal, hamming_window):
    mag = np.asarray(spectrogram(signal, hamming_window, STEP))
    full = np.abs(golden["stft"][1:1025, :])
    np.testing.assert_allclose(mag, full, atol=1e-12)


def test_masked_istft_non_hermitian(signal, hamming_window):
    """ISTFT must treat arbitrary (masked) spectra like the reference:
    real(ifft(X)), not an implicit Hermitian assumption."""
    spec = np.asarray(stft(signal, hamming_window, STEP))
    mask = np.ones_like(spec)
    mask[100:500, :] = 0.3  # asymmetric mask -> non-Hermitian spectrum
    masked = spec * mask
    mine = np.asarray(istft(masked, hamming_window, STEP))
    # Oracle: real part of the full complex inverse FFT + COLA (numpy).
    frames = np.real(np.fft.ifft(masked, axis=0))
    n_out = masked.shape[1] * STEP + (2048 - STEP)
    acc = np.zeros(n_out)
    for j in range(masked.shape[1]):
        acc[j * STEP:j * STEP + 2048] += frames[:, j]
    acc = acc[2048 - STEP:n_out - (2048 - STEP)]
    acc /= np.asarray(hamming_window)[::STEP].sum()
    np.testing.assert_allclose(mine, acc, atol=1e-12)


def test_cola_gain():
    win = hamming(2048)
    assert zframe.cola_gain(win, 1024) == pytest.approx(win[::1024].sum())


def test_istft_quarter_hop_reference_offset(golden):
    """At step != WL/2 the REFERENCE's istft output is offset by
    (WL - step) - floor(WL/2) samples: it trims WL - step from both ends
    (zaf.py:236-238) while the analysis centering pad is floor(WL/2)
    (zaf.py:99). zaftpu reproduces that convention exactly — the round trip
    reconstructs at 300+ dB once the documented offset is applied (found in
    round 4's k=4 hardware sweep; both implementations read -3 dB under a
    naive zero-offset comparison)."""
    import zaftpu
    from zaftpu.core.windows import hamming

    x = golden["signal"][:44100].astype(np.float64)
    wl, step = 2048, 512
    win = hamming(wl)
    rec = np.asarray(zaftpu.istft(zaftpu.stft(x, win, step), win, step))
    off = (wl - step) - wl // 2
    n = min(len(x) - off, len(rec))
    err = rec[:n] - x[off:off + n]
    snr = 10 * np.log10((x[off:off + n] ** 2).sum() / (err ** 2).sum())
    assert snr > 300.0, snr
