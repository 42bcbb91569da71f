"""Window function parity vs scipy/numpy and TDAC/COLA properties."""

import numpy as np
import scipy.signal

from zaftpu.core.windows import get_window, hamming, hann, kbd, sine, vorbis


def test_hamming_periodic_matches_scipy():
    np.testing.assert_allclose(
        hamming(2048, periodic=True),
        scipy.signal.windows.hamming(2048, sym=False), atol=1e-15)


def test_hamming_symmetric_matches_numpy():
    np.testing.assert_allclose(hamming(101, periodic=False), np.hamming(101),
                               atol=1e-15)


def test_hann_matches_scipy():
    np.testing.assert_allclose(hann(1024, periodic=True),
                               scipy.signal.windows.hann(1024, sym=False),
                               atol=1e-15)


def test_trivial_length():
    assert hamming(1).tolist() == [1.0]
    assert hann(1).tolist() == [1.0]


def test_vorbis_tdac_condition():
    w = vorbis(2048)
    # Princen-Bradley: w[n]^2 + w[n + N/2]^2 == 1.
    np.testing.assert_allclose(w[:1024] ** 2 + w[1024:] ** 2, 1.0, atol=1e-14)


def test_sine_tdac_condition():
    w = sine(512)
    np.testing.assert_allclose(w[:256] ** 2 + w[256:] ** 2, 1.0, atol=1e-14)


def test_kbd_exact_tdac_condition():
    from zaftpu.core.windows import kbd_exact

    w = kbd_exact(512, 5.0)
    assert len(w) == 512
    np.testing.assert_allclose(w[:256] ** 2 + w[256:] ** 2, 1.0, atol=1e-12)


def test_kbd_matches_reference_example_formula():
    # The reference example's construction (zaf.py:1004-1010), including its
    # length-(WL-2) quirk from the clipped reverse slice.
    wl, alpha = 512, 5
    ref_kaiser = np.kaiser(wl // 2 + 1, alpha * np.pi)
    ref_cum = np.cumsum(ref_kaiser[1:wl // 2])
    ref = np.sqrt(np.concatenate((ref_cum, ref_cum[wl // 2::-1]))
                  / np.sum(ref_kaiser))
    mine = kbd(wl, alpha)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=1e-15)


def test_get_window_lookup():
    np.testing.assert_array_equal(get_window("hamming", 64), hamming(64))
    try:
        get_window("nope", 64)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
