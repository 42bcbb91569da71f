"""Four-step MXU matmul FFT vs NumPy's FFT."""

import numpy as np
import pytest

from zaftpu.core.fft import matmul_fft, matmul_rfft

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n", [256, 1024, 4096, 32768])
def test_matches_numpy_f64(n):
    x = RNG.standard_normal(n)
    mine = np.asarray(matmul_fft(x))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(mine, ref, atol=1e-10 * scale)


@pytest.mark.parametrize("n", [1024, 32768])
def test_matches_numpy_f32(n):
    x = RNG.standard_normal(n).astype(np.float32)
    mine = np.asarray(matmul_fft(x))
    assert mine.dtype == np.complex64
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(mine, ref, atol=5e-6 * scale)


def test_complex_input():
    x = RNG.standard_normal(512) + 1j * RNG.standard_normal(512)
    np.testing.assert_allclose(np.asarray(matmul_fft(x)), np.fft.fft(x),
                               atol=1e-10 * 512)


def test_batched():
    x = RNG.standard_normal((5, 1024))
    mine = np.asarray(matmul_fft(x))
    ref = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(mine, ref, atol=1e-9 * np.abs(ref).max())


def test_rfft_half():
    x = RNG.standard_normal(2048)
    np.testing.assert_allclose(np.asarray(matmul_rfft(x)),
                               np.fft.rfft(x), atol=1e-9 * 2048)


def test_non_power_of_two_raises():
    with pytest.raises(ValueError):
        matmul_fft(RNG.standard_normal(1000))
