"""Mel filterbank / mel spectrogram / MFCC parity and structure tests."""

import numpy as np
import scipy.fftpack

from zaftpu import melfilterbank, melspectrogram, mfcc
from zaftpu.features.mel import dct_ii_ortho_matrix

SR, WL, STEP, MELS, COEFFS = 44100, 2048, 1024, 40, 20


def test_filterbank_bitwise_vs_reference(golden):
    fbank = melfilterbank(SR, WL, MELS)
    assert fbank.shape == (MELS, WL // 2)
    np.testing.assert_array_equal(fbank, golden["melfilterbank"])


def test_filterbank_structure():
    fbank = melfilterbank(SR, WL, MELS)
    # Half-overlapping triangles: every filter peaks at 1, rows are nonneg.
    assert np.all(fbank >= 0)
    np.testing.assert_allclose(fbank.max(axis=1), 1.0)
    # Measured nnz on the reference config (SURVEY.md §2.2).
    assert (fbank != 0).sum() == 1918


def test_filterbank_cached():
    assert melfilterbank(SR, WL, MELS) is melfilterbank(SR, WL, MELS)


def test_melspectrogram_golden(golden, signal, hamming_window):
    fbank = melfilterbank(SR, WL, MELS)
    mine = np.asarray(melspectrogram(signal, hamming_window, STEP, fbank))
    np.testing.assert_allclose(mine, golden["melspectrogram"],
                               rtol=1e-10, atol=1e-12)


def test_melspectrogram_accepts_sparse(signal, hamming_window):
    import scipy.sparse

    fbank = melfilterbank(SR, WL, MELS)
    sparse = scipy.sparse.csr_matrix(fbank)
    a = np.asarray(melspectrogram(signal, hamming_window, STEP, fbank))
    b = np.asarray(melspectrogram(signal, hamming_window, STEP, sparse))
    np.testing.assert_array_equal(a, b)


def test_mfcc_golden(golden, signal, hamming_window):
    fbank = melfilterbank(SR, WL, MELS)
    mine = np.asarray(mfcc(signal, hamming_window, STEP, fbank, COEFFS))
    assert mine.shape == golden["mfcc"].shape == (COEFFS, golden["mfcc"].shape[1])
    np.testing.assert_allclose(mine, golden["mfcc"], atol=1e-10)


def test_dct_ii_matrix_vs_scipy():
    mat = dct_ii_ortho_matrix(MELS)
    ref = scipy.fftpack.dct(np.eye(MELS), axis=0, norm="ortho")
    np.testing.assert_allclose(mat, ref, atol=1e-14)
    # Orthonormality.
    np.testing.assert_allclose(mat @ mat.T, np.eye(MELS), atol=1e-13)


def test_mfcc_f32(signal, hamming_window):
    fbank = melfilterbank(SR, WL, MELS)
    out64 = np.asarray(mfcc(signal, hamming_window, STEP, fbank, COEFFS))
    out32 = np.asarray(mfcc(signal.astype(np.float32),
                            hamming_window.astype(np.float32), STEP, fbank,
                            COEFFS))
    assert out32.dtype == np.float32
    np.testing.assert_allclose(out32, out64, atol=5e-3)


import pytest


@pytest.mark.parametrize("ssr,swl,smels", [(8000, 512, 20), (16000, 1024, 32),
                                           (22050, 1024, 64),
                                           (48000, 2048, 128)])
def test_filterbank_param_sweep_vs_reference(golden, ssr, swl, smels):
    mine = melfilterbank(ssr, swl, smels)
    np.testing.assert_array_equal(mine, golden[f"melfb_{ssr}_{swl}_{smels}"])
