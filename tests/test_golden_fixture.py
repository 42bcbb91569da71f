"""Offline parity vs committed reference outputs on the REAL 23-s fixture.

golden_fixture.npz was produced by running the reference implementation on
its own ``audio_file.wav`` (tests/make_golden_fixture.py); these gates pin
the framework's f64 oracle path against it without needing /root/reference
at test time (beyond the wav file itself).
"""

import os

import numpy as np
import pytest

import zaftpu
from zaftpu.core.windows import hamming, vorbis

GOLD = os.path.join(os.path.dirname(__file__), "golden",
                    "golden_fixture.npz")
WAV = "/root/reference/audio_file.wav"
WL, STEP = 2048, 1024
STFT_FRAME_STRIDE = 31
MDCT_FRAME_STRIDE = 31
SIG_STRIDE = 37


@pytest.fixture(scope="module")
def gold():
    if not os.path.exists(GOLD):
        pytest.skip("golden_fixture.npz not generated")
    return np.load(GOLD)


@pytest.fixture(scope="module")
def mono(gold):
    if not os.path.exists(WAV):
        pytest.skip("reference fixture wav unavailable")
    x, sr = zaftpu.wavread(WAV)
    m = x.mean(axis=1)
    assert int(gold["sr"]) == sr
    # The committed head + checksums pin the wavread normalization contract.
    np.testing.assert_array_equal(m[: len(gold["mono_head"])],
                                  gold["mono_head"])
    np.testing.assert_allclose(
        [m.sum(), np.abs(m).sum()], gold["mono_checksum"], rtol=1e-12)
    return m


def test_stft_fixture_parity(gold, mono):
    spec = np.asarray(zaftpu.stft(mono, hamming(WL), STEP))
    scale = np.abs(gold["stft_cols"]).max()
    assert np.abs(
        spec[:, ::STFT_FRAME_STRIDE] - gold["stft_cols"]
    ).max() <= 1e-11 * scale
    np.testing.assert_allclose(np.abs(spec).sum(axis=0),
                               gold["stft_frame_energy"], rtol=1e-10)


def test_istft_fixture_parity(gold, mono):
    spec = zaftpu.stft(mono, hamming(WL), STEP)
    rec = np.asarray(zaftpu.istft(spec, hamming(WL), STEP))
    tol = 1e-11 * np.abs(gold["istft_head"]).max()
    assert np.abs(rec[: len(gold["istft_head"])]
                  - gold["istft_head"]).max() <= tol
    assert np.abs(rec[::SIG_STRIDE] - gold["istft_sub"]).max() <= tol


def test_mfcc_fixture_parity(gold, mono):
    fbank = zaftpu.melfilterbank(int(gold["sr"]), WL, 40)
    got = np.asarray(zaftpu.mfcc(mono, hamming(WL), STEP, fbank, 20))
    np.testing.assert_allclose(got, gold["mfcc"], atol=1e-10, rtol=1e-9)


def test_cqt_fixture_parity(gold, mono):
    sr = int(gold["sr"])
    kern = zaftpu.cqtkernel(sr, 24, 55, 3520)
    got = np.asarray(zaftpu.cqtspectrogram(mono, sr, 25, kern))
    scale = gold["cqtspectrogram"].max()
    assert np.abs(got - gold["cqtspectrogram"]).max() <= 1e-11 * scale
    got_c = np.asarray(zaftpu.cqtchromagram(mono, sr, 25, 24, kern))
    scale_c = gold["cqtchromagram"].max()
    assert np.abs(got_c - gold["cqtchromagram"]).max() <= 1e-11 * scale_c


def test_mdct_fixture_parity(gold, mono):
    coeffs = np.asarray(zaftpu.mdct(mono, vorbis(WL)))
    scale = np.abs(gold["mdct_cols"]).max()
    assert np.abs(coeffs[:, ::MDCT_FRAME_STRIDE]
                  - gold["mdct_cols"]).max() <= 1e-11 * scale
    np.testing.assert_allclose(np.abs(coeffs).sum(axis=0),
                               gold["mdct_frame_energy"], rtol=1e-10)


def test_imdct_fixture_parity(gold, mono):
    rec = np.asarray(zaftpu.imdct(zaftpu.mdct(mono, vorbis(WL)), vorbis(WL)))
    tol = 1e-11 * np.abs(gold["imdct_head"]).max()
    assert np.abs(rec[: len(gold["imdct_head"])]
                  - gold["imdct_head"]).max() <= tol
    assert np.abs(rec[-len(gold["imdct_tail"]):]
                  - gold["imdct_tail"]).max() <= tol
    assert np.abs(rec[::SIG_STRIDE] - gold["imdct_sub"]).max() <= tol
