"""DCT/DST I-IV parity vs scipy and the reference goldens; inverse pairs."""

import numpy as np
import pytest
import scipy.fftpack

from zaftpu import dct, dst

N = 1024


@pytest.fixture(scope="module")
def segment(golden):
    return golden["signal"][:N]


@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_dct_vs_scipy(segment, ttype):
    mine = np.asarray(dct(segment, ttype))
    ref = scipy.fftpack.dct(segment, type=ttype, norm="ortho")
    np.testing.assert_allclose(mine, ref, atol=2e-14)


@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_dst_vs_scipy(segment, ttype):
    mine = np.asarray(dst(segment, ttype))
    ref = scipy.fftpack.dst(segment, type=ttype, norm="ortho")
    np.testing.assert_allclose(mine, ref, atol=2e-14)


@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_dct_vs_reference_golden(golden, segment, ttype):
    np.testing.assert_allclose(np.asarray(dct(segment, ttype)),
                               golden[f"dct{ttype}"], atol=2e-14)


@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_dst_vs_reference_golden(golden, segment, ttype):
    np.testing.assert_allclose(np.asarray(dst(segment, ttype)),
                               golden[f"dst{ttype}"], atol=2e-14)


@pytest.mark.parametrize("fwd,inv,fn", [(1, 1, dct), (2, 3, dct), (4, 4, dct),
                                        (1, 1, dst), (2, 3, dst), (4, 4, dst)])
def test_inverse_pairs(segment, fwd, inv, fn):
    # I<->I, II<->III, IV<->IV are mutual inverses (reference zaf.py:872-876).
    rec = np.asarray(fn(fn(segment, fwd), inv))
    np.testing.assert_allclose(rec, segment, atol=1e-12)


@pytest.mark.parametrize("fn", [dct, dst])
def test_batched_matches_loop(segment, fn):
    batch = np.stack([segment, segment[::-1], np.roll(segment, 7)])
    out = np.asarray(fn(batch, 2))
    for i in range(3):
        np.testing.assert_allclose(out[i], np.asarray(fn(batch[i], 2)),
                                   atol=1e-12)


@pytest.mark.parametrize("fn,sfn", [(dct, scipy.fftpack.dct),
                                    (dst, scipy.fftpack.dst)])
@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_odd_lengths(golden, fn, sfn, ttype):
    seg = golden["signal"][:777]
    np.testing.assert_allclose(np.asarray(fn(seg, ttype)),
                               sfn(seg, type=ttype, norm="ortho"), atol=2e-14)


@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_f32_tolerance(segment, ttype):
    seg32 = segment.astype(np.float32)
    mine = np.asarray(dct(seg32, ttype))
    assert mine.dtype == np.float32
    ref = scipy.fftpack.dct(segment, type=ttype, norm="ortho")
    np.testing.assert_allclose(mine, ref, atol=5e-4)


def test_invalid_type_raises(segment):
    with pytest.raises(ValueError):
        dct(segment, 5)
    with pytest.raises(ValueError):
        dst(segment, 0)


@pytest.mark.parametrize("fn,sfn", [(dct, scipy.fftpack.dct),
                                    (dst, scipy.fftpack.dst)])
@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_direct_matrix_parity(monkeypatch, golden, fn, sfn, ttype):
    """Under the matmul engine every type folds to one (N, N) GEMM — gate
    the closed-form matrices against scipy at oracle tolerance, on an odd
    length so no embedding symmetry can mask an index error."""
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    seg = golden["signal"][:777]
    np.testing.assert_allclose(np.asarray(fn(seg, ttype)),
                               sfn(seg, type=ttype, norm="ortho"), atol=2e-13)


@pytest.mark.parametrize("fn", [dct, dst])
@pytest.mark.parametrize("ttype", [1, 2, 3, 4])
def test_direct_matches_fft_path(monkeypatch, segment, fn, ttype):
    """Folded-GEMM and embedded-FFT formulations agree bit-tightly (the
    same transform, two programs)."""
    ref = np.asarray(fn(segment, ttype))
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    np.testing.assert_allclose(np.asarray(fn(segment, ttype)), ref,
                               atol=1e-12)
