"""Fused mel front-end kernel (pallas/melfused.py) vs the split path
(interpret mode)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.pallas import melfused as pmelfused


@pytest.mark.parametrize("power", [False, True])
@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (512, 256, 150)])
def test_mel_rows_matches_split(power, wl, step, t, monkeypatch):
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    rng = np.random.default_rng(0)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)
    sr = 8000 if wl == 512 else 44100
    fbank = zaftpu.melfilterbank(sr, wl, 40).astype(np.float32)

    from zaftpu.core import fft as cfft
    from zaftpu.core import frame as cframe

    frames = cframe.extract_frames(jnp.asarray(padded), wl, step, t)
    half = cfft.rfft(frames * jnp.asarray(win))
    mag = jnp.abs(half[:, 1:])
    if power:
        mag = mag * mag
    ref = np.asarray(mag @ jnp.asarray(fbank.T))

    out = np.asarray(pmelfused.mel_rows(
        jnp.asarray(padded), jnp.asarray(win), jnp.asarray(fbank.T), wl,
        step, t, power, interpret=True))
    assert out.shape == ref.shape
    tol = 3e-6 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=tol)


@pytest.mark.parametrize("power", [False, True])
def test_mel_rows_split4_matches(power, monkeypatch):
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    monkeypatch.setenv("ZAFTPU_PRECISION", "split4")
    wl, step, t = 2048, 1024, 64
    rng = np.random.default_rng(1)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)
    fbank = zaftpu.melfilterbank(44100, wl, 40).astype(np.float32)
    monkeypatch.setenv("ZAFTPU_PRECISION", "highest")
    exact = np.asarray(pmelfused.mel_rows(
        jnp.asarray(padded), jnp.asarray(win), jnp.asarray(fbank.T), wl,
        step, t, power, interpret=True))
    monkeypatch.setenv("ZAFTPU_PRECISION", "split4")
    out = np.asarray(pmelfused.mel_rows(
        jnp.asarray(padded), jnp.asarray(win), jnp.asarray(fbank.T), wl,
        step, t, power, interpret=True))
    tol = 3e-5 * max(1.0, float(np.abs(exact).max()))
    np.testing.assert_allclose(out, exact, atol=tol)


def test_mel_dispatch_matches_split(monkeypatch):
    """Full melspectrogram()/mfcc() through the fused-kernel dispatch
    equals the split half-spectrum program at f32 scale tolerance."""
    rng = np.random.default_rng(2)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(2048).astype(np.float32)
    fbank = zaftpu.melfilterbank(44100, 2048, 40)
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    ref_mel = np.asarray(zaftpu.melspectrogram(sig, win, 1024, fbank))
    ref_mfcc = np.asarray(zaftpu.mfcc(sig, win, 1024, fbank, 20))
    monkeypatch.setattr(
        pmelfused, "mel_rows",
        functools.partial(pmelfused.mel_rows, interpret=True))
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_MELFUSE", "1")
    out_mel = np.asarray(zaftpu.melspectrogram(sig, win, 1024, fbank))
    out_mfcc = np.asarray(zaftpu.mfcc(sig, win, 1024, fbank, 20))
    scale = max(1.0, float(np.abs(ref_mel).max()))
    np.testing.assert_allclose(out_mel, ref_mel, atol=5e-6 * scale)
    # MFCCs pass through a log, compressing the scale; tolerance absolute.
    np.testing.assert_allclose(out_mfcc, ref_mfcc, atol=5e-4)


@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (512, 256, 150)])
def test_spec_rows_matches_split(wl, step, t, monkeypatch):
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    rng = np.random.default_rng(3)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)

    from zaftpu.core import fft as cfft
    from zaftpu.core import frame as cframe

    frames = cframe.extract_frames(jnp.asarray(padded), wl, step, t)
    half = cfft.rfft(frames * jnp.asarray(win))
    ref = np.asarray(jnp.abs(half[:, 1:]))
    out = np.asarray(pmelfused.spec_rows(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t,
        interpret=True))
    assert out.shape == ref.shape
    tol = 3e-6 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=tol)


def test_spectrogram_dispatch_matches_split(monkeypatch):
    """Full spectrogram() through the one-pass magnitude kernel equals the
    split path; sharded stays value-aligned at 1/4 shards."""
    import jax

    from zaftpu.sharding import make_mesh, spectrogram_sharded
    from zaftpu.sharding import sharded as _sharded
    from zaftpu.transforms.stft import spectrogram

    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    rng = np.random.default_rng(4)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(512).astype(np.float32)
    ref = np.asarray(spectrogram(sig, win, 256))
    monkeypatch.setattr(
        pmelfused, "spec_rows",
        functools.partial(pmelfused.spec_rows, interpret=True))
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_MELFUSE", "1")
    out = np.asarray(spectrogram(sig, win, 256))
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=5e-6 * scale)
    if len(jax.devices()) >= 4:
        monkeypatch.setattr(_sharded, "_mesh_on_tpu", lambda mesh: True)
        for size in (1, 4):
            mesh = make_mesh(size)
            sh = np.asarray(spectrogram_sharded(sig, win, 256, mesh))
            np.testing.assert_allclose(sh, out, atol=5e-6 * scale)
