"""Griffin-Lim reconstruction quality gates."""

import numpy as np

import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.transforms.griffinlim import griffin_lim

WL, STEP = 512, 256


def spectral_error(target_mag, signal, window, step):
    spec = np.abs(np.asarray(zaftpu.stft(signal, window, step)))[:WL // 2 + 1]
    t = min(spec.shape[1], target_mag.shape[1])
    num = np.linalg.norm(spec[:, :t] - target_mag[:, :t])
    return num / np.linalg.norm(target_mag[:, :t])


def test_reconstruction_converges(golden):
    sig = golden["signal"][:44100].astype(np.float32)
    win = hamming(WL).astype(np.float32)
    mag = np.abs(np.asarray(zaftpu.stft(sig, win, STEP)))[:WL // 2 + 1]

    few = np.asarray(griffin_lim(mag, win, STEP, iterations=2))
    many = np.asarray(griffin_lim(mag, win, STEP, iterations=40))
    err_few = spectral_error(mag, few, win, STEP)
    err_many = spectral_error(mag, many, win, STEP)
    assert err_many < err_few  # more iterations -> better fit
    assert err_many < 0.1     # good spectral convergence on real audio


def test_output_shape_and_dtype(golden):
    sig = golden["signal"][:22050]
    win = hamming(WL)
    spec = np.asarray(zaftpu.stft(sig, win, STEP))
    mag = np.abs(spec)[:WL // 2 + 1]
    out = np.asarray(griffin_lim(mag, win, STEP, iterations=1))
    ref = np.asarray(zaftpu.istft(spec, win, STEP))
    assert out.shape == ref.shape
    assert out.dtype == np.float64


def test_exact_phase_fixed_point(golden):
    """Feeding magnitudes of a real signal, the true signal is (nearly) a
    fixed point: reconstruction with correct initialization error stays
    small even after a single projection."""
    sig = golden["signal"][:44100].astype(np.float32)
    win = hamming(WL).astype(np.float32)
    mag = np.abs(np.asarray(zaftpu.stft(sig, win, STEP)))[:WL // 2 + 1]
    out = np.asarray(griffin_lim(mag, win, STEP, iterations=60))
    # Signal-domain SNR is not guaranteed (global phase/shift ambiguity);
    # the invariant is spectral: |STFT(out)| ~= mag.
    assert spectral_error(mag, out, win, STEP) < 0.08
