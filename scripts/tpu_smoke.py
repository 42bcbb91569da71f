"""One-shot TPU validation: run every transform family on the real chip in
float32, checking values against the CPU float64 oracle and printing timings.

Usage: ``python scripts/tpu_smoke.py [seconds]`` (default 23 s fixture).
Safe to re-run; transient tunnel failures retry once per stage.
"""

import sys
import time

import numpy as np


def stage(name, fn, retries=1):
    for attempt in range(retries + 1):
        try:
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            print(f"[ok] {name}: {dt:.2f}s {out if out else ''}", flush=True)
            return
        except Exception as exc:  # noqa: BLE001
            if attempt == retries:
                print(f"[FAIL] {name}: {exc}", flush=True)
                return
            print(f"[retry] {name}: {exc}", flush=True)
            time.sleep(5)


def main():
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming, vorbis

    print("devices:", jax.devices(), flush=True)
    x, sr = zaftpu.wavread("/root/reference/audio_file.wav")
    mono64 = x.mean(axis=1)
    mono = jnp.asarray(mono64.astype(np.float32))
    win = hamming(2048).astype(np.float32)
    tdac = vorbis(2048).astype(np.float32)
    fbank = zaftpu.melfilterbank(sr, 2048, 40)
    kern = zaftpu.cqtkernel(sr, 24, 55, 3520)

    def snr(a, b):
        n = min(len(a), len(b))
        err = np.asarray(b[:n], np.float64) - np.asarray(a[:n], np.float64)
        return 10 * np.log10((np.asarray(a[:n], np.float64) ** 2).sum()
                             / (err ** 2).sum())

    def s_stft():
        spec = zaftpu.stft(mono, win, 1024)
        rec = zaftpu.istft(spec, win, 1024)
        v = snr(mono64, np.asarray(rec))
        assert v > 100, v
        return f"roundtrip {v:.1f} dB"

    def s_mfcc():
        out = np.asarray(zaftpu.mfcc(mono, win, 1024, fbank, 20))
        assert out.shape[0] == 20 and np.isfinite(out).all()
        return out.shape

    def s_cqt():
        spec = np.asarray(zaftpu.cqtspectrogram(mono, sr, 25, kern))
        chroma = np.asarray(zaftpu.cqtchromagram(mono, sr, 25, 24, kern))
        assert np.isfinite(spec).all() and np.isfinite(chroma).all()
        return (spec.shape, chroma.shape)

    def s_mdct():
        coeffs = zaftpu.mdct(mono, tdac)
        rec = zaftpu.imdct(coeffs, tdac)
        v = snr(mono64, np.asarray(rec))
        assert v > 90, v
        return f"TDAC {v:.1f} dB"

    def s_dct():
        seg = mono[:1024]
        out = np.asarray(zaftpu.dct(seg, 2))
        import scipy.fftpack

        ref = scipy.fftpack.dct(np.asarray(seg, np.float64), 2, norm="ortho")
        assert np.abs(out - ref).max() < 5e-4
        return "scipy parity"

    def s_pallas():
        from zaftpu import pallas

        assert pallas.enabled()
        return "dispatch on"

    def s_matmul_fft():
        from zaftpu.core.fft import matmul_fft

        x = jnp.asarray(np.random.randn(44, 2048).astype(np.float32))
        out = matmul_fft(x)
        ref = np.fft.fft(np.asarray(x))
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        assert err < 1e-4, err
        return f"rel err {err:.1e}"

    stage("stft/istft", s_stft)
    stage("mfcc", s_mfcc)
    stage("cqt", s_cqt)
    stage("mdct/imdct", s_mdct)
    stage("dct", s_dct)
    stage("pallas dispatch", s_pallas)
    stage("matmul-FFT engine", s_matmul_fft)


if __name__ == "__main__":
    main()
