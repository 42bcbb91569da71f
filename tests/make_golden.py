"""Generate golden parity fixtures by *running* the reference implementation.

Usage: ``python tests/make_golden.py`` (requires /root/reference mounted).
Writes ``tests/golden/golden.npz`` with the reference's outputs on a
deterministic 1 s test signal; the test suite asserts the framework reproduces
these within float64 oracle tolerance. No reference code is vendored — only
its outputs are recorded.
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("ZAF_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")


def test_signal(seconds: float = 1.0, sr: int = 44100) -> np.ndarray:
    """Deterministic band-rich signal: chirp + tones + seeded noise."""
    t = np.arange(int(seconds * sr)) / sr
    sig = (
        0.5 * np.sin(2 * np.pi * (200 + 800 * t) * t)      # chirp
        + 0.3 * np.sin(2 * np.pi * 440.0 * t)               # A4
        + 0.2 * np.sin(2 * np.pi * 2960.0 * t)              # upper partial
        + 0.05 * np.random.default_rng(20260816).standard_normal(t.shape)
    )
    return sig


def main():
    sys.path.insert(0, REFERENCE)
    import zaf
    import scipy.signal

    sr = 44100
    x = test_signal()
    wl = 2048
    window = scipy.signal.windows.hamming(wl, sym=False)
    step = wl // 2

    stft = zaf.stft(x, window, step)
    istft = zaf.istft(stft, window, step)

    fbank = zaf.melfilterbank(sr, wl, 40)
    melspec = zaf.melspectrogram(x, window, step, fbank)
    mfcc = zaf.mfcc(x, window, step, fbank, 20)

    kernel = zaf.cqtkernel(sr, 24, 55, 3520)
    kernel_dense = np.asarray(kernel.todense())
    rows, cols = np.nonzero(kernel_dense)
    cqtspec = zaf.cqtspectrogram(x, sr, 25, kernel)
    chroma = zaf.cqtchromagram(x, sr, 25, 24, kernel)

    seg = x[:1024]
    dcts = {f"dct{t}": zaf.dct(seg, t) for t in (1, 2, 3, 4)}
    dsts = {f"dst{t}": zaf.dst(seg, t) for t in (1, 2, 3, 4)}

    vorbis = np.sin(np.pi / 2 * np.sin(np.pi / wl * np.arange(0.5, wl + 0.5)) ** 2)
    mdct = zaf.mdct(x, vorbis)
    imdct = zaf.imdct(mdct, vorbis)

    # Parameter-sweep goldens: mel filterbanks and CQT kernels at other
    # rates/sizes (construction rounding is parameter-sensitive).
    sweep = {}
    for ssr, swl, smels in [(8000, 512, 20), (16000, 1024, 32),
                            (22050, 1024, 64), (48000, 2048, 128)]:
        fb = zaf.melfilterbank(ssr, swl, smels)
        sweep[f"melfb_{ssr}_{swl}_{smels}"] = np.asarray(fb.todense())
    for ssr, sor, sfmin, sfmax in [(22050, 12, 110, 3520),
                                   (48000, 36, 60, 6000)]:
        kk = np.asarray(zaf.cqtkernel(ssr, sor, sfmin, sfmax).todense())
        rows2, cols2 = np.nonzero(kk)
        sweep[f"cqtk_{ssr}_{sor}_{sfmin}_{sfmax}_shape"] = np.array(kk.shape)
        sweep[f"cqtk_{ssr}_{sor}_{sfmin}_{sfmax}_rows"] = rows2
        sweep[f"cqtk_{ssr}_{sor}_{sfmin}_{sfmax}_cols"] = cols2
        sweep[f"cqtk_{ssr}_{sor}_{sfmin}_{sfmax}_vals"] = kk[rows2, cols2]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        signal=x,
        window=window,
        stft=stft,
        istft=istft,
        melfilterbank=np.asarray(fbank.todense()),
        melspectrogram=melspec,
        mfcc=mfcc,
        cqt_kernel_shape=np.array(kernel_dense.shape),
        cqt_kernel_rows=rows,
        cqt_kernel_cols=cols,
        cqt_kernel_vals=kernel_dense[rows, cols],
        cqtspectrogram=cqtspec,
        cqtchromagram=chroma,
        vorbis_window=vorbis,
        mdct=mdct,
        imdct=imdct,
        **dcts,
        **dsts,
        **sweep,
    )
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
