"""Stage 4: MFU / roofline measurement on the real chip (VERDICT.md item 2).

Times the 10-min STFT, 10-min MDCT, and the fused CQT warm on hardware, then
converts frames/s into achieved HBM GB/s and MXU GFLOP/s against TPU v5e
peaks (819 GB/s HBM, 197 TFLOP/s bf16, ~49 TFLOP/s f32). The byte models
below are the *algorithmic* traffic a fused implementation must move; the
achieved-% numbers therefore understate true HBM utilization if XLA spills
intermediates. Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

HBM_PEAK_GBS = 819.0
F32_PEAK_GFLOPS = 49_000.0
BF16_PEAK_GFLOPS = 197_000.0

SR, WL, STEP = 44100, 2048, 1024
CQT_F, CQT_L = 144, 32768  # (octave_res=24, 55-3520 Hz) kernel shape


def log(m):
    print(m, file=sys.stderr, flush=True)


def stft_model(frames):
    """Per-frame bytes/flops for STFT WL=2048, step=1024, full complex out.

    Bytes (fused ideal): input read 2x (50% overlap) = WL*4; windowed frame
    write+read around the FFT = 2*WL*4; rfft half-spectrum write = (WL/2+1)*8;
    mirrored full-spectrum write = WL*8. FLOPs: rfft ~2.5*WL*log2(WL) + window.
    """
    bytes_per = WL * 4 + 2 * WL * 4 + (WL // 2 + 1) * 8 + WL * 8
    flops_per = 2.5 * WL * np.log2(WL) + WL
    return frames * bytes_per, frames * flops_per


def mdct_model(frames):
    """MDCT WL=2048 (hop WL/2): input read 2x = WL*4; complex pre-twiddled
    frame write+read = 2*WL*8; rfft half write = (WL/2+1)*8; coeff out =
    (WL/2)*4. FLOPs: rfft + complex pre/post twiddles (6 flops per cmul)."""
    bytes_per = WL * 4 + 2 * WL * 8 + (WL // 2 + 1) * 8 + (WL // 2) * 4
    flops_per = 2.5 * WL * np.log2(WL) + 6 * WL + 6 * (WL // 2)
    return frames * bytes_per, frames * flops_per


def cqt_model(frames, block=128):
    """Fused time-domain CQT: each frame reads an L-sample window (hop 1764
    << L=32768, so reads don't amortize) and multiplies by the (L, F) real
    and imag kernel halves, which amortize over a frame block. FLOPs: two
    real (1,L)x(L,F) matmuls per frame."""
    kernel_bytes = 2 * CQT_L * CQT_F * 4 * (frames / block)
    bytes_per = frames * CQT_L * 4 + kernel_bytes + frames * CQT_F * 4
    flops = frames * 2 * 2 * CQT_L * CQT_F
    return bytes_per, flops


def main():
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.frame import stft_padding
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.utils.profiling import fetch_sync

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    secs = 600
    x = jnp.asarray(rng.standard_normal(SR * secs).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    tdac = vorbis(WL).astype(np.float32)
    out = {"ok": True, "peaks": {"hbm_gbs": HBM_PEAK_GBS,
                                 "f32_gflops": F32_PEAK_GFLOPS,
                                 "bf16_gflops": BF16_PEAK_GFLOPS}}

    def measure(name, fn, frames, model):
        try:
            fetch_sync(fn())  # warm/compile
            t0 = time.perf_counter()
            for _ in range(3):
                r = fn()
            fetch_sync(r)
            sec = (time.perf_counter() - t0) / 3
        except Exception as exc:  # keep other measurements; retry next session
            out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}) — continuing")
            return
        mbytes, mflops = model(frames)
        gbs = mbytes / sec / 1e9
        gflops = mflops / sec / 1e9
        out[name] = {
            "seconds": round(sec, 4),
            "frames_per_s": round(frames / sec, 1),
            "achieved_hbm_gbs": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 1),
            "achieved_gflops": round(gflops, 1),
            "pct_f32_peak": round(100 * gflops / F32_PEAK_GFLOPS, 2),
        }
        log(f"{name}: {sec:.3f}s  {frames / sec:,.0f} fr/s  "
            f"{gbs:.0f} GB/s ({100 * gbs / HBM_PEAK_GBS:.0f}% HBM)  "
            f"{gflops:.0f} GFLOP/s ({100 * gflops / F32_PEAK_GFLOPS:.1f}% f32)")

    t_frames = stft_padding(SR * secs, WL, STEP)[2]
    measure("stft_10min", lambda: zaftpu.stft(x, win, STEP), t_frames,
            stft_model)
    m_frames = SR * secs // STEP + 1
    measure("mdct_10min", lambda: zaftpu.mdct(x, tdac), m_frames, mdct_model)

    kern = zaftpu.cqtkernel(SR, 24, 55.0, 3520.0)
    cqt_secs = 120
    xc = x[: SR * cqt_secs]
    c_frames = int(SR * cqt_secs // round(SR / 25))
    measure("cqt_2min", lambda: zaftpu.cqtspectrogram(xc, SR, 25, kern),
            c_frames, cqt_model)

    # Binding-resource verdicts for docs/perf.md
    for name in ("stft_10min", "mdct_10min", "cqt_2min"):
        r = out[name]
        if "pct_hbm_peak" in r:
            r["binding"] = ("HBM" if r["pct_hbm_peak"] >= r["pct_f32_peak"]
                            else "MXU")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
