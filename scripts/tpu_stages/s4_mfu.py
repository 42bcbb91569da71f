"""Stage 4: MFU / roofline measurement on the real chip (VERDICT.md item 2).

Times the 10-min STFT/ISTFT, 10-min MDCT/IMDCT, and the fused CQT warm on
hardware (dispatch-amortized, tunnel sync overhead subtracted — the s8
harness pattern), then converts frames/s into achieved HBM GB/s and MXU
GFLOP/s against TPU v5e peaks (819 GB/s HBM, 197 TFLOP/s bf16, ~49 TFLOP/s
f32). Two FLOP models per transform: the FFT-algorithm model (what a
textbook implementation would execute) and the engine model (the GEMM
FLOPs the default ZAFTPU_FFT=auto dispatch actually runs — the deliberate
FLOPs-for-bandwidth trade). The byte models are the *algorithmic* traffic a
fused implementation must move; achieved-% understates true HBM utilization
if XLA spills intermediates. Prints ONE JSON line.
"""

import json
import sys

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
    Engine FLOPs: two (WL, WL/2+1) DFT GEMMs per frame.
    """
    bytes_per = WL * 4 + 2 * WL * 4 + (WL // 2 + 1) * 8 + WL * 8
    flops_per = 2.5 * WL * np.log2(WL) + WL
    engine_per = 2 * 2 * WL * (WL // 2 + 1)
    return frames * bytes_per, frames * flops_per, frames * engine_per


def istft_model(frames):
    """ISTFT: full-spectrum read = WL*8; Hermitian fold write+read =
    2*(WL/2+1)*8; frames write+read around OLA = 2*WL*4; signal out = STEP*4.
    FLOPs: ifft + OLA adds. Engine: two (WL/2+1, WL) folded inverse GEMMs."""
    bytes_per = WL * 8 + 2 * (WL // 2 + 1) * 8 + 2 * WL * 4 + STEP * 4
    flops_per = 2.5 * WL * np.log2(WL) + 2 * WL
    engine_per = 2 * 2 * (WL // 2 + 1) * WL
    return frames * bytes_per, frames * flops_per, frames * engine_per


def mdct_model(frames):
    """MDCT WL=2048 (hop WL/2): input read 2x = WL*4; complex pre-twiddled
    frame write+read = 2*WL*8; rfft half write = (WL/2+1)*8; coeff out =
    (WL/2)*4. FLOPs: rfft + complex pre/post twiddles (6 flops per cmul).
    Engine: one folded (WL, WL/2) GEMM per frame."""
    bytes_per = WL * 4 + 2 * WL * 8 + (WL // 2 + 1) * 8 + (WL // 2) * 4
    flops_per = 2.5 * WL * np.log2(WL) + 6 * WL + 6 * (WL // 2)
    engine_per = 2 * WL * (WL // 2)
    return frames * bytes_per, frames * flops_per, frames * engine_per


def imdct_model(frames):
    """IMDCT: coeff read = (WL/2)*4; frames write+read around OLA = 2*WL*4;
    signal out = (WL/2)*4. FLOPs: padded ifft + twiddles + window + OLA.
    Engine: one folded (WL/2, WL) GEMM per frame."""
    bytes_per = (WL // 2) * 4 + 2 * WL * 4 + (WL // 2) * 4
    flops_per = 2.5 * WL * np.log2(WL) + 6 * WL + 3 * WL
    engine_per = 2 * (WL // 2) * WL
    return frames * bytes_per, frames * flops_per, frames * engine_per


def cqt_model(frames, block=128):
    """Fused time-domain CQT: each frame reads an L-sample window (hop 1764
    << L=32768, so reads don't amortize) and multiplies by the (L, F) real
    and imag kernel halves, which amortize over a frame block. FLOPs: two
    real (1,L)x(L,F) matmuls per frame."""
    kernel_bytes = 2 * CQT_L * CQT_F * 4 * (frames / block)
    bytes_per = frames * CQT_L * 4 + kernel_bytes + frames * CQT_F * 4
    flops = frames * 2 * 2 * CQT_L * CQT_F
    return bytes_per, flops, flops  # the kernel matmul IS the engine path


def cqt_slab_model(frames, block=1024, step=1764):
    """The f32 slab-loop path actually shipped (VERDICT r3 item 6): per
    frame, the 19 hop-width slab GEMMs re-read ``n_slabs * step`` signal
    samples (the 18.6x amplification of the 50%-overlap-free CQT window);
    the (L, F) operator halves amortize over a frame block; output F
    magnitudes. NOTE the exact-path HIGHEST decomposition re-streams the
    f32 activations per MXU pass, so achieved/model > 100% of this
    single-pass model is impossible and the measured gap to HBM peak is
    the pass amplification (demonstrated by the one-pass bf16 twin at
    2.02M frames/s on identical structure — cqt_roofline.json)."""
    n_slabs = -(-CQT_L // step)
    bytes_per = n_slabs * step * 4 + CQT_F * 4
    kernel_bytes = 2 * CQT_L * CQT_F * 4 * (frames / block)
    flops = frames * 2 * 2 * CQT_L * CQT_F
    return frames * bytes_per + kernel_bytes, flops, flops


def main():
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.frame import stft_padding
    from zaftpu.core.windows import hamming, vorbis

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

    from zaftpu.utils.profiling import timed

    def measure(name, fn, frames, model):
        try:
            # The repo-standard tunnel harness (profiling.timed):
            # dispatch-amortized, idle-sync-subtracted, dispatch count
            # auto-sized for ~2 s of device work (a fixed count leaves
            # millisecond programs under the round-trip's ~10 ms jitter —
            # first-cut artifact: MDCT read "204% of f32 peak").
            _, stats = timed(name, fn, reps=3, dispatches=8, target_s=2.0,
                             log=False)
            sec = stats.seconds
        except Exception as exc:  # keep other measurements; retry next session
            out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}) — continuing")
            return
        mbytes, mflops, meng = model(frames)
        gbs = mbytes / sec / 1e9
        gflops = mflops / sec / 1e9
        geng = meng / sec / 1e9
        out[name] = {
            "seconds": round(sec, 6),
            "frames_per_s": round(frames / sec, 1),
            "achieved_hbm_gbs": round(gbs, 1),
            "pct_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 1),
            "achieved_gflops": round(gflops, 1),
            "pct_f32_peak": round(100 * gflops / F32_PEAK_GFLOPS, 2),
            "engine_gflops": round(geng, 1),
            "pct_f32_peak_engine": round(100 * geng / F32_PEAK_GFLOPS, 2),
        }
        log(f"{name}: {sec:.3f}s  {frames / sec:,.0f} fr/s  "
            f"{gbs:.0f} GB/s ({100 * gbs / HBM_PEAK_GBS:.0f}% HBM)  "
            f"{geng:.0f} engine GFLOP/s "
            f"({100 * geng / F32_PEAK_GFLOPS:.1f}% f32)")

    t_frames = stft_padding(SR * secs, WL, STEP)[2]
    measure("stft_10min", lambda: zaftpu.stft(x, win, STEP), t_frames,
            stft_model)
    spec = zaftpu.stft(x, win, STEP)
    measure("istft_10min", lambda: zaftpu.istft(spec, win, STEP), t_frames,
            istft_model)
    m_frames = SR * secs // STEP + 1
    measure("mdct_10min", lambda: zaftpu.mdct(x, tdac), m_frames, mdct_model)
    coeffs = zaftpu.mdct(x, tdac)
    measure("imdct_10min", lambda: zaftpu.imdct(coeffs, tdac), m_frames,
            imdct_model)

    kern = zaftpu.cqtkernel(SR, 24, 55.0, 3520.0)
    cqt_secs = 120
    xc = x[: SR * cqt_secs]
    c_frames = int(SR * cqt_secs // round(SR / 25))
    measure("cqt_2min", lambda: zaftpu.cqtspectrogram(xc, SR, 25, kern),
            c_frames, cqt_model)
    c10_frames = int(SR * secs // round(SR / 25))
    measure("cqt_10min", lambda: zaftpu.cqtspectrogram(x, SR, 25, kern),
            c10_frames, cqt_slab_model)

    # Binding-resource verdicts for docs/perf.md (engine FLOPs are what the
    # default dispatch actually executes on the MXU)
    for name in ("stft_10min", "istft_10min", "mdct_10min", "imdct_10min",
                 "cqt_2min", "cqt_10min"):
        r = out[name]
        if "pct_hbm_peak" in r:
            r["binding"] = ("HBM"
                            if r["pct_hbm_peak"] >= r["pct_f32_peak_engine"]
                            else "MXU")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
