"""Stage 6: bf16 fast-path perf delta on hardware (VERDICT.md item 5).

Compares the f32 and bf16 CQT fused matmul and mel/MFCC paths, reporting
frames/s for each plus the bf16-vs-f32 accuracy (SNR vs the f32 result).
Prints ONE JSON line. Exits non-zero if the bf16 path is not yet available
(so the session retries once it lands).
"""

import json
import sys

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1
    if not getattr(zaftpu, "BF16_SUPPORTED", False):
        print(json.dumps({"ok": False, "reason": "bf16 path not built yet"}))
        return 1

    sr, wl, step = 44100, 2048, 1024
    rng = np.random.default_rng(0)
    secs = 120
    x32 = jnp.asarray(rng.standard_normal(sr * secs).astype(np.float32))
    win = hamming(wl).astype(np.float32)
    fbank = zaftpu.melfilterbank(sr, wl, 40)
    kern = zaftpu.cqtkernel(sr, 24, 55.0, 3520.0)
    out = {"ok": True}

    from zaftpu.utils.profiling import timed

    def bench(name, fn, frames):
        # Repo-standard amortized harness (fixed-3-rep timing was
        # fetch-dominated at these call times).
        r, stats = timed(name, fn, reps=3, dispatches=8, target_s=2.0,
                         log=False)
        sec = stats.seconds
        out[name] = {"frames_per_s": round(frames / sec, 1),
                     "seconds": round(sec, 4)}
        log(f"{name}: {frames / sec:,.0f} fr/s")
        return np.asarray(jax.device_get(r), np.float64)

    c_frames = int(sr * secs // round(sr / 25))
    try:
        r32 = bench("cqt_f32",
                    lambda: zaftpu.cqtspectrogram(x32, sr, 25, kern), c_frames)
        with zaftpu.compute_dtype("bfloat16"):
            rb = bench("cqt_bf16",
                       lambda: zaftpu.cqtspectrogram(x32, sr, 25, kern),
                       c_frames)
        err = rb - r32
        out["cqt_bf16_vs_f32_snr_db"] = round(
            10 * np.log10((r32 ** 2).sum() / (err ** 2).sum()), 1)
    except Exception as exc:  # keep the mfcc pair; retry next session
        out["ok"] = False
        out["cqt_error"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"cqt pair FAILED ({type(exc).__name__}) — continuing")

    m_frames = (sr * secs + 2 * (wl // 2) - wl) // step + 1
    try:
        m32 = bench("mfcc_f32", lambda: zaftpu.mfcc(x32, win, step, fbank, 20),
                    m_frames)
        with zaftpu.compute_dtype("bfloat16"):
            mb = bench("mfcc_bf16",
                       lambda: zaftpu.mfcc(x32, win, step, fbank, 20),
                       m_frames)
        err = mb - m32
        out["mfcc_bf16_vs_f32_snr_db"] = round(
            10 * np.log10((m32 ** 2).sum() / (err ** 2).sum()), 1)
    except Exception as exc:
        out["ok"] = False
        out["mfcc_error"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"mfcc pair FAILED ({type(exc).__name__}) — continuing")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
