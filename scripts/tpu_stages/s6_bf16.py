"""Stage 6: bf16 fast-path perf delta on hardware (VERDICT.md item 5).

Compares the f32 and bf16 CQT fused matmul and mel/MFCC paths, reporting
frames/s for each plus the bf16-vs-f32 accuracy (SNR vs the f32 result).
Round 3: the dial is per-transform (policy.BF16_EXEMPT) — MFCC and
melspectrogram are exempt, so their bf16 rows should now be bit-identical
to f32 (recorded as exempt_identical); the CQT stays lowered and its block
default rises to 1024 under the dial. Prints ONE JSON line.
"""

import json
import sys

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def _snr_field(out, key, ref, got):
    err = got - ref
    if not err.any():
        out[key] = "identical"  # exempt transform: dial is a no-op
    else:
        out[key] = round(
            10 * np.log10((ref ** 2).sum() / (err ** 2).sum()), 1)


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

    from zaftpu.transforms.cqt import _block_frames

    c_frames = int(sr * secs // round(sr / 25))
    try:
        r32 = bench("cqt_f32",
                    lambda: zaftpu.cqtspectrogram(x32, sr, 25, kern), c_frames)
        out["cqt_f32_block"] = _block_frames()
        with zaftpu.compute_dtype("bfloat16"):
            out["cqt_bf16_block"] = _block_frames()  # expect 1024
            rb = bench("cqt_bf16",
                       lambda: zaftpu.cqtspectrogram(x32, sr, 25, kern),
                       c_frames)
        _snr_field(out, "cqt_bf16_vs_f32_snr_db", r32, rb)
    except Exception as exc:  # keep the mfcc pair; retry next session
        out["ok"] = False
        out["cqt_error"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"cqt pair FAILED ({type(exc).__name__}) — continuing")

    m_frames = (sr * secs + 2 * (wl // 2) - wl) // step + 1
    try:
        m32 = bench("mfcc_f32", lambda: zaftpu.mfcc(x32, win, step, fbank, 20),
                    m_frames)
        with zaftpu.compute_dtype("bfloat16"):
            # mfcc is BF16_EXEMPT: the dial must be a measured no-op.
            mb = bench("mfcc_bf16",
                       lambda: zaftpu.mfcc(x32, win, step, fbank, 20),
                       m_frames)
        _snr_field(out, "mfcc_bf16_vs_f32_snr_db", m32, mb)
    except Exception as exc:
        out["ok"] = False
        out["mfcc_error"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"mfcc pair FAILED ({type(exc).__name__}) — continuing")

    try:
        s32 = bench("melspec_f32",
                    lambda: zaftpu.melspectrogram(x32, win, step, fbank),
                    m_frames)
        with zaftpu.compute_dtype("bfloat16"):
            # melspectrogram is BF16_EXEMPT too.
            sb = bench("melspec_bf16",
                       lambda: zaftpu.melspectrogram(x32, win, step, fbank),
                       m_frames)
        _snr_field(out, "melspec_bf16_vs_f32_snr_db", s32, sb)
    except Exception as exc:
        out["ok"] = False
        out["melspec_error"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"melspec pair FAILED ({type(exc).__name__}) — continuing")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
