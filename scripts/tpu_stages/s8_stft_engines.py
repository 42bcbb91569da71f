"""Stage 8: FFT-engine A/B for the STFT hot path at 10-minute scale.

The native TPU FFT runs the hour-scale STFT at ~4% of HBM peak
(docs/tpu_results/mfu.json) — the MXU sits idle. This stage races the
formulations of the same 10-min STFT + ISTFT (window 2048, step 1024,
reference workload zaf.py:94-141): see ARMS below — native FFT, direct
DFT-as-GEMM at both precisions, four-step matmul FFT, the auto default,
the opt-in fused Pallas kernel, and the strided-conv formulation.

Each arm runs in a worker subprocess (env is baked at trace time).
Prints ONE JSON line; the winner feeds the default-dispatch decision.
"""

import json
import os
import subprocess
import sys
import time

WORKER = "ZAFTPU_ENGINE_AB_WORKER"


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn):
    """The repo-standard tunnel timing harness
    (``zaftpu.utils.profiling.timed``): dispatch-amortized, idle-sync-
    subtracted, dispatch count auto-sized for ~2 s of device work, min over
    3 blocks — one implementation instead of per-stage copies. Returns
    ``(seconds_per_call, last_output)``."""
    from zaftpu.utils.profiling import timed

    out, stats = timed("s8", fn, reps=3, dispatches=8, target_s=2.0,
                       log=False)
    return stats.seconds, out


def worker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import zaftpu
    from zaftpu.core.frame import stft_padding
    from zaftpu.core.windows import hamming
    from zaftpu.utils.profiling import fetch_sync

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1
    sr, wl, step, secs = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sr * secs).astype(np.float32))
    win = hamming(wl).astype(np.float32)
    frames = stft_padding(sr * secs, wl, step)[2]

    t_c0 = time.perf_counter()
    spec = zaftpu.stft(x, win, step)
    fetch_sync(spec)
    compile_s = time.perf_counter() - t_c0
    stft_s, spec = _timed(lambda: zaftpu.stft(x, win, step))

    istft_s, rec = _timed(lambda: zaftpu.istft(spec, win, step))

    # Accuracy guard: round-trip SNR vs the (COLA, 50%-overlap) input,
    # aligned from sample 0 exactly as bench.py's gate.
    rec_h = np.asarray(rec).astype(np.float64)
    ref = np.asarray(x).astype(np.float64)
    n1 = min(len(rec_h), len(ref))
    snr = 10 * np.log10(float((ref[:n1] ** 2).sum())
                        / float(((rec_h[:n1] - ref[:n1]) ** 2).sum()))

    # MDCT/IMDCT on the same engine arm (direct mode folds the whole
    # pre/FFT/post chain into one (WL, WL/2) GEMM).
    from zaftpu.core.windows import vorbis

    tdac = vorbis(wl).astype(np.float32)
    t_mdct = int(np.ceil(sr * secs / step)) + 1
    mdct_s, out = _timed(lambda: zaftpu.mdct(x, tdac))
    imdct_s, rec2 = _timed(lambda: zaftpu.imdct(out, tdac))
    rec2_h = np.asarray(rec2).astype(np.float64)
    n2 = min(len(rec2_h), len(ref))
    snr2 = 10 * np.log10(float((ref[:n2] ** 2).sum())
                         / float(((rec2_h[:n2] - ref[:n2]) ** 2).sum()))

    from zaftpu import pallas as _zpallas

    print(json.dumps({
        "ok": True,
        "fft": os.environ.get("ZAFTPU_FFT", "auto"),
        "pallas": os.environ.get("ZAFTPU_PALLAS", "auto"),
        "stft_mode": ("fused" if os.environ.get("ZAFTPU_FUSED")
                      else "default"),
        # Honesty flag (the round-2 mirror-probe lesson): if the guarded
        # wrapper latched the Pallas kernels off mid-arm, the numbers above
        # measured the XLA fallback, NOT the mode the env labels claim.
        "pallas_fallback": bool(_zpallas._broken),
        "precision": os.environ.get("ZAFTPU_PRECISION", "highest"),
        "compile_s": round(compile_s, 2),
        "stft_frames_per_s": round(frames / stft_s, 1),
        "istft_frames_per_s": round(frames / istft_s, 1),
        "round_trip_snr_db": round(snr, 1),
        "mdct_frames_per_s": round(t_mdct / mdct_s, 1),
        "imdct_frames_per_s": round(t_mdct / imdct_s, 1),
        "mdct_round_trip_snr_db": round(snr2, 1),
    }))
    return 0


ARMS = (
    ("native", {"ZAFTPU_FFT": "native"}),
    ("direct", {"ZAFTPU_FFT": "matmul", "ZAFTPU_PALLAS": "0"}),
    ("direct_high", {"ZAFTPU_FFT": "matmul", "ZAFTPU_PALLAS": "0",
                     "ZAFTPU_PRECISION": "high"}),
    # Manual 4-pass bf16-split GEMM: keeps the lo@lo term HIGH drops, so it
    # clears the 96 dB gate (~108 dB) at 4 MXU passes vs HIGHEST's 6.
    ("direct_split4", {"ZAFTPU_FFT": "matmul", "ZAFTPU_PALLAS": "0",
                       "ZAFTPU_PRECISION": "split4"}),
    ("foursteps", {"ZAFTPU_FFT": "matmul", "ZAFTPU_PALLAS": "0",
                   "ZAFTPU_FFT_DIRECT_MAX": "0"}),
    # Default dispatch: ZAFTPU_FFT=auto -> direct GEMMs on TPU, Pallas on.
    ("auto_default", {}),
    # Opt-in fused framing+window+DFT Pallas kernel (frames never in HBM).
    ("fused", {"ZAFTPU_FUSED": "1"}),
    # Fused kernel with the in-VMEM 4-pass bf16-split dot (the headline
    # precision dial): host-presplit bf16 operators + reduce_precision
    # frame split inside the kernel.
    ("fused_split4", {"ZAFTPU_FUSED": "1", "ZAFTPU_PRECISION": "split4"}),
)


def main():
    if os.environ.get(WORKER) == "1":
        return worker()
    results = {}
    consecutive_timeouts = 0
    for label, extra in ARMS:
        if consecutive_timeouts >= 2:
            # Two arms in a row hitting the full 600 s budget means the
            # tunnel is wedged, not that the programs are slow — don't burn
            # the remaining arms' budgets (observed 2026-08-17T23:xx: a
            # wedge mid-sweep cost 8 x 600 s of blocked sessions).
            results[label] = {"ok": False, "reason": "skipped: tunnel wedged"}
            continue
        env = dict(os.environ, **extra)
        env[WORKER] = "1"
        log(f"--- engine arm: {label} ({extra})")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=600, capture_output=True, text=True)
            log(proc.stderr[-2000:])
            results[label] = (json.loads(proc.stdout.strip().splitlines()[-1])
                              if proc.returncode == 0 and proc.stdout.strip()
                              else {"ok": False, "rc": proc.returncode})
            consecutive_timeouts = 0
        except subprocess.TimeoutExpired:
            results[label] = {"ok": False, "reason": "timeout"}
            consecutive_timeouts += 1
        # Per-arm status is "arm_ok": the watcher's rerun check greps the
        # whole result file for '"ok": false', and a failed *informational*
        # arm must not force an endless rerun of the whole sweep.
        results[label]["arm_ok"] = results[label].pop("ok", False)
        log(f"{label}: {results[label]}")
    # The fused/conv arms are informational: the fused kernel failing under
    # the remote Mosaic compiler IS a result (tracked by stage s9), and conv
    # is a known non-viable formulation at this scale. Engine arms gate ok.
    gating = [r for label, r in results.items()
              if label not in ("fused", "fused_split4", "conv")]
    print(json.dumps({"ok": all(r.get("arm_ok") for r in gating),
                      "arms": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
