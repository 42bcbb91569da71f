"""Stage 11: where does the STFT spend its time on the chip?

Round-2 history: the MFU table showed the STFT GEMMs at ~28-36% of engine
peak while the MDCT's folded GEMM hit 54-68% — and the round-2 prefix
decomposition attributed the gap to the conjugate-mirror lane gather +
complex transpose. Round 3 built the bins-major mirror/fold on that
prediction and this stage's A/B PROVED IT WRONG on hardware (stft 1.49M vs
stft_old 1.72M fr/s): the defaults were reverted to the lane-gather
formulation (zaftpu/transforms/stft.py, pallas.synthesis_ola), keeping the
COLA-gain-in-operator win. The bins-major functions survive as the
measured A/B arms here.

This stage measures, at 10-min scale:

  frames        pad + framing + window                  (T, WL) f32
  half          + direct rfft (cos & sin GEMMs)         (T, WL/2+1) c64
  stft          + lane-gather mirror + complex transpose == public stft
  stft_binsmaj  the bins-major formulation (transpose planes + reversed
                major-axis concat) — the measured-slower round-3 rewrite
  cat1          ONE (WL, WL+2) [cos | sin] GEMM + the default mirror —
                single pass over the frame matrix (informational)
  stft_fused    public stft under ZAFTPU_FUSED=1 (opt-in 1-D-grid fused
                kernel; the fallback flag records whether it really ran)
  mdct_ref      the MDCT-shaped (WL, WL/2) real GEMM — the known-68% point

  istft         public ISTFT (lane fold, COLA gain in the operator)
  istft_binsmaj bins-major fold + transpose-free einsum (measured-slower)
  ifold_gemms   fold + inverse GEMMs only (no OLA/trim), default layout

Prints ONE JSON line. The engine-peak ratio for the headline:
stft engine peak = mdct_ref's fr/s x (1024/1025) x 1/2 (two GEMM components
vs one) — reported as stft_pct_of_engine_peak.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S11_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn):
    """zaftpu.utils.profiling.timed with the repo-standard tunnel settings:
    dispatch-amortized, idle-sync-subtracted, dispatch count auto-sized for
    ~2 s of device work, min over 3 blocks. Returns seconds per call."""
    from zaftpu.utils.profiling import timed

    _, stats = timed("s11", fn, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S11_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu import pallas as _pallas
    from zaftpu.core import fft as _fft
    from zaftpu.core.fft import _direct_rdft_mats
    from zaftpu.core.frame import stft_padding, cola_gain
    from zaftpu.core.policy import real_matmul
    from zaftpu.core.windows import hamming

    if (jax.default_backend() != "tpu"
            and os.environ.get("S11_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR * SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    pad_front, pad_back, t = stft_padding(SR * SECS, WL, STEP)

    def frames_of(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        return _pallas.windowed_frames(padded, win.astype(sig.dtype), WL,
                                       STEP, t)

    @jax.jit
    def p_frames(sig):
        return frames_of(sig)

    @jax.jit
    def p_half(sig):
        return _fft.direct_rfft(frames_of(sig))

    # p_stft == zaftpu.stft's program (engine path, lane-gather mirror); use
    # the public API so the number is directly comparable to s8/bench.
    def p_stft(sig):
        return zaftpu.stft(sig, win, STEP)

    # The round-3 bins-major rewrite — measured slower, kept as the A/B arm.
    @jax.jit
    def p_stft_binsmaj(sig):
        return _fft.full_from_half_t(_fft.direct_rfft(frames_of(sig)), WL)

    # Candidate: one concatenated [cos | sin] GEMM — a single pass over the
    # frame matrix — then the default lane-gather mirror + transpose.
    cos_m, sin_m = _direct_rdft_mats(WL, "float32")
    cat_np = np.concatenate([np.asarray(cos_m), np.asarray(sin_m)], axis=1)
    mref_np = np.asarray(cos_m)[:, :WL // 2].copy()

    @jax.jit
    def p_cat1(sig):
        fr = frames_of(sig)
        both = real_matmul(fr, jnp.asarray(cat_np))
        half = jax.lax.complex(both[..., :WL // 2 + 1],
                               both[..., WL // 2 + 1:])
        return jnp.swapaxes(_fft.full_from_half(half, WL), -1, -2)

    # Public stft with the fused kernel forced ON (opt-in — rejected by the
    # tunnel's Mosaic so far; the zjit dispatch snapshot keys the trace on
    # ZAFTPU_FUSED, so an in-process flip retraces). After the arm, record
    # whether the guarded wrapper latched the kernels off: if so the number
    # measured the XLA fallback, not the fused kernel (round-2 lesson).
    def p_stft_fused(sig):
        os.environ["ZAFTPU_FUSED"] = "1"
        try:
            return zaftpu.stft(sig, win, STEP)
        finally:
            os.environ.pop("ZAFTPU_FUSED", None)

    # Reference point: the MDCT-shaped single real GEMM on the same frames
    # (the known-68% engine-peak point from the MFU table).
    @jax.jit
    def p_mdct_ref(sig):
        return real_matmul(frames_of(sig), jnp.asarray(mref_np))

    out = {"ok": True, "t_frames": t, "wl": WL, "step": STEP}

    def run(name, fn, arg, gate=True):
        """``gate=False`` marks informational candidates: their failure is a
        result, and must not set the stage-level ``"ok": false`` that makes
        the watcher rerun the whole stage every session."""
        try:
            sec = _timed(lambda: fn(arg))
            out[name] = {"seconds": round(sec, 6),
                         "frames_per_s": round(t / sec, 1)}
            log(f"{name}: {sec * 1e3:.2f} ms  {t / sec:,.0f} fr/s")
        except Exception as exc:  # keep the other prefixes
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__})")

    run("frames", p_frames, x)
    run("half", p_half, x)
    run("stft", p_stft, x)
    run("stft_binsmaj", p_stft_binsmaj, x, gate=False)
    run("cat1", p_cat1, x, gate=False)
    run("stft_fused", p_stft_fused, x, gate=False)
    out["stft_fused_fallback"] = bool(_pallas._broken)
    if _pallas._broken:
        _pallas._reset_health()  # don't poison the remaining arms' dispatch
    run("mdct_ref", p_mdct_ref, x, gate=False)

    try:  # the bins-major mirror must be bit-identical to the default
        err = jax.jit(
            lambda s: jnp.max(jnp.abs(p_stft_binsmaj(s) - p_stft(s))))(x)
        out["binsmaj_vs_default_max_abs_err"] = float(jax.device_get(err))
    except Exception as exc:  # noqa: BLE001
        out["binsmaj_vs_default_max_abs_err"] = f"{type(exc).__name__}"[:80]

    # ISTFT pipeline: default (lane fold, COLA gain in the operator) vs the
    # bins-major arm.
    spec = zaftpu.stft(x, win, STEP)
    gain = cola_gain(np.asarray(win), STEP)

    @jax.jit
    def p_fold_gemms(sp):
        return _fft.direct_real_ifft(jnp.swapaxes(sp, -1, -2),
                                     scale=1.0 / gain)

    def p_istft(sp):
        return zaftpu.istft(sp, win, STEP)

    @jax.jit
    def p_istft_binsmaj(sp):
        frames = _fft.direct_real_ifft_t(sp, scale=1.0 / gain)
        sig = _pallas.overlap_add(frames, STEP)
        edge = WL - STEP
        return sig[..., edge:sig.shape[-1] - edge]

    run("ifold_gemms", p_fold_gemms, spec)
    run("istft", p_istft, spec)
    run("istft_binsmaj", p_istft_binsmaj, spec, gate=False)

    try:  # the two fold layouts must agree to f32 rounding
        err = jax.jit(
            lambda sp: jnp.max(jnp.abs(p_istft_binsmaj(sp) - p_istft(sp))))(
                spec)
        out["istft_binsmaj_vs_default_max_abs_err"] = float(
            jax.device_get(err))
    except Exception as exc:  # noqa: BLE001
        out["istft_binsmaj_vs_default_max_abs_err"] = (
            f"{type(exc).__name__}"[:80])

    # Deltas + engine-peak ratios for quick reading.
    for a, b, name in (("frames", "half", "d_gemm"),
                       ("half", "stft", "d_mirror_out"),
                       ("ifold_gemms", "istft", "d_ola")):
        if "seconds" in out.get(a, {}) and "seconds" in out.get(b, {}):
            out[name] = round(out[b]["seconds"] - out[a]["seconds"], 6)
    if ("seconds" in out.get("mdct_ref", {})
            and "seconds" in out.get("stft", {})):
        # Engine peak for the two-component (WL, WL/2+1) GEMM pair = the
        # single (WL, WL/2) GEMM's time x 2 x (1025/1024).
        ideal = out["mdct_ref"]["seconds"] * 2 * 1025 / 1024
        out["stft_pct_of_engine_peak"] = round(
            100.0 * ideal / out["stft"]["seconds"], 1)
        if "seconds" in out.get("stft_fused", {}):
            out["stft_fused_pct_of_engine_peak"] = round(
                100.0 * ideal / out["stft_fused"]["seconds"], 1)
        if "seconds" in out.get("istft", {}):
            out["istft_pct_of_engine_peak"] = round(
                100.0 * ideal / out["istft"]["seconds"], 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
