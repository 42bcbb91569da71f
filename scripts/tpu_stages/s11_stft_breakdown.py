"""Stage 11: where does the STFT spend its time on the chip?

The MFU table (docs/tpu_results/mfu.json) shows the STFT GEMMs running at
~28% of engine-FLOP peak while the MDCT's folded GEMM hits ~54% — yet both
consume the same windowed frame matrix. This stage times the STFT pipeline
cumulatively, one jitted program per prefix, at 10-min scale:

  frames     pad + framing + window            (T, WL) f32
  half       + direct rfft (cos & sin GEMMs)   (T, WL/2+1) c64
  full       + conjugate mirror                (T, WL) c64
  stft       + transpose to (WL, T)            == public zaftpu.stft
  istft pipeline mirrored: fold -> GEMMs -> +OLA (== public istft)

plus two candidate GEMM formulations measured on the same frames:

  cat1       ONE (WL, WL+2) [cos | sin] GEMM, complex-ified by slicing —
             one pass over the frame matrix instead of two
  mdct_ref   the MDCT-shaped (WL, WL/2) real GEMM — the known-54% point

The deltas between consecutive prefixes attribute time to framing, GEMM,
mirror, and transpose; cat1 vs half decides whether the two-GEMM split is
the utilization gap. Prints ONE JSON line.
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
    from zaftpu.core.frame import stft_padding
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

    @jax.jit
    def p_full(sig):
        return _fft.full_from_half(_fft.direct_rfft(frames_of(sig)), WL)

    # p_stft == zaftpu.stft's program (engine path); use the public API so
    # the number is directly comparable to s8/bench.
    def p_stft(sig):
        return zaftpu.stft(sig, win, STEP)

    # Candidate: one concatenated [cos | sin] GEMM — a single pass over the
    # frame matrix, complex assembly from two slices of one result. The
    # operator is embedded as an HLO constant inside the trace, exactly like
    # the production direct_rfft path.
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

    # Reference point: the MDCT-shaped single real GEMM on the same frames
    # (known to run at ~54% of engine peak in the MFU table).
    @jax.jit
    def p_mdct_ref(sig):
        return real_matmul(frames_of(sig), jnp.asarray(mref_np))

    out = {"ok": True, "t_frames": t, "wl": WL, "step": STEP}

    def run(name, fn, arg, gate=True):
        """``gate=False`` marks informational candidates (cat1, mdct_ref):
        their failure is a result, and must not set the stage-level
        ``"ok": false`` that makes the watcher rerun the whole stage every
        session (the s8/s10 arm_ok lesson)."""
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
    run("full", p_full, x)
    run("stft", p_stft, x)
    run("cat1", p_cat1, x, gate=False)
    run("mdct_ref", p_mdct_ref, x, gate=False)

    try:  # cat1 must be numerically equivalent to the two-GEMM stft
        err = jax.jit(lambda s: jnp.max(jnp.abs(p_cat1(s) - p_stft(s))))(x)
        out["cat1_max_abs_err"] = float(jax.device_get(err))
    except Exception as exc:  # noqa: BLE001
        out["cat1_max_abs_err"] = f"{type(exc).__name__}"[:80]

    # ISTFT pipeline: fold -> +GEMMs -> full istft (adds OLA + trim).
    spec = zaftpu.stft(x, win, STEP)
    half_1025 = WL // 2 + 1

    @jax.jit
    def p_fold(sp):
        z = jnp.swapaxes(sp, -1, -2)
        zrev = jnp.concatenate([z[..., :1], z[..., :0:-1]],
                               axis=-1)[..., :half_1025]
        return 0.5 * (z[..., :half_1025] + jnp.conj(zrev))

    @jax.jit
    def p_fold_gemms(sp):
        return _fft.direct_real_ifft(jnp.swapaxes(sp, -1, -2))

    def p_istft(sp):
        return zaftpu.istft(sp, win, STEP)

    run("ifold", p_fold, spec)
    run("ifold_gemms", p_fold_gemms, spec)
    run("istft", p_istft, spec)

    # Deltas for quick reading (negative deltas = measurement noise).
    for a, b, name in (("frames", "half", "d_gemm"),
                       ("half", "full", "d_mirror"),
                       ("full", "stft", "d_transpose"),
                       ("ifold_gemms", "istft", "d_ola")):
        if "seconds" in out.get(a, {}) and "seconds" in out.get(b, {}):
            out[name] = round(out[b]["seconds"] - out[a]["seconds"], 6)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
