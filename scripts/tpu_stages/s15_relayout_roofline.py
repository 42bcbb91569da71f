"""Stage 15: is the STFT's mirror+transpose pass at relayout speed-of-light?

Round-3 state: the fused kernel removed the frame-matrix HBM round trip
(+2.6%), the bins-major rewrite measured 13% slower and was reverted, and
the remaining gap to the MDCT's 68% engine peak is the conjugate-mirror
gather + complex transpose demanded by the reference's full-spectrum,
bins-major output contract (zaf.py:139 — output is (WL, T) complex with
mirrored negative bins). VERDICT r2 item 1 accepts either >=50% engine
peak or *a committed measurement proving the residual is irreducible
dispatch/transpose cost* — this stage is that measurement.

Arms (10-min scale, f32 engine path, WL=2048, step=1024):

  copy_f32 / copy_c64   elementwise copy of the same bytes — the achieved
                        HBM duplex bandwidth ceiling for ANY relayout
  transpose_f32         (T, WL) -> (WL, T) plane transpose
  transpose_c64         (T, WL) -> (WL, T) complex transpose (the STFT's)
  mirror_gather         full_from_half alone (lane gather + concat)
  mirror_transpose      the public STFT's full post-GEMM pass
  frames_t              bins-major framing gather (WL, T) directly
  stft_fullt            CANDIDATE: frames_t + full-spectrum (WL, WL)
                        cos/sin GEMMs -> (WL, T) planes. No mirror, no
                        output transpose — trades 2x GEMM flops for zero
                        relayout. Value-checked against the public stft.
  ola / ola_copy        the OLA pass vs a copy of its output bytes

Every arm reports GB/s moved (logical bytes read+written) so the mirror
and transpose can be read directly against the copy ceiling. Run once per
precision mode (the session runs a split4 twin, where GEMM passes are
cheaper and stft_fullt's trade is most favorable).

Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S15_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s15", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S15_ALLOW_CPU") == "1":  # smoke-test mode
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
            and os.environ.get("S15_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR * SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    pad_front, pad_back, t = stft_padding(SR * SECS, WL, STEP)

    spec_half = jax.jit(
        lambda s: _fft.direct_rfft(_pallas.windowed_frames(
            jnp.pad(s, [(pad_front, pad_back)]), jnp.asarray(win), WL, STEP,
            t)))(x)
    spec_half.block_until_ready()
    frames_f32 = jax.jit(lambda s: _pallas.windowed_frames(
        jnp.pad(s, [(pad_front, pad_back)]), jnp.asarray(win), WL, STEP,
        t))(x)

    out = {"ok": True, "t_frames": t, "wl": WL, "step": STEP,
           "precision": os.environ.get("ZAFTPU_PRECISION", "default")}

    def run(name, fn, arg, gbytes, gate=True):
        try:
            sec = _timed(fn, arg)
            out[name] = {"seconds": round(sec, 6),
                         "frames_per_s": round(t / sec, 1),
                         "gb_per_s": round(gbytes / sec, 1)}
            log(f"{name}: {sec * 1e3:.2f} ms  {gbytes / sec:,.0f} GB/s")
        except Exception as exc:  # noqa: BLE001 — keep the other arms
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:300])

    GB = 1e-9
    b_f32 = t * WL * 4          # one (T, WL) f32 plane
    b_c64 = t * WL * 8          # one (T, WL) c64 matrix
    b_half = t * (WL // 2 + 1) * 8

    # --- bandwidth ceilings: elementwise copy (read + write) ---
    @jax.jit
    def p_copy_f32(a):          # dynamic scalar stops constant folding
        return a * (1.0 + a[0, 0] * 0.0)

    @jax.jit
    def p_copy_c64(a):
        return a * (1.0 + jnp.real(a[0, 0]) * 0.0)

    run("copy_f32", p_copy_f32, frames_f32, (2 * b_f32) * GB)
    full_c = jax.jit(lambda h: _fft.full_from_half(h, WL))(spec_half)
    full_c.block_until_ready()
    run("copy_c64", p_copy_c64, full_c, (2 * b_c64) * GB)

    # --- transposes ---
    run("transpose_f32", jax.jit(lambda a: jnp.swapaxes(a, -1, -2)),
        frames_f32, (2 * b_f32) * GB)
    run("transpose_c64", jax.jit(lambda a: jnp.swapaxes(a, -1, -2)),
        full_c, (2 * b_c64) * GB)

    @jax.jit
    def p_transpose_planes(a):
        return jax.lax.complex(jnp.swapaxes(jnp.real(a), -1, -2),
                               jnp.swapaxes(jnp.imag(a), -1, -2))

    run("transpose_planes", p_transpose_planes, full_c, (2 * b_c64) * GB,
        gate=False)

    # --- the STFT's post-GEMM pass ---
    run("mirror_gather", jax.jit(lambda h: _fft.full_from_half(h, WL)),
        spec_half, (b_half + b_c64) * GB)
    run("mirror_transpose",
        jax.jit(lambda h: jnp.swapaxes(_fft.full_from_half(h, WL), -1, -2)),
        spec_half, (b_half + b_c64) * GB)

    # --- candidate: bins-major frames + full-spectrum GEMM ---
    padded_len = SR * SECS + pad_front + pad_back
    w_idx = np.arange(WL, dtype=np.int32)[:, None]
    t_idx = (np.arange(t, dtype=np.int32) * STEP)[None, :]
    gat = jnp.asarray(w_idx + t_idx)            # (WL, T) sample indices
    win_col = jnp.asarray(win)[:, None]

    @jax.jit
    def p_frames_t(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        return padded[gat] * win_col

    run("frames_t", p_frames_t, x, (padded_len * 4 + b_f32) * GB,
        gate=False)

    cos_m, sin_m = _direct_rdft_mats(WL, "float32")
    cos_m, sin_m = np.asarray(cos_m), np.asarray(sin_m)
    cos_full = np.empty((WL, WL), np.float32)
    sin_full = np.empty((WL, WL), np.float32)
    h = WL // 2 + 1
    cos_full[:, :h], sin_full[:, :h] = cos_m, sin_m
    # column k (k > WL/2) mirrors column WL-k: cos even, sin odd.
    cos_full[:, h:] = cos_m[:, 1:WL - h + 1][:, ::-1]
    sin_full[:, h:] = -sin_m[:, 1:WL - h + 1][:, ::-1]
    cos_full_t = jnp.asarray(cos_full.T.copy())   # (WL_bins, WL_w)
    sin_full_t = jnp.asarray(sin_full.T.copy())

    @jax.jit
    def p_stft_fullt(sig):
        fr_t = p_frames_t(sig)                    # (WL_w, T)
        return jax.lax.complex(real_matmul(cos_full_t, fr_t),
                               real_matmul(sin_full_t, fr_t))

    run("stft_fullt", p_stft_fullt, x, (b_f32 + 2 * b_c64) * GB, gate=False)

    if "seconds" in out.get("stft_fullt", {}):
        try:
            ref = jax.jit(lambda s: zaftpu.stft(s, win, STEP))(x)
            err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(
                p_stft_fullt(x), ref)
            out["stft_fullt_max_abs_err"] = float(jax.device_get(err))
        except Exception as exc:  # noqa: BLE001
            out["stft_fullt_max_abs_err"] = f"{type(exc).__name__}"[:80]

    # --- synthesis side: OLA vs copy of its bytes ---
    run("ola", jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)),
        frames_f32, (b_f32 + (t * STEP + WL - STEP) * 4) * GB)

    # Fallback honesty (CLAUDE.md): the 'ola' arm dispatches the Pallas
    # kernel on TPU; record whether a failure latched it off mid-probe.
    out["pallas_fallback"] = bool(_pallas._broken)

    # Summary ratios: how close are the relayout passes to the copy ceiling?
    for a, b, name in (("mirror_transpose", "copy_c64", "mirror_vs_copy"),
                       ("transpose_c64", "copy_c64", "transpose_vs_copy"),
                       ("ola", "copy_f32", "ola_vs_copy")):
        if ("gb_per_s" in out.get(a, {}) and "gb_per_s" in out.get(b, {})):
            out[name] = round(out[a]["gb_per_s"] / out[b]["gb_per_s"], 3)

    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
