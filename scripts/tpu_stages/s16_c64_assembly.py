"""Stage 16: break the c64 ceiling — assemble the full spectrum from f32
planes with zero complex relayout.

Round-3 state (docs/tpu_results/relayout.json, stft_breakdown.json): the
full-spectrum STFT runs 1.78M frames/s vs 2.68M for the half spectrum, and
the whole gap is the post-GEMM mirror+complex-transpose, which moves bytes
at the c64 rate (136-177 GB/s) instead of the f32 rate (623 GB/s). The
bins-major arm tried in round 3 (stft_binsmaj) transposed *already-complex*
planes, so it paid the same c64 toll and lost.

The candidate here never forms complex until the final op: the DFT GEMMs
contract directly into bins-major ``(K, T)`` f32 planes
(``einsum('tn,nk->kt')`` — the MXU handles the output orientation inside
the systolic pipeline), the conjugate mirror is a *major-axis* row concat
on f32 planes, and one trailing ``lax.complex`` writes the (WL, T) c64
output exactly once.

Arms (10-min scale, WL=2048, step=1024, engine f32 path):

  complex_assemble      lax.complex(re, im) from two (WL, T) f32 planes —
                        the intrinsic c64 assembly floor any formulation
                        must pay
  mirror_rows_complex   bins-major half planes -> row-mirror concat ->
                        lax.complex (the candidate's whole post-GEMM pass)
  gemm_tk / gemm_kt     the cos/sin GEMM pair in the current (T, K) vs the
                        candidate (K, T) output orientation — is the
                        bins-major contraction free on the MXU?
  stft_current          public zaftpu.stft control
  stft_v2               end-to-end candidate; value-checked vs control
  istft_v2              synthesis twin: fold on bins-major f32 planes via
                        row slices, GEMM pair contracting the bin axis
                        (einsum 'kt,kn->tn'), OLA — vs public istft

Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S16_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s16", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S16_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu import pallas as _pallas
    from zaftpu.core.fft import _direct_rdft_mats, _direct_ridft_half_mats
    from zaftpu.core.frame import cola_gain, stft_padding
    from zaftpu.core.policy import matmul_precision, real_matmul
    from zaftpu.core.windows import hamming

    if (jax.default_backend() != "tpu"
            and os.environ.get("S16_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR * SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    win_dev = jnp.asarray(win)
    pad_front, pad_back, t = stft_padding(SR * SECS, WL, STEP)
    half = WL // 2 + 1
    hi = matmul_precision()

    out = {"ok": True, "t_frames": t, "wl": WL, "step": STEP,
           "precision": os.environ.get("ZAFTPU_PRECISION", "default")}

    def run(name, fn, *args, gbytes=None, gate=True):
        try:
            sec = _timed(fn, *args)
            out[name] = {"seconds": round(sec, 6),
                         "frames_per_s": round(t / sec, 1)}
            if gbytes is not None:
                out[name]["gb_per_s"] = round(gbytes / sec, 1)
            log(f"{name}: {sec * 1e3:.2f} ms -> {t / sec:,.0f} frames/s")
        except Exception as exc:  # noqa: BLE001 — keep the other arms
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:300])

    GB = 1e-9
    b_plane = t * WL * 4        # one (WL, T) f32 plane
    b_hplane = t * half * 4     # one (K, T) bins-major half plane

    frames_f32 = jax.jit(lambda s: _pallas.windowed_frames(
        jnp.pad(s, [(pad_front, pad_back)]), win_dev, WL, STEP, t))(x)
    frames_f32.block_until_ready()

    # Bins-major full-spectrum planes (the candidate's GEMM output shape).
    re_full = jax.jit(lambda a: jnp.swapaxes(a, -1, -2))(
        frames_f32)  # (WL, T) f32 stand-in contents; values irrelevant here
    im_full = jax.jit(lambda a: a * 0.5)(re_full)
    im_full.block_until_ready()

    # --- intrinsic c64 assembly floor ---
    @jax.jit
    def p_assemble(a, b):
        return jax.lax.complex(a * (1.0 + a[0, 0] * 0.0), b)

    run("complex_assemble", p_assemble, re_full, im_full,
        gbytes=(2 * b_plane + 2 * b_plane) * GB)

    # --- candidate post-GEMM pass: row mirror + complex ---
    re_h = jax.jit(lambda a: a[:half] * 1.0)(re_full)
    im_h = jax.jit(lambda a: a[:half] * 1.0)(im_full)
    im_h.block_until_ready()

    def mirror_rows(re_kt, im_kt):
        # full[k] = conj(half[WL-k]) for k = half..WL-1: rows WL-half+1..1
        # reversed — one contiguous reversed slice along the MAJOR axis.
        rev = slice(WL - half, 0, -1)
        re_f = jnp.concatenate([re_kt, re_kt[rev]], axis=0)
        im_f = jnp.concatenate([im_kt, -im_kt[rev]], axis=0)
        return jax.lax.complex(re_f, im_f)

    run("mirror_rows_complex", jax.jit(mirror_rows), re_h, im_h,
        gbytes=(2 * b_hplane + 2 * b_plane) * GB)

    # --- GEMM orientation: (T, K) current vs (K, T) candidate ---
    cos_m, sin_m = _direct_rdft_mats(WL, "float32")
    cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)

    @jax.jit
    def p_gemm_tk(fr):
        return (real_matmul(fr, cos_d), real_matmul(fr, sin_d))

    @jax.jit
    def p_gemm_kt(fr):
        return (jnp.einsum("tn,nk->kt", fr, cos_d, precision=hi,
                           preferred_element_type=fr.dtype),
                jnp.einsum("tn,nk->kt", fr, sin_d, precision=hi,
                           preferred_element_type=fr.dtype))

    run("gemm_tk", p_gemm_tk, frames_f32)
    run("gemm_kt", p_gemm_kt, frames_f32)

    # --- end-to-end ---
    def stft_v2(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        fr = _pallas.windowed_frames(padded, win_dev, WL, STEP, t)
        re_kt, im_kt = p_gemm_kt(fr)
        return mirror_rows(re_kt, im_kt)

    run("stft_current", jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)
    run("stft_v2", jax.jit(stft_v2), x)

    if "seconds" in out.get("stft_v2", {}):
        try:
            ref = jax.jit(lambda s: zaftpu.stft(s, win, STEP))(x)
            err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(
                jax.jit(stft_v2)(x), ref)
            out["stft_v2_max_abs_err"] = float(jax.device_get(err))
            scale = jax.jit(lambda a: jnp.max(jnp.abs(a)))(ref)
            out["stft_v2_rel_err"] = (out["stft_v2_max_abs_err"]
                                      / float(jax.device_get(scale)))
            log(f"stft_v2 max abs err {out['stft_v2_max_abs_err']:.3e} "
                f"(rel {out['stft_v2_rel_err']:.3e})")
        except Exception as exc:  # noqa: BLE001
            out["ok"] = False
            out["stft_v2_max_abs_err"] = f"{type(exc).__name__}"[:80]

    # --- synthesis twin: bins-major fold + transposed-contraction GEMMs ---
    spec = jax.jit(lambda s: zaftpu.stft(s, win, STEP))(x)
    spec.block_until_ready()
    gain = cola_gain(win, STEP)
    icos_m, isin_m = _direct_ridft_half_mats(WL, "float32", 1.0 / gain)
    icos_d, isin_d = jnp.asarray(icos_m), jnp.asarray(isin_m)

    def istft_v2(z):
        zr, zi = jnp.real(z), jnp.imag(z)          # (WL, T) planes
        # fold row (WL - k) % WL for k = 0..WL/2: row 0, then rows
        # WL-1 .. WL/2 as one reversed contiguous major-axis slice.
        rev = slice(WL - 1, half - 2, -1)
        top = slice(0, half)
        h_re = 0.5 * (zr[top] + jnp.concatenate([zr[:1], zr[rev]], axis=0))
        h_im = 0.5 * (zi[top] - jnp.concatenate([zi[:1], zi[rev]], axis=0))
        fr = (jnp.einsum("kt,kn->tn", h_re, icos_d, precision=hi,
                         preferred_element_type=h_re.dtype)
              - jnp.einsum("kt,kn->tn", h_im, isin_d, precision=hi,
                           preferred_element_type=h_im.dtype))
        signal = _pallas.overlap_add(fr, STEP)
        edge = WL - STEP
        return signal[edge:signal.shape[0] - edge]

    run("istft_current", jax.jit(lambda z: zaftpu.istft(z, win, STEP)), spec)
    run("istft_v2", jax.jit(istft_v2), spec)
    if "seconds" in out.get("istft_v2", {}):
        try:
            ref = jax.jit(lambda z: zaftpu.istft(z, win, STEP))(spec)
            err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(
                jax.jit(istft_v2)(spec), ref)
            out["istft_v2_max_abs_err"] = float(jax.device_get(err))
            log(f"istft_v2 max abs err {out['istft_v2_max_abs_err']:.3e}")
        except Exception as exc:  # noqa: BLE001
            out["ok"] = False
            out["istft_v2_max_abs_err"] = f"{type(exc).__name__}"[:80]

    # Fallback honesty (CLAUDE.md): the framing/OLA arms dispatch Pallas
    # kernels on TPU; record whether a failure latched them off mid-probe.
    out["pallas_fallback"] = bool(_pallas._broken)

    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
