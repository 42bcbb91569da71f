"""Stage 17: c64 assembly-by-pieces + single-pass XLA overlap-add.

Follow-up to s16 (docs/tpu_results/c64_assembly.json), which measured:

  * the intrinsic c64 assembly floor at 3.08 ms (lax.complex from clean f32
    planes, 274 GB/s) — but the row-mirror + complex formulation at 7.29 ms
    because XLA materialized the mirrored full f32 planes before assembling;
  * gemm_kt (bins-major contraction) at 8.67 ms vs gemm_tk 7.95 ms;
  * the Pallas OLA at 134 GB/s (relayout.json) — a host-side jnp.pad copy
    pass plus synchronous per-step DMA.

Arms here:

  assemble_pieces_kt   concat of TWO complex pieces (top half, mirrored
                       bottom) from bins-major half planes — each piece is
                       a fused elementwise complex write, no full-plane f32
                       materialization
  assemble_pieces_tmaj same from (T, K) planes with the transpose folded
                       into the piece reads
  stft_v3 / stft_v4    end-to-end: frames -> gemm_tk -> pieces_tmaj, and
                       frames -> gemm_kt -> pieces_kt; value-checked
  ola_pallas / ola_pads the current kernel vs a sum-of-padded-chunk-views
                       XLA formulation (k reads, ONE write pass, no host
                       pad copy); bit-identity checked
  istft_v3 / imdct_v2  synthesis end-to-end with ola_pads; value-checked

Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S17_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s17", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S17_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu import pallas as _pallas
    from zaftpu.core.fft import _direct_rdft_mats, _direct_ridft_half_mats
    from zaftpu.core.frame import cola_gain, stft_padding
    from zaftpu.core.policy import matmul_precision, real_matmul
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.transforms.mdct import (_direct_inverse_windowed_matrix,
                                        _host_window_bytes)

    if (jax.default_backend() != "tpu"
            and os.environ.get("S17_ALLOW_CPU") != "1"):
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

    def run(name, fn, *args, gate=True):
        try:
            sec = _timed(fn, *args)
            out[name] = {"seconds": round(sec, 6),
                         "frames_per_s": round(t / sec, 1)}
            log(f"{name}: {sec * 1e3:.2f} ms -> {t / sec:,.0f} frames/s")
        except Exception as exc:  # noqa: BLE001 — keep the other arms
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:300])

    def maxerr(name, fn_a, fn_b, *args):
        try:
            err = jax.jit(lambda *a: jnp.max(jnp.abs(fn_a(*a) - fn_b(*a))))(
                *args)
            out[name] = float(jax.device_get(err))
            log(f"{name}: {out[name]:.3e}")
        except Exception as exc:  # noqa: BLE001
            out["ok"] = False
            out[name] = f"{type(exc).__name__}: {exc}"[:120]
            log(f"{name}: FAILED {out[name]}")

    frames_f32 = jax.jit(lambda s: _pallas.windowed_frames(
        jnp.pad(s, [(pad_front, pad_back)]), win_dev, WL, STEP, t))(x)
    frames_f32.block_until_ready()

    cos_m, sin_m = _direct_rdft_mats(WL, "float32")
    cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)

    def gemm_tk(fr):
        return real_matmul(fr, cos_d), real_matmul(fr, sin_d)

    def gemm_kt(fr):
        return (jnp.einsum("tn,nk->kt", fr, cos_d, precision=hi,
                           preferred_element_type=fr.dtype),
                jnp.einsum("tn,nk->kt", fr, sin_d, precision=hi,
                           preferred_element_type=fr.dtype))

    rev = slice(WL - half, 0, -1)  # mirrored interior rows, reversed

    def pieces_kt(re_kt, im_kt):
        return jnp.concatenate(
            [jax.lax.complex(re_kt, im_kt),
             jax.lax.complex(re_kt[rev], -im_kt[rev])], axis=0)

    def pieces_tmaj(re_tk, im_tk):
        re_kt = jnp.swapaxes(re_tk, -1, -2)
        im_kt = jnp.swapaxes(im_tk, -1, -2)
        return pieces_kt(re_kt, im_kt)

    # Pre-materialized planes for the isolated assembly arms.
    re_kt0, im_kt0 = jax.jit(lambda fr: gemm_kt(fr))(frames_f32)
    re_tk0, im_tk0 = jax.jit(lambda fr: gemm_tk(fr))(frames_f32)
    im_tk0.block_until_ready()

    run("assemble_pieces_kt", jax.jit(pieces_kt), re_kt0, im_kt0)
    run("assemble_pieces_tmaj", jax.jit(pieces_tmaj), re_tk0, im_tk0)

    def stft_v3(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        fr = _pallas.windowed_frames(padded, win_dev, WL, STEP, t)
        return pieces_tmaj(*gemm_tk(fr))

    def stft_v4(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        fr = _pallas.windowed_frames(padded, win_dev, WL, STEP, t)
        return pieces_kt(*gemm_kt(fr))

    run("stft_current", jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)
    run("stft_v3", jax.jit(stft_v3), x)
    run("stft_v4", jax.jit(stft_v4), x)
    maxerr("stft_v3_err", jax.jit(stft_v3),
           jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)
    maxerr("stft_v4_err", jax.jit(stft_v4),
           jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)

    # ------------------------------------------------------------------
    # Overlap-add: Pallas kernel vs sum-of-padded-chunk-views (one write
    # pass; the pads fuse as masked operand reads).
    # ------------------------------------------------------------------
    def ola_pads(frames, step):
        tt, wl = frames.shape
        k = wl // step
        chunks = frames.reshape(tt, k, step)
        total = jnp.pad(chunks[:, 0, :], ((0, k - 1), (0, 0)))
        for c in range(1, k):
            total = total + jnp.pad(chunks[:, c, :], ((c, k - 1 - c), (0, 0)))
        return total.reshape(-1)[: tt * step + wl - step]

    run("ola_pallas", jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)),
        frames_f32)
    run("ola_pads", jax.jit(lambda fr: ola_pads(fr, STEP)), frames_f32)
    maxerr("ola_err", jax.jit(lambda fr: ola_pads(fr, STEP)),
           jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)), frames_f32)

    # ------------------------------------------------------------------
    # Synthesis end-to-end with ola_pads
    # ------------------------------------------------------------------
    spec = jax.jit(lambda s: zaftpu.stft(s, win, STEP))(x)
    spec.block_until_ready()
    gain = cola_gain(win, STEP)
    icos_m, isin_m = _direct_ridft_half_mats(WL, "float32", 1.0 / gain)
    icos_d, isin_d = jnp.asarray(icos_m), jnp.asarray(isin_m)
    from zaftpu.core.fft import _fold_index

    idx_rev = jnp.asarray(_fold_index(WL))

    def istft_v3(z):
        fm = jnp.swapaxes(z, -1, -2)
        zr, zi = jnp.real(fm), jnp.imag(fm)
        h_re = 0.5 * (zr[..., :half] + zr[..., idx_rev])
        h_im = 0.5 * (zi[..., :half] - zi[..., idx_rev])
        fr = real_matmul(h_re, icos_d) - real_matmul(h_im, isin_d)
        signal = ola_pads(fr, STEP)
        edge = WL - STEP
        return signal[edge:signal.shape[0] - edge]

    run("istft_current", jax.jit(lambda z: zaftpu.istft(z, win, STEP)), spec)
    run("istft_v3", jax.jit(istft_v3), spec)
    maxerr("istft_v3_err", jax.jit(istft_v3),
           jax.jit(lambda z: zaftpu.istft(z, win, STEP)), spec)

    # IMDCT with ola_pads (window folded into the inverse operator, same as
    # the production _imdct_direct_core).
    tdac = vorbis(WL).astype(np.float32)
    t_mdct = int(np.ceil((SR * SECS) / STEP)) + 1
    coeffs = jax.jit(lambda s: zaftpu.mdct(s, tdac))(x)
    coeffs.block_until_ready()
    f = WL // 2
    wbytes = _host_window_bytes(tdac)
    inv_mat = jnp.asarray(
        _direct_inverse_windowed_matrix(f, wbytes).astype(np.float32))

    def imdct_v2(c):
        fr = real_matmul(jnp.swapaxes(c, -1, -2), inv_mat)
        signal = ola_pads(fr, f)
        return signal[f:signal.shape[0] - f - 1]

    run("imdct_current", jax.jit(lambda c: zaftpu.imdct(c, tdac)), coeffs)
    run("imdct_v2", jax.jit(imdct_v2), coeffs)
    maxerr("imdct_v2_err", jax.jit(imdct_v2),
           jax.jit(lambda c: zaftpu.imdct(c, tdac)), coeffs)
    out["t_mdct"] = t_mdct

    out["pallas_fallback"] = bool(_pallas._broken)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
