"""Stage 19: gather-based c64 assembly + OLA kernel decomposition/variants.

s17 results (docs/tpu_results/assembly_ola.json): concat-of-complex-pieces
does NOT fuse (7.4 ms vs the 3.08 ms lax.complex floor), so the bins-major
candidates lost; and the sum-of-padded-views XLA OLA (2.81 ms) loses to the
Pallas kernel (2.31 ms). Remaining candidates measured here:

  assemble_gather_kt  full spectrum from bins-major half planes via ONE
                      full-height row gather + sign multiply feeding
                      lax.complex — no concat, one c64 write
  stft_v5             frames -> gemm_kt -> gather assembly, value-checked
  ola_pad_only / ola_kernel_only / ola_slice_only
                      decompose the current kernel's 2.31 ms: host pad
                      copy, pallas_call, trailing slice pass
  ola_block512        kernel with 512-row blocks (fewer DMA latencies)
  ola_nopad           kernel v2: no host pad — first/last grid steps zero
                      the out-of-range seg rows in-kernel (static pl.when
                      branches; sizes all trace-time static)
  ola_dbuf            kernel v3: double-buffered DMA (prefetch block i+1
                      while computing block i; parity-static slots)
  istft_current / imdct_current / imdct_nopad / imdct_dbuf
                      synthesis end-to-end with the winning variant

All variants bit-check against the current kernel. Prints ONE JSON line.
"""

import functools
import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S19_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s19", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def _read_rows(block: int, k: int) -> int:
    return block + -(-(k - 1) // 8) * 8


def main():
    import jax

    interpret = os.environ.get("S19_ALLOW_CPU") == "1"
    if interpret:  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import zaftpu
    from zaftpu import pallas as _pallas
    from zaftpu.core.fft import (_direct_rdft_mats, _direct_ridft_half_mats,
                                 _fold_index, _mirror_index)
    from zaftpu.core.frame import cola_gain, stft_padding
    from zaftpu.core.policy import matmul_precision, real_matmul
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.transforms.mdct import (_direct_inverse_windowed_matrix,
                                        _host_window_bytes)

    if jax.default_backend() != "tpu" and not interpret:
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
        except Exception as exc:  # noqa: BLE001
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:300])

    def maxerr(name, fn_a, fn_b, *args, gate=True):
        try:
            err = jax.jit(lambda *a: jnp.max(jnp.abs(fn_a(*a) - fn_b(*a))))(
                *args)
            out[name] = float(jax.device_get(err))
            log(f"{name}: {out[name]:.3e}")
        except Exception as exc:  # noqa: BLE001
            if gate:
                out["ok"] = False
            out[name] = f"{type(exc).__name__}: {exc}"[:120]
            log(f"{name}: FAILED {out[name]}")

    # ------------------------------------------------------------------
    # STFT: gather-based assembly
    # ------------------------------------------------------------------
    frames_f32 = jax.jit(lambda s: _pallas.windowed_frames(
        jnp.pad(s, [(pad_front, pad_back)]), win_dev, WL, STEP, t))(x)
    frames_f32.block_until_ready()

    cos_m, sin_m = _direct_rdft_mats(WL, "float32")
    cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)

    def gemm_kt(fr):
        return (jnp.einsum("tn,nk->kt", fr, cos_d, precision=hi,
                           preferred_element_type=fr.dtype),
                jnp.einsum("tn,nk->kt", fr, sin_d, precision=hi,
                           preferred_element_type=fr.dtype))

    # Row index covering ALL output rows: [0..half-1, mirror of interior].
    idx_full = np.concatenate([np.arange(half, dtype=np.int32),
                               _mirror_index(half, WL)])
    sign = np.ones(WL, np.float32)
    sign[half:] = -1.0
    idx_dev, sign_dev = jnp.asarray(idx_full), jnp.asarray(sign[:, None])

    def gather_assembly(re_kt, im_kt):
        return jax.lax.complex(re_kt[idx_dev, :],
                               im_kt[idx_dev, :] * sign_dev)

    re_kt0, im_kt0 = jax.jit(gemm_kt)(frames_f32)
    im_kt0.block_until_ready()
    run("assemble_gather_kt", jax.jit(gather_assembly), re_kt0, im_kt0)

    def stft_v5(sig):
        padded = jnp.pad(sig, [(pad_front, pad_back)])
        fr = _pallas.windowed_frames(padded, win_dev, WL, STEP, t)
        return gather_assembly(*gemm_kt(fr))

    run("stft_current", jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)
    run("stft_v5", jax.jit(stft_v5), x)
    maxerr("stft_v5_err", jax.jit(stft_v5),
           jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x)

    # ------------------------------------------------------------------
    # OLA decomposition + kernel variants (k = WL // STEP)
    # ------------------------------------------------------------------
    k = WL // STEP
    BLOCKS = {"ola_kernel_only": 256, "ola_block512": 512}

    def host_prep(frames, block):
        tt = frames.shape[0]
        out_rows = tt + k - 1
        rows_pad = block * (-(-out_rows // block))
        total_rows = rows_pad - block + _read_rows(block, k)
        chunks = frames.reshape(tt, k, STEP)
        return jnp.pad(chunks, ((k - 1, total_rows - tt - (k - 1)),
                                (0, 0), (0, 0))), out_rows, rows_pad

    def _kernel_cur(block, frames_ref, out_ref, seg, sem):
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            frames_ref.at[pl.ds(i * block, _read_rows(block, k)), :, :],
            seg, sem)
        copy.start()
        copy.wait()
        acc = seg[k - 1:k - 1 + block, 0, :]
        for c in range(1, k):
            acc = acc + seg[k - 1 - c:k - 1 - c + block, c, :]
        out_ref[:, :] = acc

    def kernel_call(chunks, rows_pad, block):
        return pl.pallas_call(
            functools.partial(_kernel_cur, block),
            grid=(rows_pad // block,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, STEP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, STEP), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_read_rows(block, k), k, STEP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(chunks)

    tt = t
    out_len = tt * STEP + WL - STEP
    run("ola_current", jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)),
        frames_f32)
    run("ola_pad_only", jax.jit(lambda fr: host_prep(fr, 256)[0]),
        frames_f32)
    chunks_p, out_rows, rows_pad = jax.jit(
        lambda fr: host_prep(fr, 256))(frames_f32), None, None
    chunks_p, out_rows, rows_pad = (chunks_p[0], tt + k - 1,
                                    256 * (-(-(tt + k - 1) // 256)))
    chunks_p.block_until_ready()
    run("ola_kernel_only",
        jax.jit(lambda c: kernel_call(c, rows_pad, 256)), chunks_p)
    ola_out = jax.jit(lambda c: kernel_call(c, rows_pad, 256))(chunks_p)
    ola_out.block_until_ready()
    run("ola_slice_only",
        jax.jit(lambda o: o[:out_rows].reshape(-1)[:out_len]), ola_out)

    rows_pad512 = 512 * (-(-(tt + k - 1) // 512))
    chunks_p512 = jax.jit(lambda fr: host_prep(fr, 512)[0])(frames_f32)
    chunks_p512.block_until_ready()
    run("ola_block512",
        jax.jit(lambda c: kernel_call(c, rows_pad512, 512)), chunks_p512,
        gate=False)

    # ---- variant: no host pad (in-kernel edge zeroing) ----
    def ola_nopad(frames, block=256):
        tt_ = frames.shape[0]
        out_rows_ = tt_ + k - 1
        rows_pad_ = block * (-(-out_rows_ // block))
        grid_n = rows_pad_ // block
        pad8 = _read_rows(block, k) - block
        rr = block + pad8
        chunks = frames.reshape(tt_, k, STEP)

        # Static per-step DMA plans: (dst_offset, src_start, n_rows).
        special = {}
        for i in range(grid_n):
            start = i * block - pad8
            end = start + rr
            if start < 0 or end > tt_:
                s0 = max(0, start)
                n_rows = max(0, min(tt_, end) - s0)
                special[i] = (s0 - start, s0, n_rows)
        if len(special) > 4:
            raise ValueError(f"too many edge steps ({len(special)})")

        def kern(frames_ref, out_ref, seg, sem):
            i = pl.program_id(0)

            def emit(dst_off, src_start, n_rows):
                def body():
                    seg[...] = jnp.zeros(seg.shape, seg.dtype)
                    if n_rows > 0:
                        cp = pltpu.make_async_copy(
                            frames_ref.at[pl.ds(src_start, n_rows), :, :],
                            seg.at[pl.ds(dst_off, n_rows)], sem)
                        cp.start()
                        cp.wait()
                return body

            cond_default = None
            for idx, plan in special.items():
                pl.when(i == idx)(emit(*plan))
                c = i != idx
                cond_default = c if cond_default is None else (
                    jnp.logical_and(cond_default, c))

            def default_body():
                cp = pltpu.make_async_copy(
                    frames_ref.at[pl.ds(i * block - pad8, rr), :, :],
                    seg, sem)
                cp.start()
                cp.wait()

            if cond_default is None:
                default_body()
            else:
                pl.when(cond_default)(default_body)
            acc = seg[pad8:pad8 + block, 0, :]
            for c in range(1, k):
                acc = acc + seg[pad8 - c:pad8 - c + block, c, :]
            out_ref[:, :] = acc

        o = pl.pallas_call(
            kern,
            grid=(grid_n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, STEP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad_, STEP), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rr, k, STEP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(chunks)
        return o[:out_rows_].reshape(-1)[: tt_ * STEP + WL - STEP]

    run("ola_nopad", jax.jit(ola_nopad), frames_f32, gate=False)
    maxerr("ola_nopad_err", jax.jit(ola_nopad),
           jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)), frames_f32,
           gate=False)

    # ---- variant: double-buffered DMA (host-padded input) ----
    def ola_dbuf(frames, block=256):
        tt_ = frames.shape[0]
        out_rows_ = tt_ + k - 1
        rows_pad_ = block * (-(-out_rows_ // block))
        grid_n = rows_pad_ // block
        rr = _read_rows(block, k)
        total_rows = rows_pad_ - block + rr
        chunks = frames.reshape(tt_, k, STEP)
        chunks = jnp.pad(chunks, ((k - 1, total_rows - tt_ - (k - 1)),
                                  (0, 0), (0, 0)))

        def kern(frames_ref, out_ref, seg, sem):
            i = pl.program_id(0)

            def copy_for(step_idx, slot):
                return pltpu.make_async_copy(
                    frames_ref.at[pl.ds(step_idx * block, rr), :, :],
                    seg.at[slot], sem.at[slot])

            @pl.when(i == 0)
            def _():
                copy_for(i, 0).start()

            def consume(slot, other):
                @pl.when(i + 1 < grid_n)
                def _():
                    copy_for(i + 1, other).start()
                copy_for(i, slot).wait()
                acc = seg[slot, k - 1:k - 1 + block, 0, :]
                for c in range(1, k):
                    acc = acc + seg[slot, k - 1 - c:k - 1 - c + block, c, :]
                out_ref[:, :] = acc

            @pl.when(jax.lax.rem(i, 2) == 0)
            def _():
                consume(0, 1)

            @pl.when(jax.lax.rem(i, 2) == 1)
            def _():
                consume(1, 0)

        o = pl.pallas_call(
            kern,
            grid=(grid_n,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((block, STEP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad_, STEP), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, rr, k, STEP), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(chunks)
        return o[:out_rows_].reshape(-1)[: tt_ * STEP + WL - STEP]

    run("ola_dbuf", jax.jit(ola_dbuf), frames_f32, gate=False)
    maxerr("ola_dbuf_err", jax.jit(ola_dbuf),
           jax.jit(lambda fr: _pallas.overlap_add(fr, STEP)), frames_f32,
           gate=False)

    # ------------------------------------------------------------------
    # Synthesis end-to-end (the arms that stalled out of s17's window)
    # ------------------------------------------------------------------
    spec = jax.jit(lambda s: zaftpu.stft(s, win, STEP))(x)
    spec.block_until_ready()
    run("istft_current", jax.jit(lambda z: zaftpu.istft(z, win, STEP)),
        spec)

    gain = cola_gain(win, STEP)
    icos_m, isin_m = _direct_ridft_half_mats(WL, "float32", 1.0 / gain)
    icos_d, isin_d = jnp.asarray(icos_m), jnp.asarray(isin_m)
    idx_rev = jnp.asarray(_fold_index(WL))

    def istft_with(ola_fn, z):
        fm = jnp.swapaxes(z, -1, -2)
        zr, zi = jnp.real(fm), jnp.imag(fm)
        h_re = 0.5 * (zr[..., :half] + zr[..., idx_rev])
        h_im = 0.5 * (zi[..., :half] - zi[..., idx_rev])
        fr = real_matmul(h_re, icos_d) - real_matmul(h_im, isin_d)
        signal = ola_fn(fr)
        edge = WL - STEP
        return signal[edge:signal.shape[0] - edge]

    run("istft_nopad", jax.jit(lambda z: istft_with(ola_nopad, z)), spec,
        gate=False)
    run("istft_dbuf", jax.jit(lambda z: istft_with(ola_dbuf, z)), spec,
        gate=False)
    maxerr("istft_nopad_err", jax.jit(lambda z: istft_with(ola_nopad, z)),
           jax.jit(lambda z: zaftpu.istft(z, win, STEP)), spec, gate=False)

    tdac = vorbis(WL).astype(np.float32)
    coeffs = jax.jit(lambda s: zaftpu.mdct(s, tdac))(x)
    coeffs.block_until_ready()
    f = WL // 2
    wbytes = _host_window_bytes(tdac)
    inv_mat = jnp.asarray(
        _direct_inverse_windowed_matrix(f, wbytes).astype(np.float32))

    def imdct_with(ola_fn, c):
        fr = real_matmul(jnp.swapaxes(c, -1, -2), inv_mat)
        signal = ola_fn(fr)
        return signal[f:signal.shape[0] - f - 1]

    run("imdct_current", jax.jit(lambda c: zaftpu.imdct(c, tdac)), coeffs)
    run("imdct_nopad", jax.jit(lambda c: imdct_with(ola_nopad, c)), coeffs,
        gate=False)
    run("imdct_dbuf", jax.jit(lambda c: imdct_with(ola_dbuf, c)), coeffs,
        gate=False)
    maxerr("imdct_nopad_err", jax.jit(lambda c: imdct_with(ola_nopad, c)),
           jax.jit(lambda c: zaftpu.imdct(c, tdac)), coeffs, gate=False)

    out["pallas_fallback"] = bool(_pallas._broken)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
