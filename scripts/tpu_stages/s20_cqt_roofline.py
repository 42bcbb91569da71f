"""Stage 20: roofline + reformulation of the f32 CQT (VERDICT r3, item 6).

The f32 slab path measured 641k frames/s (suite.json, 600-s arm) vs 2.06M
under bf16. Cost model says the slab loop is OP-OVERHEAD bound, not HBM
bound: per 1024 frames it issues ~19 slabs x 2 GEMMs of only (B, 1764) x
(1764, 144) each (plus slices/adds), and the measured ~10 us/op x 2242 ops
at block 256 accounts for the whole 23 ms where the byte model says ~4 ms.

Candidate: per block, stack the 19 hop-width slabs into ONE (B, 19*1764)
frame matrix (aligned row-shifted views of a contiguous reshape — the
gather the old path avoided is NOT needed) and run a single GEMM pair per
block against the row-padded (19*1764, F) operator. 19x fewer ops, same
math up to f32 summation order (the contraction accumulates over the same
products in-GEMM instead of across slab adds).

Arms (600-s audio, time_res=25):

  cqt_current        default dispatch (block 256 f32 / 1024 bf16)
  cqt_b1024/b2048    block-size ladder via ZAFTPU_CQT_BLOCK
  cqt_stack_b1024/2048  the stacked-slab single-GEMM formulation
  cqt_bf16_current / cqt_bf16_stack   the lowered-precision twins

Every stack arm is value-checked against the current path (scale-aware f32
tolerance — summation order differs). Reports achieved GB/s against the
19x-amplified byte model. Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR = 44100
SECS = int(os.environ.get("S20_SECONDS", "600"))
TIME_RES = 25
HBM_PEAK_GBS = 819.0


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s20", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S20_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core import policy as _policy
    from zaftpu.transforms import cqt as _cqt

    if (jax.default_backend() != "tpu"
            and os.environ.get("S20_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    n = SR * SECS
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    kern = _cqt._as_kernel(zaftpu.cqtkernel(SR, 24, 55.0, 3520.0))
    step = round(SR / TIME_RES)
    t = n // step
    L = kern.fft_length
    f_chan = kern.number_frequencies
    n_slabs = -(-L // step)
    k_full = n_slabs * step

    out = {"ok": True, "t_frames": t, "fft_length": L, "step": step,
           "n_slabs": n_slabs, "f_channels": f_chan}

    # Byte model (per frame): the frame window read (19x signal
    # amplification) once for re+im... the stacked GEMM reads the frame
    # matrix once per component pass pair; count the dominant terms:
    # frames materialize write + GEMM read + signal read.
    bytes_total = (t * k_full * 4) * 3 + n * 4
    GB = 1e-9

    def run(name, fn, *args, gate=True):
        try:
            sec = _timed(fn, *args)
            out[name] = {"seconds": round(sec, 6),
                         "frames_per_s": round(t / sec, 1),
                         "gb_per_s": round(bytes_total * GB / sec, 1),
                         "pct_hbm_peak": round(
                             100 * bytes_total * GB / sec / HBM_PEAK_GBS, 1)}
            log(f"{name}: {sec * 1e3:.2f} ms -> {t / sec:,.0f} frames/s "
                f"({bytes_total * GB / sec:,.0f} GB/s vs model)")
        except Exception as exc:  # noqa: BLE001
            if gate:
                out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:300])

    def current(block):
        os.environ["ZAFTPU_CQT_BLOCK"] = str(block)
        try:
            return zaftpu.cqtspectrogram(x, SR, TIME_RES, kern)
        finally:
            os.environ.pop("ZAFTPU_CQT_BLOCK", None)

    run("cqt_current", lambda: zaftpu.cqtspectrogram(x, SR, TIME_RES, kern))
    run("cqt_b1024", lambda: current(1024))
    run("cqt_b2048", lambda: current(2048), gate=False)

    # ---- stacked-slab single-GEMM formulation ----
    m_real, m_imag = _cqt._device_time_kernel(kern, np.float32)
    # Row-pad the operator to whole hops (the stacked frame is k_full wide;
    # rows beyond L multiply zero-padded signal anyway — keep them zero).
    mr_p = jnp.pad(m_real, [(0, k_full - L), (0, 0)])
    mi_p = jnp.pad(m_imag, [(0, k_full - L), (0, 0)])

    pad_front = int(-(-(L - step) // 2))

    def stack_impl(sig, block):
        blocks = -(-t // block)
        bs = block * step
        need = blocks * bs + k_full
        padded = jnp.pad(sig, [(pad_front, need - n - pad_front)])

        def one_block(b):
            seg = jax.lax.dynamic_slice(padded, (b * bs,), (bs + k_full,))
            sig2d = seg[: (block + n_slabs) * step].reshape(
                block + n_slabs, step)
            fr = jnp.stack([sig2d[k:k + block] for k in range(n_slabs)],
                           axis=1).reshape(block, k_full)
            re = _policy.mxu_matmul(fr, mr_p, bandwidth_bound=True)
            im = _policy.mxu_matmul(fr, mi_p, bandwidth_bound=True)
            return jnp.sqrt(re * re + im * im)

        o = jax.lax.map(one_block, jnp.arange(blocks))
        return jnp.swapaxes(o.reshape(blocks * block, -1)[:t], -1, -2)

    import functools

    for block in (1024, 2048):
        run(f"cqt_stack_b{block}",
            jax.jit(functools.partial(stack_impl, block=block)), x,
            gate=False)

    # Value check (scale-aware: summation order differs in f32).
    try:
        ref = zaftpu.cqtspectrogram(x, SR, TIME_RES, kern)
        got = jax.jit(functools.partial(stack_impl, block=1024))(x)
        err = float(jax.device_get(jnp.max(jnp.abs(got - ref))))
        scale = float(jax.device_get(jnp.max(jnp.abs(ref))))
        out["stack_rel_err"] = err / scale
        log(f"stack rel err {err / scale:.3e}")
        if not err / scale < 1e-4:
            out["ok"] = False
    except Exception as exc:  # noqa: BLE001
        out["ok"] = False
        out["stack_rel_err"] = f"{type(exc).__name__}: {exc}"[:120]

    # ---- bf16 twins ----
    try:
        with _policy.compute_dtype("bfloat16"):
            run("cqt_bf16_current",
                lambda: zaftpu.cqtspectrogram(x, SR, TIME_RES, kern),
                gate=False)
            run("cqt_bf16_stack",
                jax.jit(functools.partial(stack_impl, block=2048)), x,
                gate=False)
    except Exception as exc:  # noqa: BLE001
        out["bf16"] = f"{type(exc).__name__}: {exc}"[:120]

    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
