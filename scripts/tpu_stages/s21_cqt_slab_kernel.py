"""Stage 21: the fused Pallas slab-CQT kernel on hardware.

s20 (docs/tpu_results/cqt_roofline.json) pinned the f32 CQT at 784k
frames/s (block 1024): the XLA slab loop re-streams the f32 signal slabs
from HBM for every HIGHEST MXU pass (the one-pass bf16 twin runs 2.02M on
identical structure, and the stacked-single-GEMM reformulation LOSES — so
it is pass-amplified HBM traffic, not op overhead). zaftpu/pallas/cqtslab.py
holds the signal segment in VMEM across all slab GEMMs and their precision
passes; predicted MXU-bound ~3M frames/s.

Arms: the kernel at block 512/1024 (value-checked vs the XLA path,
scale-aware), the XLA current path, and the bf16 current path for context.
Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR = 44100
SECS = int(os.environ.get("S21_SECONDS", "600"))
TIME_RES = 25


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s21", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    interpret = os.environ.get("S21_ALLOW_CPU") == "1"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.pallas import cqtslab
    from zaftpu.transforms import cqt as _cqt

    if jax.default_backend() != "tpu" and not interpret:
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    rng = np.random.default_rng(0)
    n = SR * SECS
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    kern = _cqt._as_kernel(zaftpu.cqtkernel(SR, 24, 55.0, 3520.0))
    step = round(SR / TIME_RES)
    t = n // step
    L = kern.fft_length

    m_real = np.ascontiguousarray(kern.time_kernel.real.T).astype(np.float32)
    m_imag = np.ascontiguousarray(kern.time_kernel.imag.T).astype(np.float32)
    kern_key = ("s21", SR, 24, 55.0, 3520.0)
    cqtslab.register_kernel(kern_key, m_real, m_imag)

    pad_front = int(-(-(L - step) // 2))
    padded = jnp.pad(x, (pad_front, L))
    padded.block_until_ready()

    out = {"ok": True, "t_frames": t, "fft_length": L, "step": step,
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
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:250]}
            log(f"{name}: FAILED ({type(exc).__name__}: {exc})"[:350])

    run("cqt_xla_current",
        lambda: zaftpu.cqtspectrogram(x, SR, TIME_RES, kern))

    for block in ((64,) if interpret else (512, 1024)):
        run(f"cqt_slab_b{block}",
            lambda b=block: cqtslab.cqt_magnitudes(
                padded, kern_key, step, L, t, kern.number_frequencies,
                block=b, interpret=interpret),
            gate=False)

    # Value check vs the XLA engine path (scale-aware: Mosaic's HIGHEST dot
    # decomposition rounds differently from XLA's).
    try:
        blk = 64 if interpret else 512
        got = np.asarray(cqtslab.cqt_magnitudes(
            padded, kern_key, step, L, t, kern.number_frequencies,
            block=blk, interpret=interpret))
        ref = np.asarray(zaftpu.cqtspectrogram(x, SR, TIME_RES, kern)).T
        rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        out["slab_rel_err"] = rel
        log(f"slab rel err {rel:.3e}")
        if not rel < 1e-4:
            out["ok"] = False
    except Exception as exc:  # noqa: BLE001
        out["ok"] = False
        out["slab_rel_err"] = f"{type(exc).__name__}: {exc}"[:200]
        log(f"value check FAILED: {out['slab_rel_err']}")

    from zaftpu import pallas as _pallas

    out["pallas_fallback"] = bool(_pallas._broken)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
