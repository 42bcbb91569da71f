"""Stage 24: round-5 kernels on the REAL chip — construct acceptance,
value gates, and A/B timing.

Three new constructs land in round 5; each needs the remote Mosaic
compiler's acceptance proven and its win measured (VERDICT round 4 items
3/5; CLAUDE.md: never trust an env-labeled arm without a fallback check —
every arm here records zaftpu.pallas._broken and resets it):

  fullspec   pallas/fused._kernel_full: the in-kernel mirrored-emission
             epilogue (jnp.flip on the minor lanes + odd-offset lane
             slices). A/B vs the half-kernel + XLA gather-mirror at 600-s
             STFT scale, both precision dials; outputs gated BIT-identical.
  synth      pallas/synth: fused inverse-GEMM + OLA. A/B vs the split
             GEMM-then-OLA ISTFT and IMDCT at 600-s scale, both dials;
             values gated vs the XLA path (f32 tolerance).
  tiny       small-shape acceptance first (cheap compile) so a Mosaic
             construct rejection is distinguishable from a scale-window
             artifact; a fresh-compile health probe (clock-varied shape)
             runs between cases so a degraded-tunnel window reads as
             UNHEALTHY, not as a construct rejection.

Prints ONE JSON line -> docs/tpu_results/round5_kernels.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S24_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def health_probe(tag):
    """Fresh-compile probe with a clock-varied shape: catches the
    degraded-tunnel window where cached programs run but new compiles
    hang/fail (verify skill)."""
    import jax.numpy as jnp

    n = 8 * (int(time.time()) % 97 + 3)
    try:
        v = float(jnp.ones((n, 128)).sum())
        assert v == n * 128
        return True
    except Exception as exc:  # noqa: BLE001
        log(f"HEALTH PROBE FAILED at {tag}: {str(exc)[:200]}")
        return False


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    import zaftpu
    from zaftpu import pallas as zpallas
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.utils.profiling import fetch_sync, timed

    out = {"ok": True, "seconds_of_audio": SECS}

    def arm(name, fn, frames=None):
        """Run one labeled arm; record time, fallback latch, errors."""
        rec = {}
        try:
            zpallas._reset_health()
            _, stats = timed(name, fn, reps=3, dispatches=8, target_s=2.0,
                             log=False)
            rec["seconds"] = round(stats.seconds, 5)
            if frames:
                rec["frames_per_s"] = round(frames / stats.seconds, 1)
            rec["pallas_fallback"] = bool(zpallas._broken)
            log(f"{name}: {stats.seconds * 1e3:.2f} ms"
                + (f" -> {frames / stats.seconds:,.0f} fr/s" if frames
                   else "")
                + (" [FELL BACK TO XLA]" if zpallas._broken else ""))
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {exc}"[:400]
            log(f"{name}: FAILED {rec['error'][:200]}")
        finally:
            zpallas._reset_health()
        out[name] = rec
        return rec

    # ---- tiny-shape construct acceptance -------------------------------
    from zaftpu.pallas import fused as pfused
    from zaftpu.pallas import synth as psynth

    rng = np.random.default_rng(0)
    tpad = rng.standard_normal(64 * STEP + WL - STEP).astype(np.float32)
    win = hamming(WL).astype(np.float32)
    twin = jnp.asarray(win)
    tiny = {}
    try:
        re, im = pfused.frames_rfft_full(jnp.asarray(tpad), twin, WL, STEP,
                                         64)
        half = pfused.frames_rfft(jnp.asarray(tpad), twin, WL, STEP, 64)
        from zaftpu.core import fft as cfft

        ref = jax.jit(lambda h: cfft.full_from_half(h, WL))(half)
        bit_re = bool(np.array_equal(np.asarray(re),
                                     np.asarray(jnp.real(ref))))
        bit_im = bool(np.array_equal(np.asarray(im),
                                     np.asarray(jnp.imag(ref))))
        tiny["fullspec"] = {"compiles": True, "bit_identical":
                            bit_re and bit_im}
        log(f"tiny fullspec: compiles, bit_identical={bit_re and bit_im}")
    except Exception as exc:  # noqa: BLE001
        tiny["fullspec"] = {"compiles": False,
                            "error": f"{type(exc).__name__}: {exc}"[:400]}
        log(f"tiny fullspec: REJECTED {str(exc)[:200]}")
    out["health_after_fullspec_tiny"] = health_probe("fullspec-tiny")

    try:
        import functools

        t = 64
        h_re = jnp.asarray(
            rng.standard_normal((t, WL // 2 + 1)).astype(np.float32))
        h_im = jnp.asarray(
            rng.standard_normal((t, WL // 2 + 1)).astype(np.float32))
        # Top-level jit with the raised scoped budget — the production
        # dispatch provides it via the zjit twin; a bare call would OOM the
        # default 16 MiB stack on the ~19 MB operator and misreport the
        # construct as rejected.
        run = functools.partial(jax.jit, compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": "24576"})(
            lambda a, b: psynth.istft_ola(a, b, WL, STEP, 0.5))
        got = run(h_re, h_im)
        from zaftpu.core import fft as cfft
        from zaftpu.core import frame as cframe

        ref = jax.jit(lambda a, b: cframe.overlap_add(
            cfft.direct_real_ifft_folded(a, b, WL, 0.5), STEP))(h_re, h_im)
        err = float(jnp.max(jnp.abs(got - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        tiny["synth"] = {"compiles": True,
                         "max_rel_err": err / max(scale, 1e-30)}
        log(f"tiny synth: compiles, rel_err={err / max(scale, 1e-30):.3g}")
    except Exception as exc:  # noqa: BLE001
        tiny["synth"] = {"compiles": False,
                         "error": f"{type(exc).__name__}: {exc}"[:400]}
        log(f"tiny synth: REJECTED {str(exc)[:200]}")
    out["tiny"] = tiny
    out["health_after_synth_tiny"] = health_probe("synth-tiny")

    # ---- production-scale A/B ------------------------------------------
    x = jnp.asarray(rng.standard_normal(SR * SECS).astype(np.float32))
    tdac = vorbis(WL).astype(np.float32)
    t_stft = int(np.ceil((SR * SECS + 2 * (WL // 2) - WL) / STEP)) + 1
    t_mdct = int(np.ceil(SR * SECS / STEP)) + 1

    spec = zaftpu.stft(x, win, STEP)
    fetch_sync(spec)
    coeffs = zaftpu.mdct(x, tdac)
    fetch_sync(coeffs)

    for prec, tag in (("", "hi"), ("split4", "s4")):
        if prec:
            os.environ["ZAFTPU_PRECISION"] = prec
        else:
            os.environ.pop("ZAFTPU_PRECISION", None)

        os.environ["ZAFTPU_FULLSPEC"] = "0"
        arm(f"stft_mirror_{tag}", lambda: zaftpu.stft(x, win, STEP),
            t_stft)
        os.environ["ZAFTPU_FULLSPEC"] = "1"
        r = arm(f"stft_fullspec_{tag}", lambda: zaftpu.stft(x, win, STEP),
                t_stft)
        if "error" not in r and not r.get("pallas_fallback"):
            a = zaftpu.stft(x, win, STEP)
            os.environ["ZAFTPU_FULLSPEC"] = "0"
            b = zaftpu.stft(x, win, STEP)
            same = bool(jnp.all(jnp.equal(jnp.real(a), jnp.real(b)))
                        & jnp.all(jnp.equal(jnp.imag(a), jnp.imag(b))))
            out[f"stft_fullspec_{tag}"]["bit_identical"] = same
            log(f"stft fullspec {tag}: bit_identical={same}")
        os.environ.pop("ZAFTPU_FULLSPEC", None)
        out[f"health_{tag}_1"] = health_probe(f"{tag}-fullspec")

        os.environ["ZAFTPU_SYNTH"] = "0"
        arm(f"istft_split_{tag}", lambda: zaftpu.istft(spec, win, STEP),
            t_stft)
        arm(f"imdct_split_{tag}", lambda: zaftpu.imdct(coeffs, tdac),
            t_mdct)
        os.environ["ZAFTPU_SYNTH"] = "1"
        r = arm(f"istft_synth_{tag}", lambda: zaftpu.istft(spec, win, STEP),
                t_stft)
        if "error" not in r and not r.get("pallas_fallback"):
            a = zaftpu.istft(spec, win, STEP)
            os.environ["ZAFTPU_SYNTH"] = "0"
            b = zaftpu.istft(spec, win, STEP)
            err = float(jnp.max(jnp.abs(a - b)))
            scale = float(jnp.max(jnp.abs(b)))
            out[f"istft_synth_{tag}"]["max_rel_err_vs_split"] = (
                err / max(scale, 1e-30))
            os.environ["ZAFTPU_SYNTH"] = "1"
        r = arm(f"imdct_synth_{tag}", lambda: zaftpu.imdct(coeffs, tdac),
                t_mdct)
        if "error" not in r and not r.get("pallas_fallback"):
            a = zaftpu.imdct(coeffs, tdac)
            os.environ["ZAFTPU_SYNTH"] = "0"
            b = zaftpu.imdct(coeffs, tdac)
            err = float(jnp.max(jnp.abs(a - b)))
            scale = float(jnp.max(jnp.abs(b)))
            out[f"imdct_synth_{tag}"]["max_rel_err_vs_split"] = (
                err / max(scale, 1e-30))
        os.environ.pop("ZAFTPU_SYNTH", None)
        out[f"health_{tag}_2"] = health_probe(f"{tag}-synth")

    os.environ.pop("ZAFTPU_PRECISION", None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
