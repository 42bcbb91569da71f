"""Round-5 kernels rerun: fixed synth kernel A/B + vmem-budget A/B."""
import json, os, sys
import numpy as np

def log(m): print(m, file=sys.stderr, flush=True)

def main():
    import jax, jax.numpy as jnp
    import zaftpu
    from zaftpu import pallas as zpallas
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.utils.profiling import fetch_sync, timed
    SR, WL, STEP, SECS = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR*SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    tdac = vorbis(WL).astype(np.float32)
    t_stft = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    t_mdct = int(np.ceil(SR*SECS/STEP)) + 1
    spec = zaftpu.stft(x, win, STEP); fetch_sync(spec)
    coeffs = zaftpu.mdct(x, tdac); fetch_sync(coeffs)
    out = {"ok": True, "seconds_of_audio": SECS,
           "vmem_limit": os.environ.get("ZAFTPU_VMEM_LIMIT_KIB", "32768")}

    def arm(name, fn, frames):
        rec = {}
        try:
            zpallas._reset_health()
            _, st = timed(name, fn, reps=3, dispatches=8, target_s=2.0, log=False)
            rec = {"seconds": round(st.seconds, 5),
                   "frames_per_s": round(frames/st.seconds, 1),
                   "pallas_fallback": bool(zpallas._broken)}
            log(f"{name}: {st.seconds*1e3:.2f} ms -> {frames/st.seconds:,.0f} fr/s"
                + (" [FELL BACK]" if zpallas._broken else ""))
        except Exception as exc:
            rec = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            log(f"{name}: FAILED {rec['error'][:150]}")
        finally:
            zpallas._reset_health()
        out[name] = rec
        return rec

    for prec, tag in (("", "hi"), ("split4", "s4")):
        if prec: os.environ["ZAFTPU_PRECISION"] = prec
        else: os.environ.pop("ZAFTPU_PRECISION", None)
        arm(f"stft_{tag}", lambda: zaftpu.stft(x, win, STEP), t_stft)
        os.environ["ZAFTPU_SYNTH"] = "0"
        arm(f"istft_split_{tag}", lambda: zaftpu.istft(spec, win, STEP), t_stft)
        arm(f"imdct_split_{tag}", lambda: zaftpu.imdct(coeffs, tdac), t_mdct)
        os.environ["ZAFTPU_SYNTH"] = "1"
        r = arm(f"istft_synth_{tag}", lambda: zaftpu.istft(spec, win, STEP), t_stft)
        if "error" not in r and not r.get("pallas_fallback"):
            a = zaftpu.istft(spec, win, STEP)
            os.environ["ZAFTPU_SYNTH"] = "0"
            b = zaftpu.istft(spec, win, STEP)
            err = float(jnp.max(jnp.abs(a-b))); sc = float(jnp.max(jnp.abs(b)))
            r["max_rel_err_vs_split"] = err/max(sc, 1e-30)
            log(f"  istft synth vs split relerr {err/sc:.3g}")
            os.environ["ZAFTPU_SYNTH"] = "1"
        r = arm(f"imdct_synth_{tag}", lambda: zaftpu.imdct(coeffs, tdac), t_mdct)
        if "error" not in r and not r.get("pallas_fallback"):
            a = zaftpu.imdct(coeffs, tdac)
            os.environ["ZAFTPU_SYNTH"] = "0"
            b = zaftpu.imdct(coeffs, tdac)
            err = float(jnp.max(jnp.abs(a-b))); sc = float(jnp.max(jnp.abs(b)))
            r["max_rel_err_vs_split"] = err/max(sc, 1e-30)
            log(f"  imdct synth vs split relerr {err/sc:.3g}")
        os.environ.pop("ZAFTPU_SYNTH", None)
    os.environ.pop("ZAFTPU_PRECISION", None)
    print(json.dumps(out))
    return 0

if __name__ == "__main__":
    sys.exit(main())
