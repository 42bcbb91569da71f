import json, os, sys
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
def main():
    import jax, jax.numpy as jnp
    import zaftpu
    from zaftpu import pallas as zpallas
    from zaftpu.core.windows import hamming
    from zaftpu.utils.profiling import timed
    SR, WL, STEP, SECS = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR*SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    t_stft = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    res = {}
    for prec, ptag in (("", "hi"), ("split4", "s4")):
        if prec: os.environ["ZAFTPU_PRECISION"] = prec
        else: os.environ.pop("ZAFTPU_PRECISION", None)
        for f2 in ("0", "1"):
            os.environ["ZAFTPU_FUSED2"] = f2
            tag = f"stft_{ptag}_fused2={f2}"
            zpallas._reset_health()
            try:
                _, st = timed(tag, lambda: zaftpu.stft(x, win, STEP), reps=3, dispatches=8, target_s=2.0, log=False)
                res[tag] = round(t_stft/st.seconds, 1)
                log(f"{tag}: {st.seconds*1e3:.2f} ms -> {t_stft/st.seconds:,.0f} fr/s" + (" [FB]" if zpallas._broken else ""))
                if zpallas._broken: res[tag+"_fallback"] = True
            except Exception as exc:
                res[tag] = None; log(f"{tag} FAILED {str(exc)[:200]}")
            zpallas._reset_health()
        # value check fused2 vs baseline
        os.environ["ZAFTPU_FUSED2"] = "1"
        a = zaftpu.stft(x, win, STEP)
        os.environ["ZAFTPU_FUSED2"] = "0"
        b = zaftpu.stft(x, win, STEP)
        err = float(jnp.max(jnp.abs(jnp.real(a)-jnp.real(b))) + jnp.max(jnp.abs(jnp.imag(a)-jnp.imag(b))))
        sc = float(jnp.max(jnp.abs(jnp.real(b))))
        res[f"relerr_{ptag}"] = err/max(sc,1e-30)
        log(f"  fused2 vs base relerr [{ptag}]: {err/sc:.3g}")
    os.environ.pop("ZAFTPU_FUSED2", None); os.environ.pop("ZAFTPU_PRECISION", None)
    print(json.dumps(res))
if __name__ == "__main__": main()
