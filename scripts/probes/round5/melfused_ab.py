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
    fbank = zaftpu.melfilterbank(SR, WL, 40)
    t = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    res = {}
    for prec, ptag in (("", "hi"), ("split4", "s4")):
        if prec: os.environ["ZAFTPU_PRECISION"] = prec
        else: os.environ.pop("ZAFTPU_PRECISION", None)
        for mf in ("0", "auto"):
            os.environ["ZAFTPU_MELFUSE"] = mf
            tag = f"{ptag}_melfuse={mf}"
            for nm, fn in (("mel", lambda: zaftpu.melspectrogram(x, win, STEP, fbank)),
                           ("mfcc", lambda: zaftpu.mfcc(x, win, STEP, fbank, 20))):
                zpallas._reset_health()
                try:
                    _, st = timed(nm, fn, reps=3, dispatches=8, target_s=2.0, log=False)
                    fb = zpallas._broken
                    res[f"{nm}_{tag}"] = round(t/st.seconds, 1)
                    log(f"{nm}_{tag}: {st.seconds*1e3:.2f} ms -> {t/st.seconds:,.0f} fr/s" + (" [FB]" if fb else ""))
                    if fb: res[f"{nm}_{tag}_fallback"] = True
                except Exception as exc:
                    res[f"{nm}_{tag}"] = None; log(f"{nm}_{tag} FAILED {str(exc)[:200]}")
                zpallas._reset_health()
        # value check
        os.environ["ZAFTPU_MELFUSE"] = "auto"
        a = zaftpu.melspectrogram(x, win, STEP, fbank)
        os.environ["ZAFTPU_MELFUSE"] = "0"
        b = zaftpu.melspectrogram(x, win, STEP, fbank)
        err = float(jnp.max(jnp.abs(a-b))); sc = float(jnp.max(jnp.abs(b)))
        res[f"relerr_{ptag}"] = err/max(sc,1e-30)
        log(f"  melfuse vs split relerr [{ptag}]: {err/sc:.3g}")
    os.environ.pop("ZAFTPU_MELFUSE", None); os.environ.pop("ZAFTPU_PRECISION", None)
    print(json.dumps(res))
if __name__ == "__main__": main()
