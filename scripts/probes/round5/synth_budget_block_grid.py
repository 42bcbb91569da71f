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
    win = hamming(WL).astype(np.float32); tdac = vorbis(WL).astype(np.float32)
    t_stft = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    t_mdct = int(np.ceil(SR*SECS/STEP)) + 1
    spec = zaftpu.stft(x, win, STEP); fetch_sync(spec)
    coeffs = zaftpu.mdct(x, tdac); fetch_sync(coeffs)
    vm = os.environ.get("ZAFTPU_VMEM_LIMIT_KIB", "32768")
    blk = os.environ.get("ZAFTPU_SYNTH_BLOCK", "128")
    os.environ["ZAFTPU_SYNTH"] = "1"
    res = {"vmem": vm, "block": blk}
    for prec, tag in (("", "hi"), ("split4", "s4")):
        if prec: os.environ["ZAFTPU_PRECISION"] = prec
        else: os.environ.pop("ZAFTPU_PRECISION", None)
        for nm, fn, fr in (("istft", lambda: zaftpu.istft(spec, win, STEP), t_stft),
                           ("imdct", lambda: zaftpu.imdct(coeffs, tdac), t_mdct)):
            zpallas._reset_health()
            try:
                _, st = timed(nm, fn, reps=3, dispatches=8, target_s=2.0, log=False)
                fb = zpallas._broken
                res[f"{nm}_{tag}"] = round(fr/st.seconds, 1)
                log(f"{nm}_{tag} [vm={vm} blk={blk}]: {st.seconds*1e3:.2f} ms -> {fr/st.seconds:,.0f} fr/s" + (" [FB]" if fb else ""))
                if fb: res[f"{nm}_{tag}_fallback"] = True
            except Exception as exc:
                res[f"{nm}_{tag}"] = None
                log(f"{nm}_{tag} FAILED {str(exc)[:150]}")
            zpallas._reset_health()
    print(json.dumps(res))
if __name__ == "__main__": main()
