import json, os, sys
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
def main():
    import jax, jax.numpy as jnp
    import zaftpu
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.sharding import make_mesh, melspectrogram_sharded, mdct_sharded, mfcc_sharded
    from zaftpu.utils.profiling import timed
    SR, WL, STEP, SECS = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR*SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32); tdac = vorbis(WL).astype(np.float32)
    fbank = zaftpu.melfilterbank(SR, WL, 40)
    mesh = make_mesh(1)
    t = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    res = {}
    def T(name, fn):
        _, st = timed(name, fn, reps=3, dispatches=8, target_s=2.0, log=False)
        res[name] = round(t/st.seconds, 1)
        log(f"{name}: {st.seconds*1e3:.2f} ms -> {t/st.seconds:,.0f} fr/s")
    T("mel_plain", lambda: zaftpu.melspectrogram(x, win, STEP, fbank))
    T("mdct_plain", lambda: zaftpu.mdct(x, tdac))
    for mode in ("auto", "0"):
        os.environ["ZAFTPU_SHARDED_FUSE"] = mode
        tag = "fused" if mode == "auto" else "split"
        T(f"mel_sharded_{tag}", lambda: melspectrogram_sharded(x, win, STEP, fbank, mesh))
        T(f"mdct_sharded_{tag}", lambda: mdct_sharded(x, tdac, mesh))
    os.environ.pop("ZAFTPU_SHARDED_FUSE", None)
    print(json.dumps(res))
if __name__ == "__main__": main()
