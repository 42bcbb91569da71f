import json, os, sys
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
def main():
    import jax, jax.numpy as jnp
    import zaftpu
    from zaftpu.core.windows import hamming
    from zaftpu.utils.profiling import fetch_sync, timed
    SR, WL, STEP, SECS = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR*SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    t_stft = int(np.ceil((SR*SECS + 2*(WL//2) - WL)/STEP)) + 1
    os.environ["ZAFTPU_PRECISION"] = "split4"
    _, st = timed("stft", lambda: zaftpu.stft(x, win, STEP), reps=5, dispatches=8, target_s=2.0, log=False)
    log(f"stft_s4 [vmem={os.environ.get('ZAFTPU_VMEM_LIMIT_KIB','32768')}]: {st.seconds*1e3:.2f} ms -> {t_stft/st.seconds:,.0f} fr/s")
    print(json.dumps({"vmem": os.environ.get("ZAFTPU_VMEM_LIMIT_KIB","32768"), "stft_s4_fps": round(t_stft/st.seconds,1)}))
if __name__ == "__main__": main()
