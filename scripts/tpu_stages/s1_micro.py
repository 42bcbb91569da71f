"""Stage 1: micro STFT/MDCT probe on the real chip.

Warms and times a 5-s STFT + MDCT + fused CQT at fixture scale. Confirms the
Mosaic/XLA compiles actually land on hardware and gives warm frames/s at
small scale. Prints ONE JSON line on stdout; progress on stderr.
"""

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.utils.profiling import fetch_sync

    devs = [str(d) for d in jax.devices()]
    log(f"devices: {devs}")
    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU",
                          "devices": devs}))
        return 1

    sr, wl, step = 44100, 2048, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sr * 5).astype(np.float32))
    win = hamming(wl).astype(np.float32)
    tdac = vorbis(wl).astype(np.float32)
    out = {"ok": True, "devices": devs}

    def timeit(name, fn, frames):
        try:
            t0 = time.perf_counter()
            r = fn()
            fetch_sync(r)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                r = fn()
            fetch_sync(r)
            warm = (time.perf_counter() - t0) / 5
        except Exception as exc:  # keep other measurements; retry next session
            out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{name}: FAILED ({type(exc).__name__}) — continuing")
            return
        out[name] = {"compile_s": round(compile_s, 2),
                     "warm_s": round(warm, 5),
                     "frames_per_s": round(frames / warm, 1)}
        log(f"{name}: compile {compile_s:.1f}s warm {warm * 1e3:.1f}ms "
            f"-> {frames / warm:,.0f} fr/s")

    t_frames = (sr * 5 + 2 * (wl // 2) - wl) // step + 1
    timeit("stft_5s", lambda: zaftpu.stft(x, win, step), t_frames)
    timeit("mdct_5s", lambda: zaftpu.mdct(x, tdac), sr * 5 // step + 1)

    kern = zaftpu.cqtkernel(sr, 24, 55.0, 3520.0)
    t_cqt = int(sr * 5 // round(sr / 25))
    timeit("cqt_5s", lambda: zaftpu.cqtspectrogram(x, sr, 25, kern), t_cqt)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
