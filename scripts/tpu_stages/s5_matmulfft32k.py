"""Stage 5: validate the four-step matmul FFT at n=32768 f32 ON HARDWARE.

The matmul engine exists precisely as the hedge for the case that cannot be
CPU-validated for its purpose: XLA's native 32k-point FFT takes ~276 s to
compile on this TPU. Measures compile time, accuracy vs a NumPy f64 oracle,
and warm throughput for a (64, 32768) f32 batch. Prints ONE JSON line.
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

    from zaftpu.core.fft import matmul_fft
    from zaftpu.utils.profiling import fetch_sync

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    n, batch = 32768, 64
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((batch, n)).astype(np.float32)
    x = jnp.asarray(x_np)

    fn = jax.jit(matmul_fft)
    t0 = time.perf_counter()
    y = fn(x)
    fetch_sync(y)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        y = fn(x)
    fetch_sync(y)
    warm_s = (time.perf_counter() - t0) / 5

    oracle = np.fft.fft(x_np.astype(np.float64), axis=-1)
    # Fetch real/imag separately: complex device->host transfers through the
    # tunnel fail with UNIMPLEMENTED (see fetch_sync).
    got = (np.asarray(jax.device_get(jnp.real(y)), np.float64)
           + 1j * np.asarray(jax.device_get(jnp.imag(y)), np.float64))
    err = np.abs(got - oracle)
    scale = np.abs(oracle).max()
    snr = 10 * np.log10(
        float((np.abs(oracle) ** 2).sum()) / float((err ** 2).sum()))
    out = {
        "ok": bool(snr > 100.0),
        "n": n, "batch": batch,
        "compile_s": round(compile_s, 2),
        "warm_s": round(warm_s, 4),
        "ffts_per_s": round(batch / warm_s, 1),
        "snr_db": round(snr, 1),
        "max_rel_err": float(err.max() / scale),
    }
    log(f"matmul_fft 32k: compile {compile_s:.1f}s warm {warm_s * 1e3:.1f}ms "
        f"SNR {snr:.1f} dB")
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
