"""Stage 12: Pallas mirror/fold kernels on hardware — compile + A/B.

The conjugate mirror / Hermitian fold cost 4-6 ms of the 10-min
STFT/ISTFT as XLA lane gathers (docs/perf.md "STFT pipeline breakdown");
the Pallas kernels (zaftpu/pallas/mirror.py) do the reversal on VMEM
tiles. This stage runs the full stft/istft under ``ZAFTPU_MIRROR=pallas``
for both reversal strategies in worker subprocesses, checks bit-equality
against the default gather program, and times all arms. The kernels are
opt-in until this stage proves them under the remote Mosaic compiler
(which 500s on the fused framing+DFT kernel while framing/OLA compile
fine — this kernel is pure data movement, the framing/OLA class).

Pallas arms are informational (a Mosaic rejection is a result); only the
default arm gates the stage's ok flag.
"""

import json
import os
import subprocess
import sys

WORKER = "ZAFTPU_MIRROR_PROBE_WORKER"


def log(m):
    print(m, file=sys.stderr, flush=True)


def worker():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import zaftpu
    from zaftpu.core.frame import stft_padding
    from zaftpu.core.windows import hamming
    from zaftpu.utils.profiling import timed

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1
    sr, wl, step, secs = 44100, 2048, 1024, 600
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sr * secs).astype(np.float32))
    win = hamming(wl).astype(np.float32)
    frames = stft_padding(sr * secs, wl, step)[2]

    spec, stats = timed("stft", lambda: zaftpu.stft(x, win, step),
                        reps=3, dispatches=8, target_s=2.0, log=False)
    stft_s = stats.seconds
    _, stats = timed("istft", lambda: zaftpu.istft(spec, win, step),
                     reps=3, dispatches=8, target_s=2.0, log=False)
    out = {
        "ok": True,
        "mirror": os.environ.get("ZAFTPU_MIRROR", "gather"),
        "strategy": os.environ.get("ZAFTPU_MIRROR_STRATEGY", "-"),
        "stft_frames_per_s": round(frames / stft_s, 1),
        "istft_frames_per_s": round(frames / stats.seconds, 1),
    }
    # A Mosaic rejection latches mark_broken and the guarded retry measures
    # the XLA fallback instead — indistinguishable from a working kernel by
    # numbers alone (exactly what happened to the rev arm in r2, ADVICE.md).
    # Record whether the Pallas path was actually live when we timed.
    if os.environ.get("ZAFTPU_MIRROR") == "pallas":
        import zaftpu.pallas as _zp

        out["fallback"] = bool(_zp._broken) or not _zp.enabled()
    # Bit-equality vs the gather formulation computed in-process: a second
    # trace with the kernel dispatch disabled.
    if os.environ.get("ZAFTPU_MIRROR") == "pallas":
        os.environ["ZAFTPU_MIRROR"] = "gather"
        jax.clear_caches()
        ref = zaftpu.stft(x, win, step)
        err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(spec, ref)
        out["max_abs_err_vs_gather"] = float(jax.device_get(err))
    print(json.dumps(out))
    return 0


ARMS = (
    ("gather_default", {}),
    ("pallas_rev", {"ZAFTPU_MIRROR": "pallas",
                    "ZAFTPU_MIRROR_STRATEGY": "rev"}),
    ("pallas_dot", {"ZAFTPU_MIRROR": "pallas",
                    "ZAFTPU_MIRROR_STRATEGY": "dot"}),
)


def main():
    if os.environ.get(WORKER) == "1":
        return worker()
    results = {}
    for label, extra in ARMS:
        env = dict(os.environ, **extra)
        env[WORKER] = "1"
        log(f"--- mirror arm: {label} ({extra})")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=600, capture_output=True, text=True)
            log(proc.stderr[-1500:])
            results[label] = (json.loads(proc.stdout.strip().splitlines()[-1])
                              if proc.returncode == 0 and proc.stdout.strip()
                              else {"ok": False, "rc": proc.returncode,
                                    "tail": proc.stderr.strip()
                                    .splitlines()[-1][:160]
                                    if proc.stderr.strip() else ""})
        except subprocess.TimeoutExpired:
            results[label] = {"ok": False, "reason": "timeout"}
        results[label]["arm_ok"] = results[label].pop("ok", False)
        log(f"{label}: {results[label]}")
    print(json.dumps({"ok": results["gather_default"].get("arm_ok", False),
                      "arms": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
