"""Stage 7: tune the fused CQT on hardware — block size x matmul mode.

The fused time-domain CQT is the framework's most compute-dense transform
(mfu.json: 5.7% of f32 MXU peak at block=128). Sweeps ZAFTPU_CQT_BLOCK
{128, 256, 512, 1024} x {f32-highest, f32-high, bf16} in worker
subprocesses (the block size is baked into the jitted program) and records
warm frames/s for 120 s of audio. Prints ONE JSON line; the best cell
feeds the default-block decision.
"""

import json
import os
import subprocess
import sys

WORKER = "ZAFTPU_CQT_TUNE_WORKER"


def log(m):
    print(m, file=sys.stderr, flush=True)


def worker():

    import numpy as np

    import jax
    import jax.numpy as jnp

    import zaftpu

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1
    sr, secs = 44100, 120
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sr * secs).astype(np.float32))
    kern = zaftpu.cqtkernel(sr, 24, 55.0, 3520.0)
    frames = int(sr * secs // round(sr / 25))

    def run():
        return zaftpu.cqtspectrogram(x, sr, 25, kern)

    mode = os.environ.get("ZAFTPU_CQT_TUNE_MODE", "f32")
    ctx = (zaftpu.compute_dtype("bfloat16") if mode == "bf16"
           else _null_ctx())
    from zaftpu.utils.profiling import timed

    with ctx:
        # The repo-standard tunnel harness: dispatch-amortized with the
        # idle-fetch subtracted (the first-cut fixed-5-reps timing left a
        # ~0.2-0.5 s trailing fetch inside an ~45 ms window, reading ~2.7x
        # low across every cell).
        _, stats = timed("cqt_tune", run, reps=3, dispatches=8,
                         target_s=2.0, log=False)
        sec = stats.seconds
    print(json.dumps({"ok": True, "frames_per_s": round(frames / sec, 1),
                      "seconds": round(sec, 4)}))
    return 0


def _null_ctx():
    import contextlib

    return contextlib.nullcontext()


def main():
    if os.environ.get(WORKER) == "1":
        return worker()
    out = {"ok": True, "cells": {}}
    for block in ("128", "256", "512", "1024"):
        for mode, env_extra in (
                ("f32_highest", {}),
                ("f32_high", {"ZAFTPU_PRECISION": "high"}),
                ("bf16", {"ZAFTPU_CQT_TUNE_MODE": "bf16"})):
            name = f"block{block}_{mode}"
            env = dict(os.environ, ZAFTPU_CQT_BLOCK=block, **env_extra)
            env[WORKER] = "1"
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)], env=env,
                    timeout=300, capture_output=True, text=True)
                cell = (json.loads(proc.stdout.strip().splitlines()[-1])
                        if proc.returncode == 0 and proc.stdout.strip()
                        else {"ok": False, "rc": proc.returncode,
                              "err": proc.stderr.strip().splitlines()[-1][:120]
                              if proc.stderr.strip() else ""})
            except subprocess.TimeoutExpired:
                cell = {"ok": False, "reason": "timeout"}
            out["cells"][name] = cell
            log(f"{name}: {cell}")
    # The sweep is decision-grade once most cells landed — a single
    # tunnel-flake cell is interpolable from its neighbors and must not
    # burn another 3000 s session rerunning everything.
    n_ok = sum(1 for c in out["cells"].values() if c.get("ok"))
    out["ok"] = n_ok >= 9
    best = max((c for c in out["cells"].values() if c.get("ok")),
               key=lambda c: c["frames_per_s"], default=None)
    if best:
        out["best_frames_per_s"] = best["frames_per_s"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
