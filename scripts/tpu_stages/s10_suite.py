"""Stage 10: full per-transform throughput suite on the chip, default vs
conv formulation.

Runs ``zaftpu.bench.harness`` (every public transform, 2 min of the real
fixture, 3-rep warm averages) in worker subprocesses — once with the
default dispatch (ZAFTPU_FFT=auto -> GEMM engine + Pallas framing) and once
— and folds the per-transform JSON lines into ONE stage result: the TPU
columns for docs/perf.md's per-transform table.
"""

import json
import os
import subprocess
import sys


def run_arm(extra_env):
    env = dict(os.environ, **extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "zaftpu.bench.harness", "--seconds",
             "120"], env=env, timeout=1200, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        # A hung arm must not discard the arms already measured — the
        # stage-level JSON still prints with this arm marked failed.
        return {"arm_ok": False, "backend": "timeout", "transforms": {}}
    print(proc.stderr[-3000:], file=sys.stderr, flush=True)
    rows = []
    for line in proc.stdout.strip().splitlines():
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    backend = "tpu" if "backend: tpu" in proc.stderr else "unknown"
    # Per-arm status is "arm_ok", not "ok": the watcher's rerun check greps
    # the whole result file for '"ok": false', and the informational conv
    # arm failing must not force an endless rerun of the default sweep.
    return {"arm_ok": proc.returncode == 0 and len(rows) >= 10
                      and backend == "tpu",
            "backend": backend,
            "transforms": {r["transform"]: r["frames_per_sec"]
                           for r in rows if "transform" in r}}


def main():
    arms = {"default": run_arm({}),
            # 4-pass bf16-split GEMMs framework-wide (every exact-path real
            # matmul routes through policy.real_matmul): per-transform
            # numbers for the fastest gate-passing precision dial.
            "split4": run_arm({"ZAFTPU_PRECISION": "split4"})}
    # split4 is informational; the default column gates rerun.
    print(json.dumps({"ok": arms["default"]["arm_ok"], "arms": arms}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
