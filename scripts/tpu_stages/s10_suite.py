"""Stage 10: full per-transform throughput suite on the chip.

Runs ``zaftpu.bench.harness`` (every public transform, real-fixture audio,
3-rep amortized warm averages) in worker subprocesses and folds the
per-transform JSON lines into ONE stage result — the TPU columns for
docs/perf.md's per-transform table.

Arms:
  default   600 s audio, default dispatch (GEMM engine + Pallas framing)
  split4    600 s audio, ZAFTPU_PRECISION=split4 (the headline dial)
  hour      3600 s audio, default dispatch — BASELINE.md's headline table is
            hour-scale, so the beat is demonstrated at the same scale for
            every transform family (VERDICT.md round 2, item 8)
"""

import json
import os
import subprocess
import sys


def run_arm(extra_env, seconds, timeout_s=1200):
    env = dict(os.environ, **extra_env)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "zaftpu.bench.harness", "--seconds",
             str(seconds)], env=env, timeout=timeout_s, capture_output=True,
            text=True)
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
    # the whole result file for '"ok": false', and an informational arm
    # failing must not force an endless rerun of the default sweep.
    return {"arm_ok": proc.returncode == 0 and len(rows) >= 10
                      and backend == "tpu",
            "backend": backend,
            "seconds_of_audio": seconds,
            "transforms": {r["transform"]: r["frames_per_sec"]
                           for r in rows if "transform" in r}}


def main():
    arms = {"default": run_arm({}, 600),
            # 4-pass bf16-split GEMMs framework-wide (every exact-path real
            # matmul routes through policy.real_matmul): per-transform
            # numbers for the fastest gate-passing precision dial.
            "split4": run_arm({"ZAFTPU_PRECISION": "split4"}, 600),
            # Hour-scale: BASELINE.md's headline scale for all families.
            "hour": run_arm({}, 3600, timeout_s=2400)}
    # split4/hour are informational; the default column gates rerun.
    print(json.dumps({"ok": arms["default"]["arm_ok"], "arms": arms}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
