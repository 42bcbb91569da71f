"""Stage 10: full per-transform throughput suite on the chip.

Runs ``zaftpu.bench.harness`` (every public transform, 2 min of the real
fixture, 3-rep warm averages) in a worker subprocess and folds the per-
transform JSON lines into ONE stage result — the TPU column for the
per-transform table in docs/perf.md (the CPU column is already there).
"""

import json
import os
import subprocess
import sys


def main():
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-m", "zaftpu.bench.harness", "--seconds", "120"],
        env=env, timeout=1500, capture_output=True, text=True)
    print(proc.stderr[-3000:], file=sys.stderr, flush=True)
    rows = []
    for line in proc.stdout.strip().splitlines():
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    backend = "tpu" if "backend: tpu" in proc.stderr else "unknown"
    ok = proc.returncode == 0 and len(rows) >= 10 and backend == "tpu"
    print(json.dumps({"ok": ok, "backend": backend,
                      "transforms": {r["transform"]: r["frames_per_sec"]
                                     for r in rows if "transform" in r}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
