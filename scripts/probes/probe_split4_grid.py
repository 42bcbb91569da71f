"""Bisect the split4 fused kernel's Mosaic 500 over grid length (VERDICT r3
item 5).

Round-3 state: the in-VMEM 4-pass bf16-split fused kernel compiles and is
accurate at small scale (relerr 2.9e-6) but the remote Mosaic helper 500s at
production grid lengths (t=25841), so split4 — the bench-winning precision
mode — never gets the fused kernel's HBM savings
(zaftpu/pallas/__init__.py split4 exclusion).

The kernel BODY is identical at every t (block=128 throughout); only the
grid bound and the input rows change. This walks t at the fixed split4 body
to find the threshold, with the default-precision body at max t as the
known-good control (it shipped in round 3). If a sharp threshold exists,
the fix is a segmented dispatch (several pallas_calls of <=threshold
frames); if the failure is diffuse/transient, it's tunnel capacity, not a
construct.

Each case runs in its own subprocess; a fresh-compile health check runs
between cases (a degraded-tunnel window must not read as a rejection —
CLAUDE.md). Verification fetches PLANES (never complex) and checks a frame
subset against numpy.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

T_WALK = [1024, 4096, 8192, 12800, 19200, 25841]

HEALTH = """
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
print("healthy")
"""

CASE = """
import os
os.environ["ZAFTPU_PRECISION"] = {precision!r}
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
wl, step, t = 2048, 1024, {t}
x = np.random.default_rng(0).standard_normal(t*step + wl).astype(np.float32)
win = hamming(wl).astype(np.float32)
out = fused.frames_rfft(jnp.asarray(x), jnp.asarray(win), wl, step, t)
# Planes only — complex fetches UNIMPLEMENTED through this tunnel.
sel = np.arange(0, t, max(1, t // 64))
re = np.asarray(jnp.real(out)[sel])
im = np.asarray(jnp.imag(out)[sel])
frames = np.stack([x[i*step:i*step+wl]*win for i in sel])
ref = np.fft.rfft(frames, axis=-1)
relerr = float(max(np.abs(re - ref.real).max(), np.abs(im - ref.imag).max())
               / np.abs(ref).max())
assert relerr < 5e-5, relerr
print(relerr)
"""


def run(code, timeout_s=420):
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              timeout=timeout_s, capture_output=True,
                              text=True, env=dict(os.environ))
        ok = proc.returncode == 0
        tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
        return {"ok": ok, "tail": tail[-1][:300] if tail else ""}
    except subprocess.TimeoutExpired:
        return {"ok": False, "tail": f"timeout {timeout_s}s"}


def healthy():
    h = run(HEALTH, 90)
    if h["ok"]:
        return True
    for _ in range(4):
        time.sleep(60)
        if run(HEALTH, 90)["ok"]:
            return True
    return False


def main():
    out = {"ok": True, "cases": {}, "health": {}}
    cases = [("control_highest_t25841",
              CASE.format(precision="highest", t=25841))]
    cases += [(f"split4_t{t}", CASE.format(precision="split4", t=t))
              for t in T_WALK]
    # Re-test the small case LAST too: if it fails at the end but passed
    # first, the tunnel degraded mid-probe and the walk is void.
    cases.append(("split4_t1024_recheck",
                  CASE.format(precision="split4", t=1024)))
    for name, code in cases:
        ok_h = healthy()
        out["health"][name] = ok_h
        if not ok_h:
            out["cases"][name] = {"ok": False, "tail": "skipped: tunnel down"}
            print(f"{name}: tunnel down, skipped", file=sys.stderr,
                  flush=True)
            continue
        out["cases"][name] = run(code)
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
