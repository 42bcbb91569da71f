"""Stage 9: probe the fused analysis kernel on hardware.

Round 2 bisected the original fused kernel's Mosaic failure: the tunnel's
remote compiler rejects 2-D grids (grid2 fails) while 1-D-grid dot kernels,
3-D operand blocks, and the manual-DMA framing kernel all compile. Round 3
reformulated zaftpu.pallas.fused inside that accepted set (one 1-D-grid
pallas_call per operator component). This ladder proves the new kernel —
each case in its own subprocess, since one failed compile poisons later
device fetches:

  dot_min       — plain (128,2048)@(2048,1152) dot_general in a kernel
  dot_highest   — same with Precision.HIGHEST
  grid2         — 2-D grid canary (expected to stay broken on this tunnel)
  reduceprec    — in-kernel lax.reduce_precision + bf16x bf16->f32 dots
                  (the split4 scheme's primitives)
  fused_small   — the real frames_rfft, wl=512 (2.3 MB operator)
  fused_full    — the real frames_rfft, wl=2048 (the production shape)
  fused_split4  — frames_rfft under ZAFTPU_PRECISION=split4 (in-VMEM
                  4-pass) at PRODUCTION grid length — compiles at t=256
                  but 500s the remote Mosaic helper at t=25841, which is
                  why split4 is excluded from the fused auto-dispatch

Prints ONE JSON line. If fused_full passes, flip the ZAFTPU_FUSED default.
"""

import json
import os
import subprocess
import sys

PROBE = "ZAFTPU_FUSED_PROBE"

CASES = {
    "dot_min": """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(a, b, o):
    o[:, :] = jax.lax.dot_general(a[:, :], b[:, :], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((2048, 1152)).astype(np.float32))
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 1152), jnp.float32))(a, b)
print(float(jnp.abs(out - a @ b).max()))
""",
    "dot_highest": """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(a, b, o):
    o[:, :] = jax.lax.dot_general(a[:, :], b[:, :], (((1,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((2048, 1152)).astype(np.float32))
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 1152), jnp.float32))(a, b)
print(float(jnp.abs(out - a @ b).max()))
""",
    "reduceprec": """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(a, b, o):
    fr = a[:, :]
    hi = jax.lax.reduce_precision(fr, exponent_bits=8, mantissa_bits=7)
    ah, al = hi.astype(jnp.bfloat16), (fr - hi).astype(jnp.bfloat16)
    def mm(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    o[:, :] = (mm(al, b[1]) + mm(al, b[0])) + (mm(ah, b[1]) + mm(ah, b[0]))
a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 2048)).astype(np.float32))
bh = np.random.default_rng(1).standard_normal((2048, 1152)).astype(np.float32)
import ml_dtypes
b = jnp.asarray(np.stack([bh, bh * 2**-8]).astype(ml_dtypes.bfloat16))
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 1152), jnp.float32))(a, b)
ref = a @ (b[0].astype(jnp.float32) + b[1].astype(jnp.float32))
print(float(jnp.abs(out - ref).max() / jnp.abs(ref).max()))
""",
    "grid2": """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(a_ref, b_ref, o_ref):
    o_ref[0, :, :] = jax.lax.dot_general(a_ref[:, :], b_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
a = jnp.asarray(np.random.default_rng(0).standard_normal((256, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2048, 1152)).astype(np.float32))
out = pl.pallas_call(kern,
    grid=(2, 2),
    in_specs=[pl.BlockSpec((128, 2048), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((1, 2048, 1152), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 128, 1152), lambda j, i: (j, i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((2, 256, 1152), jnp.float32))(a, b)
ref = jnp.stack([a @ b[0], a @ b[1]])
print(float(jnp.abs(out - ref).max()))
""",
    "fused_small": """
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
wl, step, t = 512, 256, 64
x = np.random.default_rng(0).standard_normal(t*step + wl).astype(np.float32)
win = hamming(wl).astype(np.float32)
out = fused.frames_rfft(jnp.asarray(x), jnp.asarray(win), wl, step, t)
# Fetch the planes, NEVER the complex array: complex device->host transfers
# UNIMPLEMENTED through this tunnel regardless of what computed them (the
# round-3 fused "rejections" were exactly this fetch artifact).
re, im = np.asarray(jnp.real(out)), np.asarray(jnp.imag(out))
frames = np.stack([x[i*step:i*step+wl]*win for i in range(t)])
ref = np.fft.rfft(frames, axis=-1)
print(float(max(np.abs(re - ref.real).max(), np.abs(im - ref.imag).max())
            / np.abs(ref).max()))
""",
    "fused_full": """
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
wl, step, t = 2048, 1024, 256
x = np.random.default_rng(0).standard_normal(t*step + wl).astype(np.float32)
win = hamming(wl).astype(np.float32)
out = fused.frames_rfft(jnp.asarray(x), jnp.asarray(win), wl, step, t)
# Fetch the planes, NEVER the complex array: complex device->host transfers
# UNIMPLEMENTED through this tunnel regardless of what computed them (the
# round-3 fused "rejections" were exactly this fetch artifact).
re, im = np.asarray(jnp.real(out)), np.asarray(jnp.imag(out))
frames = np.stack([x[i*step:i*step+wl]*win for i in range(t)])
ref = np.fft.rfft(frames, axis=-1)
print(float(max(np.abs(re - ref.real).max(), np.abs(im - ref.imag).max())
            / np.abs(ref).max()))
""",
    "fused_split4": """
import os
os.environ["ZAFTPU_PRECISION"] = "split4"
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
# PRODUCTION grid length: the 4-pass kernel compiles at t=256 but the
# remote Mosaic helper 500s at t=25841 (2026-08-20) — probe the real shape.
wl, step, t = 2048, 1024, 25841
x = np.random.default_rng(0).standard_normal(t*step + wl).astype(np.float32)
win = hamming(wl).astype(np.float32)
out = fused.frames_rfft(jnp.asarray(x), jnp.asarray(win), wl, step, t)
# Fetch the planes, NEVER the complex array: complex device->host transfers
# UNIMPLEMENTED through this tunnel regardless of what computed them (the
# round-3 fused "rejections" were exactly this fetch artifact).
re, im = np.asarray(jnp.real(out)), np.asarray(jnp.imag(out))
frames = np.stack([x[i*step:i*step+wl]*win for i in range(t)])
ref = np.fft.rfft(frames, axis=-1)
print(float(max(np.abs(re - ref.real).max(), np.abs(im - ref.imag).max())
            / np.abs(ref).max()))
""",
}


def main():
    out = {"ok": True, "cases": {}}
    for name, code in CASES.items():
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=240,
                capture_output=True, text=True, env=dict(os.environ))
            ok = proc.returncode == 0
            tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
            out["cases"][name] = {"ok": ok,
                                  "tail": tail[-1][:200] if tail else ""}
        except subprocess.TimeoutExpired:
            out["cases"][name] = {"ok": False, "tail": "timeout 240s"}
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    # The stage succeeded if it produced verdicts for the interesting cases
    # (the kernel itself failing IS a result); only a dead tunnel — nothing
    # ran at all — warrants a rerun.
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    out["fused_full_ok"] = out["cases"]["fused_full"]["ok"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
