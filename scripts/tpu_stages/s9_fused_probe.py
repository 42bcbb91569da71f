"""Stage 9: bisect the fused-kernel Mosaic failure on hardware.

2026-08-17: the tunnel's remote Mosaic compiler (tpu_compile_helper) returns
HTTP 500 on zaftpu.pallas.fused.frames_rfft while the framing/OLA kernels
compile fine. This stage runs a ladder of candidate kernels — each in its
own subprocess, since one failed compile poisons later device fetches — to
find which feature breaks it:

  dot_min       — plain (128,2048)@(2048,1152) dot_general in a kernel
  dot_highest   — same with Precision.HIGHEST
  op3d          — operator passed as a (1, 2048, 1152) 3-D block
  grid2         — (2, T) grid with the operator block indexed by axis 0
  fused_small   — the real frames_rfft, wl=512 (2.3 MB operator)
  fused_full    — the real frames_rfft, wl=2048 (the production shape)

Prints ONE JSON line. If fused_full passes, flip ZAFTPU_FUSED default.
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
    "op3d": """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def kern(a, b, o):
    o[0, :, :] = jax.lax.dot_general(a[:, :], b[0], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2048, 1152)).astype(np.float32))
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec((1, 2048, 1152), lambda: (0, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 128, 1152), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 128, 1152), jnp.float32))(a, b)
print(float(jnp.abs(out[0] - a @ b[0]).max()))
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
frames = np.stack([x[i*step:i*step+wl]*win for i in range(t)])
ref = np.fft.rfft(frames, axis=-1)
print(float(np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()))
""",
    "fused_full": """
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
wl, step, t = 2048, 1024, 256
x = np.random.default_rng(0).standard_normal(t*step + wl).astype(np.float32)
win = hamming(wl).astype(np.float32)
out = fused.frames_rfft(jnp.asarray(x), jnp.asarray(win), wl, step, t)
frames = np.stack([x[i*step:i*step+wl]*win for i in range(t)])
ref = np.fft.rfft(frames, axis=-1)
print(float(np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()))
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
