"""Bisect which combination of (1-D grid, manual DMA, VMEM scratch, dot)
the tunnel's Mosaic rejects — the round-3 fused kernel LOOKED
rejected on hardware while its ingredient kernels each compiled — RESOLVED
2026-08-20: the kernel was fine all along; the probes fetched the complex64
result, and complex device->host transfers UNIMPLEMENTED through this
tunnel. Kept (with plane fetches) as the compile-regression canary ladder:

  * framing kernel (1-D grid + pl.ANY + manual DMA + scratch, NO dot): OK
  * dot_min/dot_highest (dot in a kernel, NO grid): OK
  * fused (grid + DMA + scratch + dot): UNIMPLEMENTED

Ladder (each case in its own subprocess; a fresh-compile health check runs
between cases so a degraded-tunnel window cannot masquerade as a genuine
rejection — the round-2 lesson):

  dot_grid1    1-D grid, VMEM-blocked A, VMEM-resident B (const index), dot
  dot_scratch  no grid: copy A into a VMEM scratch, dot from the scratch
  dma_dot      no grid: A via pl.ANY + manual DMA into scratch, then dot
  fused_block  the real fused kernel body, single grid step
  fused_full   the real frames_rfft, production shape

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time

HEALTH = """
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
print("healthy")
"""

PRELUDE = """
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((256, 2048)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((2048, 1152)).astype(np.float32))
"""

CASES = {
    "dot_grid1": PRELUDE + """
def kern(a_ref, b_ref, o_ref):
    o_ref[:, :] = jax.lax.dot_general(a_ref[:, :], b_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
out = pl.pallas_call(kern,
    grid=(2,),
    in_specs=[pl.BlockSpec((128, 2048), lambda i: (i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((2048, 1152), lambda i: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((128, 1152), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((256, 1152), jnp.float32))(a, b)
print(float(jnp.abs(out - a @ b).max()))
""",
    "dot_scratch": PRELUDE + """
def kern(a_ref, b_ref, o_ref, scr):
    scr[:, :] = a_ref[:128, :]
    o_ref[:, :] = jax.lax.dot_general(scr[:, :], b_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 1152), jnp.float32),
    scratch_shapes=[pltpu.VMEM((128, 2048), jnp.float32)])(a, b)
print(float(jnp.abs(out - a[:128] @ b).max()))
""",
    "dma_dot": PRELUDE + """
def kern(a_ref, b_ref, o_ref, scr, sem):
    copy = pltpu.make_async_copy(a_ref.at[pl.ds(0, 128), :], scr, sem)
    copy.start(); copy.wait()
    o_ref[:, :] = jax.lax.dot_general(scr[:, :], b_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 1152), jnp.float32),
    scratch_shapes=[pltpu.VMEM((128, 2048), jnp.float32),
                    pltpu.SemaphoreType.DMA])(a, b)
print(float(jnp.abs(out - a[:128] @ b).max()))
""",
    "loop_dma_dot": PRELUDE + """
# Grid-free alternative: ONE kernel invocation, fori_loop over blocks,
# manual DMA in (ANY -> VMEM scratch) and out (VMEM -> ANY output).
def kern(a_ref, b_ref, o_ref, scr, res, sem_in, sem_out):
    def step(i, carry):
        cin = pltpu.make_async_copy(a_ref.at[pl.ds(i * 128, 128), :], scr,
                                    sem_in)
        cin.start(); cin.wait()
        res[:, :] = jax.lax.dot_general(scr[:, :], b_ref[:, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        cout = pltpu.make_async_copy(res, o_ref.at[pl.ds(i * 128, 128), :],
                                     sem_out)
        cout.start(); cout.wait()
        return carry
    jax.lax.fori_loop(0, 2, step, 0)
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((256, 1152), jnp.float32),
    scratch_shapes=[pltpu.VMEM((128, 2048), jnp.float32),
                    pltpu.VMEM((128, 1152), jnp.float32),
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA])(a, b)
print(float(jnp.abs(out - a @ b).max()))
""",
    "fused_block": """
import numpy as np, jax, jax.numpy as jnp
from zaftpu.pallas import fused
from zaftpu.core.windows import hamming
wl, step, t = 2048, 1024, 128  # exactly one grid step
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
}


def run(code, timeout_s=240):
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                              capture_output=True, text=True,
                              env=dict(os.environ))
        ok = proc.returncode == 0
        tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
        return {"ok": ok, "tail": tail[-1][:200] if tail else ""}
    except subprocess.TimeoutExpired:
        return {"ok": False, "tail": f"timeout {timeout_s}s"}


def main():
    out = {"ok": True, "cases": {}, "health": {}}
    for name, code in CASES.items():
        h = run(HEALTH, 90)
        if not h["ok"]:  # degraded tunnel: wait up to ~5 min for recovery
            for _ in range(4):
                time.sleep(60)
                h = run(HEALTH, 90)
                if h["ok"]:
                    break
        out["health"][name] = h["ok"]
        if not h["ok"]:
            out["cases"][name] = {"ok": False, "tail": "skipped: tunnel down"}
            print(f"{name}: tunnel down, skipped", file=sys.stderr, flush=True)
            continue
        out["cases"][name] = run(code)
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
