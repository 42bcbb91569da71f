"""Bisect which construct of the slab-CQT kernel the remote Mosaic rejects
(s21: both block sizes fail with a tpu_compile_helper 500; interpret mode
passes bit-clean).

Suspects, each in its own minimal kernel + subprocess with health checks:

  dma_unaligned   DMA (rows, 1764) f32 ANY -> VMEM (lane dim not a
                  multiple of 128) and copy through
  dot_k1764       dot with K=1764 VMEM operands (unaligned contraction)
  op3d_index      .at[k] static indexing into a (S, rows, 128) ANY ref
  seg_shift_dot   row-shifted static slices of a VMEM seg feeding dots
                  (the framing-kernel trick at unaligned width)
  acc_loop        19 accumulating dots from a DMA-per-iteration operand
  full_kernel     the real cqtslab kernel, small shapes

Prints ONE JSON line. Full stderr tails are kept (500 chars) — the s21
probe's 250-char truncation hid the compile-helper error body.
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
"""

CASES = {
    "dma_unaligned": PRELUDE + """
a = jnp.asarray(rng.standard_normal((64, 1764)).astype(np.float32))
def kern(a_ref, o_ref, scr, sem):
    cp = pltpu.make_async_copy(a_ref.at[pl.ds(0, 64), :], scr, sem)
    cp.start(); cp.wait()
    o_ref[...] = scr[...] * 2.0
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 1764), jnp.float32),
    scratch_shapes=[pltpu.VMEM((64, 1764), jnp.float32),
                    pltpu.SemaphoreType.DMA])(a)
print(float(jnp.abs(out - a*2).max()))
""",
    "dot_k1764": PRELUDE + """
a = jnp.asarray(rng.standard_normal((64, 1764)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((1764, 256)).astype(np.float32))
def kern(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(a_ref[...], b_ref[...],
        (((1,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32))(a, b)
ref = jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
print(float(jnp.abs(out - ref).max() / jnp.abs(ref).max()))
""",
    "op3d_index": PRELUDE + """
ops = jnp.asarray(rng.standard_normal((19, 64, 128)).astype(np.float32))
def kern(op_ref, o_ref, scr, sem):
    cp = pltpu.make_async_copy(op_ref.at[3], scr, sem)
    cp.start(); cp.wait()
    o_ref[...] = scr[...]
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA])(ops)
print(float(jnp.abs(out - ops[3]).max()))
""",
    "seg_shift_dot": PRELUDE + """
a = jnp.asarray(rng.standard_normal((83, 1764)).astype(np.float32))
b = jnp.asarray(rng.standard_normal((1764, 256)).astype(np.float32))
def kern(a_ref, b_ref, o_ref):
    acc = jax.lax.dot_general(a_ref[0:64, :], b_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for k in range(1, 4):
        acc = acc + jax.lax.dot_general(a_ref[k:k+64, :], b_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[...] = acc
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32))(a, b)
ref = sum(jnp.matmul(a[k:k+64], b) for k in range(4))
print(float(jnp.abs(out - ref).max() / jnp.abs(ref).max()))
""",
    "acc_loop": PRELUDE + """
a = jnp.asarray(rng.standard_normal((83, 1764)).astype(np.float32))
ops = jnp.asarray(rng.standard_normal((19, 1764, 256)).astype(np.float32))
def kern(a_ref, op_ref, o_ref, opbuf, sem):
    acc = None
    for k in range(19):
        cp = pltpu.make_async_copy(op_ref.at[k], opbuf, sem)
        cp.start(); cp.wait()
        p = jax.lax.dot_general(a_ref[k:k+64, :], opbuf[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    o_ref[...] = acc
out = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    scratch_shapes=[pltpu.VMEM((1764, 256), jnp.float32),
                    pltpu.SemaphoreType.DMA])(a, ops)
ref = sum(jnp.matmul(a[k:k+64], ops[k]) for k in range(19))
print(float(jnp.abs(out - ref).max() / jnp.abs(ref).max()))
""",
    "full_kernel": """
import numpy as np, jax, jax.numpy as jnp
import zaftpu
from zaftpu.pallas import cqtslab
from zaftpu.transforms import cqt as cqt_mod
sr, time_res = 8000, 25
kern = cqt_mod._as_kernel(zaftpu.cqtkernel(sr, 12, 110.0, 880.0))
step = round(sr / time_res); n = sr * 4
x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
t = n // step; L = kern.fft_length
m_real = np.ascontiguousarray(kern.time_kernel.real.T).astype(np.float32)
m_imag = np.ascontiguousarray(kern.time_kernel.imag.T).astype(np.float32)
key = ("bisect", sr, 12)
cqtslab.register_kernel(key, m_real, m_imag)
pad_front = int(-(-(L - step) // 2))
padded = jnp.asarray(np.pad(x, (pad_front, L)))
got = np.asarray(cqtslab.cqt_magnitudes(padded, key, step, L, t,
                                        kern.number_frequencies, block=16))
ref = np.asarray(zaftpu.cqtspectrogram(x, sr, time_res, kern)).T
print(float(np.max(np.abs(got - ref)) / np.max(np.abs(ref))))
""",
}


def run(code, timeout_s=360):
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              timeout=timeout_s, capture_output=True,
                              text=True, env=dict(os.environ))
        ok = proc.returncode == 0
        if ok:
            lines = proc.stdout.strip().splitlines()
            return {"ok": True, "tail": lines[-1][:200] if lines else ""}
        return {"ok": False, "tail": proc.stderr.strip()[-500:]}
    except subprocess.TimeoutExpired:
        return {"ok": False, "tail": f"timeout {timeout_s}s"}


def healthy():
    if run(HEALTH, 90)["ok"]:
        return True
    for _ in range(4):
        time.sleep(60)
        if run(HEALTH, 90)["ok"]:
            return True
    return False


def main():
    out = {"ok": True, "cases": {}, "health": {}}
    for name, code in CASES.items():
        ok_h = healthy()
        out["health"][name] = ok_h
        if not ok_h:
            out["cases"][name] = {"ok": False, "tail": "skipped: tunnel down"}
            print(f"{name}: tunnel down, skipped", file=sys.stderr,
                  flush=True)
            continue
        out["cases"][name] = run(code)
        print(f"{name}: ok={out['cases'][name]['ok']} "
              f"{out['cases'][name]['tail'][:200]}", file=sys.stderr,
              flush=True)
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
