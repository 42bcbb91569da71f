"""Stage 14: shard_map construct ladder on the real chip.

History: round 3's s13 (sharded transforms on a 1-device TPU mesh) failed
every case with ``UNIMPLEMENTED`` — RESOLVED 2026-08-20: nothing was wrong
with shard_map at all. The probe fetched the stft case's complex64 result
(complex device->host transfers UNIMPLEMENTED through this tunnel), and
that one failed fetch poisoned the process for every later case. With
plane fetches, stft_sharded runs on the chip at parity. This ladder stays
as the per-construct compile canary (each case its own subprocess):

  jit_io_sharding   jit with NamedSharding on inputs/outputs (no shard_map)
  shmap_identity    shard_map(x * 2) over a 1-device mesh
  shmap_psum        + a psum collective
  shmap_ppermute    + the masked ppermute ring (what the halo layer uses)
  shmap_dot         + an MXU dot inside shard_map
  shmap_concat      concat block with a zeros tail (halo.pull n==1 path)
  shmap_frames      extract_frames (reshape + K block views + concat)
  shmap_gemm_engine frames -> real_matmul HIGHEST (the engine rfft GEMM)
  shmap_complex     lax.complex + conj + abs inside shard_map
  shmap_gather      the conjugate-mirror index gather inside shard_map
  shmap_scatter_add .at[].add (the OLA boundary-sum form)
  mdct_sharded      public mdct_sharded, tiny (real-only end-to-end)
  stft_sharded_nat  stft_sharded under ZAFTPU_FFT=native (no engine GEMMs)
  stft_sharded      the real zaftpu stft_sharded on a tiny signal

Prints ONE JSON line with per-case verdicts.
"""

import json
import os
import subprocess
import sys

PRELUDE = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map
mesh = Mesh(np.asarray(jax.devices()[:1]), ("frames",))
x = jnp.asarray(np.arange(1024, dtype=np.float32))
"""

CASES = {
    "jit_io_sharding": PRELUDE + """
s = NamedSharding(mesh, P("frames"))
f = jax.jit(lambda v: v * 2 + 1, in_shardings=s, out_shardings=s)
out = f(jax.device_put(x, s))
assert float(out[3]) == 7.0
print("ok")
""",
    "shmap_identity": PRELUDE + """
f = jax.jit(shard_map(lambda v: v * 2, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
assert float(f(x)[3]) == 6.0
print("ok")
""",
    "shmap_psum": PRELUDE + """
f = jax.jit(shard_map(lambda v: jax.lax.psum(v.sum(), "frames") + v,
                      mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
out = f(x)
assert out.shape == x.shape
print("ok")
""",
    "shmap_ppermute": PRELUDE + """
def body(v):
    n = jax.lax.psum(1, "frames")
    halo = jax.lax.ppermute(v[:8], "frames",
                            perm=[(i, (i - 1) % n) for i in range(n)])
    return v + halo.sum()
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
out = f(x)
assert out.shape == x.shape
print("ok")
""",
    "shmap_dot": PRELUDE + """
a = jnp.asarray(np.random.default_rng(0).standard_normal(
    (256, 256)).astype(np.float32))
def body(v):
    return jnp.matmul(v, a, precision=jax.lax.Precision.HIGHEST)
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames", None),
                      out_specs=P("frames", None)))
out = f(jnp.ones((512, 256), np.float32))
assert out.shape == (512, 256)
print("ok")
""",
    "shmap_concat": PRELUDE + """
def body(v):
    z = jnp.zeros((1024,), v.dtype)
    return jnp.concatenate([v, z], axis=-1)[:v.shape[-1]]
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
assert f(x).shape == x.shape
print("ok")
""",
    "shmap_frames": PRELUDE + """
from zaftpu.core.frame import extract_frames
sig = jnp.asarray(np.random.default_rng(1).standard_normal(
    64 * 1024 + 1024).astype(np.float32))
def body(v):
    return extract_frames(v, 2048, 1024, 63)
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames", None)))
out = f(sig)
assert out.shape == (63, 2048)
print("ok")
""",
    "shmap_gemm_engine": PRELUDE + """
from zaftpu.core.frame import extract_frames
from zaftpu.core.policy import real_matmul
op = jnp.asarray(np.random.default_rng(2).standard_normal(
    (2048, 1152)).astype(np.float32))
sig = jnp.asarray(np.random.default_rng(1).standard_normal(
    64 * 1024 + 1024).astype(np.float32))
def body(v):
    return real_matmul(extract_frames(v, 2048, 1024, 63), op)
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames", None)))
assert f(sig).shape == (63, 1152)
print("ok")
""",
    "shmap_complex": PRELUDE + """
def body(v):
    z = jax.lax.complex(v, v * 2)
    return jnp.abs(jnp.conj(z) * z)
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
assert f(x).shape == x.shape
print("ok")
""",
    "shmap_gather": PRELUDE + """
# The conjugate-mirror gather from core.fft.full_from_half: indices
# n - k for k in half..n-1 (values 1023..1), applied to the lane axis.
idx = jnp.asarray((2048 - np.arange(1025, 2048)).astype(np.int32))
v2 = jnp.asarray(np.random.default_rng(3).standard_normal(
    (8, 1025)).astype(np.float32))
def body(m):
    return jnp.concatenate([m, m[..., idx]], axis=-1)
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames", None),
                      out_specs=P("frames", None)))
assert f(v2).shape[-1] == 2048
print("ok")
""",
    "shmap_scatter_add": PRELUDE + """
def body(v):
    return v.at[:128].add(v[-128:])
f = jax.jit(shard_map(body, mesh=mesh, in_specs=P("frames"),
                      out_specs=P("frames")))
assert f(x).shape == x.shape
print("ok")
""",
    "mdct_sharded": """
import numpy as np, jax, jax.numpy as jnp
import zaftpu
from zaftpu.core.windows import vorbis
from zaftpu.sharding import make_mesh, mdct_sharded
mesh = make_mesh(1)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    44100).astype(np.float32))
win = vorbis(2048).astype(np.float32)
got = np.asarray(mdct_sharded(x, win, mesh))
ref = np.asarray(zaftpu.mdct(x, win))
err = float(np.max(np.abs(got - ref)))
assert err <= 4e-6 * max(1.0, float(np.abs(ref).max())), err
print("ok", err)
""",
    "stft_sharded_nat": """
import os
os.environ["ZAFTPU_FFT"] = "native"
import numpy as np, jax, jax.numpy as jnp
import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.sharding import make_mesh, stft_sharded
mesh = make_mesh(1)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    44100).astype(np.float32))
win = hamming(2048).astype(np.float32)
got = stft_sharded(x, win, 1024, mesh)
ref = zaftpu.stft(x, win, 1024)
# plane fetches: complex device->host transfers UNIMPLEMENTED on this tunnel
err = float(max(np.abs(np.asarray(jnp.real(got)) - np.asarray(jnp.real(ref))).max(),
                np.abs(np.asarray(jnp.imag(got)) - np.asarray(jnp.imag(ref))).max()))
assert err <= 4e-6 * max(1.0, float(np.abs(ref).max())), err
print("ok", err)
""",
    "stft_sharded": """
import numpy as np, jax, jax.numpy as jnp
import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.sharding import make_mesh, stft_sharded
mesh = make_mesh(1)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    44100).astype(np.float32))
win = hamming(2048).astype(np.float32)
got = stft_sharded(x, win, 1024, mesh)
ref = zaftpu.stft(x, win, 1024)
# plane fetches: complex device->host transfers UNIMPLEMENTED on this tunnel
err = float(max(np.abs(np.asarray(jnp.real(got)) - np.asarray(jnp.real(ref))).max(),
                np.abs(np.asarray(jnp.imag(got)) - np.asarray(jnp.imag(ref))).max()))
assert err <= 4e-6 * max(1.0, float(np.abs(ref).max())), err
print("ok", err)
""",
}


HEALTH = """
import time, jax, jax.numpy as jnp
k = int(time.time()) % 977 + 8
x = jnp.ones((8, k))
assert float(jnp.pad(x, ((0, 1), (1, 0)))[:8, 1:].sum()) == 8.0 * k
print("healthy")
"""


def _run(code, timeout_s):
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True, env=dict(os.environ))
        ok = proc.returncode == 0
        tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
        return {"ok": ok, "tail": tail[-1][:200] if tail else ""}
    except subprocess.TimeoutExpired:
        return {"ok": False, "tail": f"timeout {timeout_s}s"}


def main():
    import time

    out = {"ok": True, "cases": {}}
    for name, code in CASES.items():
        # A fresh-compile health check before EVERY case: a degraded-tunnel
        # window (every new compile UNIMPLEMENTED) must show up as
        # 'skipped: tunnel down', never as a spurious construct rejection —
        # the ambiguity that muddied the round-3 fused_probe run.
        h = _run(HEALTH, 90)
        for _ in range(3):
            if h["ok"]:
                break
            time.sleep(60)
            h = _run(HEALTH, 90)
        if not h["ok"]:
            out["cases"][name] = {"ok": False, "tail": "skipped: tunnel down"}
            print(f"{name}: tunnel down, skipped", file=sys.stderr,
                  flush=True)
            continue
        out["cases"][name] = _run(code, 300)
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    # The stage succeeded if it produced verdicts (a failing construct IS
    # a result); only nothing-ran warrants a session retry.
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    out["stft_sharded_ok"] = out["cases"]["stft_sharded"]["ok"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
