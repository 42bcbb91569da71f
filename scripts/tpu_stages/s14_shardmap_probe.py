"""Stage 14: bisect the shard_map UNIMPLEMENTED failure on the real chip.

Round 3's s13 (sharded transforms on a 1-device TPU mesh) failed every case
with ``UNIMPLEMENTED: TPU backend error`` while the fresh-compile probe
passed immediately before and after — a genuine lowering rejection by the
tunnel's compiler service, not a wedge. This ladder isolates which manual-
sharding construct breaks, each case in its own subprocess (a failed compile
poisons later fetches in the same process):

  jit_io_sharding   jit with NamedSharding on inputs/outputs (no shard_map)
  shmap_identity    shard_map(x * 2) over a 1-device mesh
  shmap_psum        + a psum collective
  shmap_ppermute    + the masked ppermute ring (what the halo layer uses)
  shmap_dot         + an MXU dot inside shard_map
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
    "stft_sharded": """
import numpy as np, jax, jax.numpy as jnp
import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.sharding import make_mesh, stft_sharded
mesh = make_mesh(1)
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    44100).astype(np.float32))
win = hamming(2048).astype(np.float32)
got = np.asarray(stft_sharded(x, win, 1024, mesh))
ref = np.asarray(zaftpu.stft(x, win, 1024))
err = float(np.max(np.abs(got - ref)))
assert err <= 4e-6 * max(1.0, float(np.abs(ref).max())), err
print("ok", err)
""",
}


def main():
    out = {"ok": True, "cases": {}}
    for name, code in CASES.items():
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=300,
                capture_output=True, text=True, env=dict(os.environ))
            ok = proc.returncode == 0
            tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
            out["cases"][name] = {"ok": ok,
                                  "tail": tail[-1][:200] if tail else ""}
        except subprocess.TimeoutExpired:
            out["cases"][name] = {"ok": False, "tail": "timeout 300s"}
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    # The stage succeeded if it produced verdicts (a failing construct IS
    # a result); only nothing-ran warrants a session retry.
    out["ok"] = any(c["ok"] for c in out["cases"].values())
    out["stft_sharded_ok"] = out["cases"]["stft_sharded"]["ok"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
