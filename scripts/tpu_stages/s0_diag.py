"""Stage 0: pinpoint which tunnel operations fail (cheap, <60 s each).

Observed 2026-08-17: CQT/MFCC stages (real outputs) succeed while every
STFT-touching stage dies with UNIMPLEMENTED at the first device fetch, with
in-process retries exhausted. This stage isolates the failing primitive by
running each candidate in its own subprocess (so one poisoned op cannot
corrupt the next probe): real rfft, complex fft compute with real fetch,
complex scalar fetch, full-spectrum stft fetch, mdct. Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys

PROBE = "ZAFTPU_DIAG_PROBE"

CASES = {
    # NB: every compute case jits over a *runtime argument* — a constant
    # input lets XLA fold the whole program at compile time, making the case
    # vacuous (that bug hid the complex-forward-FFT failure on 2026-08-17).
    "real_rfft": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda v: jnp.abs(jnp.fft.rfft(v, axis=-1)))(x)
print(float(y.reshape(-1)[-1]))
""",
    "fft_of_real_input": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))(x)
s = y.reshape(-1)[-1]
print(float(jax.device_get(jnp.real(s) + jnp.imag(s))))
""",
    "fft_of_complex_input": """
import jax, jax.numpy as jnp, numpy as np
a = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda p, q: jnp.fft.fft(jax.lax.complex(p, q), axis=-1))(a, b)
s = y.reshape(-1)[-1]
print(float(jax.device_get(jnp.real(s) + jnp.imag(s))))
""",
    "ifft_of_complex_input": """
import jax, jax.numpy as jnp, numpy as np
a = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
b = jnp.asarray(np.random.default_rng(1).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda p, q: jnp.fft.ifft(jax.lax.complex(p, q), axis=-1))(a, b)
s = y.reshape(-1)[-1]
print(float(jax.device_get(jnp.real(s) + jnp.imag(s))))
""",
    "complex_scalar_fetch": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))(x)
print(complex(jax.device_get(y.reshape(-1)[-1])))
""",
    "complex_array_fetch": """
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 2048)).astype(np.float32))
y = jax.jit(lambda v: jnp.fft.fft(v, axis=-1))(x)
print(jax.device_get(y).shape)
""",
    "stft_fetch": """
import numpy as np, jax
import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.utils.profiling import fetch_sync
x = np.random.default_rng(0).standard_normal(44100).astype(np.float32)
spec = zaftpu.stft(jax.numpy.asarray(x), hamming(2048).astype(np.float32), 1024)
print(fetch_sync(spec))
""",
    "mdct_fetch": """
import numpy as np, jax
import zaftpu
from zaftpu.core.windows import vorbis
from zaftpu.utils.profiling import fetch_sync
x = np.random.default_rng(0).standard_normal(44100).astype(np.float32)
m = zaftpu.mdct(jax.numpy.asarray(x), vorbis(2048).astype(np.float32))
print(fetch_sync(m))
""",
    "mdct_fetch_via_ifft": """
import os
os.environ["ZAFTPU_CFFT"] = "ifft"
import numpy as np, jax
import zaftpu
from zaftpu.core.windows import vorbis
from zaftpu.utils.profiling import fetch_sync
x = np.random.default_rng(0).standard_normal(44100).astype(np.float32)
m = zaftpu.mdct(jax.numpy.asarray(x), vorbis(2048).astype(np.float32))
print(fetch_sync(m))
""",
}


# The raw complex-transfer and native-FFT cases document tunnel state
# (complex buffers are rejected outright; native-FFT compiles are slow /
# transient — the default ZAFTPU_FFT=auto dispatch uses the matmul engine on
# TPU and depends on neither). Their behavior is pinned in the committed
# diag.json history; rerunning them cost ~12 min of every session's best
# tunnel minutes, so the default run covers only the framework-path gating
# cases. Set ZAFTPU_DIAG_FULL=1 to re-probe everything.
INFORMATIONAL = {"complex_scalar_fetch", "complex_array_fetch",
                 "real_rfft", "fft_of_real_input",
                 "fft_of_complex_input", "ifft_of_complex_input"}


def main():
    full = os.environ.get("ZAFTPU_DIAG_FULL") == "1"
    out = {"ok": True, "cases": {}}
    for name, code in CASES.items():
        if not full and name in INFORMATIONAL:
            continue
        # 300 s: a cold framework compile through the tunnel can exceed
        # 120 s without being wedged; successful compiles stick server-side.
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=300,
                capture_output=True, text=True, env=dict(os.environ))
            ok = proc.returncode == 0
            tail = (proc.stdout if ok else proc.stderr).strip().splitlines()
            out["cases"][name] = {"ok": ok,
                                  "tail": tail[-1][:160] if tail else ""}
        except subprocess.TimeoutExpired:
            out["cases"][name] = {"ok": False, "tail": "timeout 300s"}
        print(f"{name}: {out['cases'][name]}", file=sys.stderr, flush=True)
    out["ok"] = all(c["ok"] for n, c in out["cases"].items()
                    if n not in INFORMATIONAL)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
