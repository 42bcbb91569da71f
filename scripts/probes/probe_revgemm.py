import json, os, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import zaftpu
from zaftpu import pallas as _pallas
from zaftpu.core.fft import _direct_rdft_mats
from zaftpu.core.frame import stft_padding
from zaftpu.core.windows import hamming
from zaftpu.utils.profiling import timed

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("PROBE_SECONDS", "600"))
if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
hi = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(SR*SECS).astype(np.float32))
win = hamming(WL).astype(np.float32)
pf, pb, t = stft_padding(SR*SECS, WL, STEP)
cos_np, sin_np = map(np.asarray, _direct_rdft_mats(WL, "float32"))
R = np.eye(128, dtype=np.float32)[:, ::-1].copy()
# second-piece sign for im: position 0 (Nyquist) +1, rest -1
sgn2 = np.full(1024, -1.0, np.float32); sgn2[0] = 1.0

def frames_of(sig):
    padded = jnp.pad(sig, [(pf, pb)])
    return _pallas.windowed_frames(padded, win, WL, STEP, t)

def gemms(fr):
    re = jnp.matmul(fr, jnp.asarray(cos_np), precision=hi, preferred_element_type=jnp.float32)
    im = jnp.matmul(fr, jnp.asarray(sin_np), precision=hi, preferred_element_type=jnp.float32)
    return re, im

def rev1024(a):   # reverse a 1024-wide last axis: chunk flip + R128 GEMM
    # precision=HIGHEST is required for bit-exactness: at DEFAULT the MXU
    # truncates the data operand to bf16 before the permutation product.
    # (R's own bf16 split is exact — 1.0 -> (1,0,0) — so HIGHEST's 6-pass
    # reconstructs the f32 values exactly.)
    T = a.shape[0]
    c = a.reshape(T, 8, 128)[:, ::-1, :]
    r = jnp.matmul(c, jnp.asarray(R), precision=hi,
                   preferred_element_type=jnp.float32)
    return r.reshape(T, 1024)

@jax.jit
def v12_aligned(sig):
    re, im = gemms(frames_of(sig))
    # [0..1023] ++ rev([1..1024]) = [0..1023, 1024(nyq), 1023..1]
    re_f = jnp.concatenate([re[:, :1024], rev1024(re[:, 1:1025])], axis=-1)
    im2 = rev1024(im[:, 1:1025]) * jnp.asarray(sgn2)
    im_f = jnp.concatenate([im[:, :1024], im2], axis=-1)
    return jnp.swapaxes(jax.lax.complex(re_f, im_f), -1, -2)

def p_stft(sig): return zaftpu.stft(sig, win, STEP)

def T(fn):
    _, st = timed("p", fn, reps=3, dispatches=8, target_s=2.0, log=False)
    return st.seconds

RESULT = {"ok": True}
r = {"stft_ms": T(lambda: p_stft(x))*1e3,
     "v12_aligned_ms": T(lambda: v12_aligned(x))*1e3}
err = jax.jit(lambda s: jnp.max(jnp.abs(v12_aligned(s) - p_stft(s))))(x)
r["v12_err"] = float(jax.device_get(err))
RESULT.update({k: round(v,5) for k,v in r.items()})

# Quantify the N=1025 lane-padding waste: same GEMM at N=1024.
@jax.jit
def g1025(sig):
    fr = frames_of(sig)
    return jnp.matmul(fr, jnp.asarray(cos_np), precision=hi, preferred_element_type=jnp.float32)

@jax.jit
def g1024(sig):
    fr = frames_of(sig)
    return jnp.matmul(fr, jnp.asarray(cos_np[:, :1024].copy()), precision=hi, preferred_element_type=jnp.float32)

r2 = {"g1025_ms": T(lambda: g1025(x))*1e3, "g1024_ms": T(lambda: g1024(x))*1e3}
RESULT.update({k: round(v,5) for k,v in r2.items()})

# v13: ISTFT with the aligned rev-GEMM fold (chunk flip + R128 anti-identity
# GEMM instead of a lane gather).
from zaftpu.core.fft import _direct_ridft_half_mats
from zaftpu.core.frame import cola_gain
icos_np, isin_np = map(np.asarray, _direct_ridft_half_mats(WL, "float32"))
gain = float(cola_gain(np.asarray(win, np.float64), STEP))
half = WL // 2 + 1

@jax.jit
def v13_istft_revgemm(sp):
    zr = jnp.swapaxes(jnp.real(sp), -1, -2)   # (T, 2048)
    zi = jnp.swapaxes(jnp.imag(sp), -1, -2)
    hr = jnp.concatenate([zr[:, :1],
                          0.5 * (zr[:, 1:1025] + rev1024(zr[:, 1024:2048]))],
                         axis=-1)
    hi_ = jnp.concatenate([jnp.zeros_like(zi[:, :1]),
                           0.5 * (zi[:, 1:1025] - rev1024(zi[:, 1024:2048]))],
                          axis=-1)
    fr = (jnp.matmul(hr, jnp.asarray(icos_np), precision=hi, preferred_element_type=jnp.float32)
          - jnp.matmul(hi_, jnp.asarray(isin_np), precision=hi, preferred_element_type=jnp.float32))
    sig = _pallas.overlap_add(fr, STEP)
    edge = WL - STEP
    return sig[edge:sig.shape[-1]-edge] / jnp.float32(gain)

spec = p_stft(x)
def p_istft(sp): return zaftpu.istft(sp, win, STEP)
r3 = {"istft_ms": T(lambda: p_istft(spec))*1e3,
      "v13_istft_ms": T(lambda: v13_istft_revgemm(spec))*1e3}
ierr = jax.jit(lambda s: jnp.max(jnp.abs(v13_istft_revgemm(s) - p_istft(s))))(spec)
r3["v13_err"] = float(jax.device_get(ierr))
RESULT.update({k: round(v,6) for k,v in r3.items()})
print(json.dumps(RESULT))
