"""Compute-dtype policy: the bf16 MXU fast path.

The framework's dtype rule is "follow the input" (f64 = CPU oracle, f32 =
TPU fast path). TPUs additionally run bf16 matmuls at 2-4x the f32 MXU rate
with native f32 accumulation, and the framework's heaviest compute is exactly
matmuls against precomputed operators: the fused time-domain CQT kernel
(2 x (T, 32768) x (32768, 144) per workload — reference workload
zaf.py:627-633), the mel filterbank product (zaf.py:369-373), and the MFCC
DCT-II matrix (zaf.py:445). FFTs stay in f32/f64 (complex bf16 does not
exist) — this policy only lowers the *operands of operator matmuls* to bf16
while keeping accumulation and all activations in f32.

Usage::

    with zaftpu.compute_dtype("bfloat16"):
        spec = zaftpu.cqtspectrogram(x_f32, sr, 25, kernel)  # bf16 MXU

or process-wide with ``ZAFTPU_DTYPE=bfloat16``. Accuracy vs f32 is gated in
tests/test_bf16.py at documented SNR thresholds.
"""

from __future__ import annotations

import contextlib
import os

import jax.numpy as jnp

_STATE: dict = {"override": None}
_ALIASES = {"bfloat16": "bfloat16", "bf16": "bfloat16",
            "float32": None, "f32": None, "none": None}


def matmul_dtype():
    """Current operator-matmul operand dtype, or None to follow the input.

    Resolution order: active :func:`compute_dtype` context, then the
    ``ZAFTPU_DTYPE`` env var, else None.
    """
    if _STATE["override"] is not None:
        return jnp.bfloat16 if _STATE["override"] == "bfloat16" else None
    env = os.environ.get("ZAFTPU_DTYPE", "").lower()
    if env in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return None


@contextlib.contextmanager
def compute_dtype(dtype):
    """Context manager selecting the MXU-operand dtype for operator matmuls.

    ``"bfloat16"``/``"bf16"`` enables the bf16 fast path; ``"float32"``/
    ``None`` restores input-following behavior (and overrides the env var
    within the context).
    """
    name = str(dtype).lower() if dtype is not None else "none"
    if name not in _ALIASES:
        raise ValueError(
            f"compute_dtype must be bfloat16/bf16 or float32/None, "
            f"got {dtype!r}")
    prev = _STATE["override"]
    _STATE["override"] = _ALIASES[name] or "float32-pin"
    try:
        yield
    finally:
        _STATE["override"] = prev


# Transforms the bf16 dial must NOT lower, because their roofline says bf16
# cannot pay: their operator matmuls are a rounding error next to the rfft
# that feeds them (MFCC's DCT-II is (T, 40) @ (40, 40); the mel filterbank
# product is (T, 1024) @ (1024, 40) with a 40-lane output — both far below
# MXU saturation), so lowering buys ~nothing and costs real accuracy in the
# log domain. Measured on v5e (docs/tpu_results/bf16.json): MFCC +1%
# throughput for 35.9 dB — ~100 dB of accuracy for noise-level speedup.
# Contrast the CQT, whose 32k-contraction operator GEMMs are
# bandwidth-bound on operand bytes: bf16 there is +98% at 55.6 dB and stays
# policy-controlled.
BF16_EXEMPT = frozenset({"mfcc", "melspectrogram"})


def operator_dtype(input_dtype, transform: str | None = None):
    """Dtype to store/upload a precomputed operator in, given the activation
    dtype: bf16 under the bf16 policy (f32 activations only — the f64 oracle
    path never lowers), else the activation dtype. ``transform`` names the
    consuming transform so the per-transform exemption table
    (:data:`BF16_EXEMPT`) can opt roofline-ineligible transforms out of the
    dial."""
    if transform in BF16_EXEMPT:
        return jnp.dtype(input_dtype)
    if matmul_dtype() is not None and jnp.dtype(input_dtype) == jnp.float32:
        return jnp.bfloat16
    return jnp.dtype(input_dtype)


def matmul_precision():
    """XLA precision for exact-path (non-bf16) operator matmuls.

    ``ZAFTPU_PRECISION``: ``highest`` (default — 6-pass bf16 decomposition,
    true f32 products), ``split4`` (manual 4-pass scheme, ~104 dB vs f64 at
    2/3 the MXU cost — see :func:`real_matmul`; non-GEMM sites fall back to
    HIGHEST), ``high`` (3 passes, ~f32 for audio-range data), or ``default``
    (XLA's single bf16 pass — only meaningful for A/B measurement, as it
    makes f32 matmuls bf16-accurate on TPU).
    """
    import jax

    env = os.environ.get("ZAFTPU_PRECISION", "highest").lower()
    table = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST,
             # Sites that cannot run the manual scheme (complex-operand
             # stages, conv formulations) keep full accuracy instead.
             "split4": jax.lax.Precision.HIGHEST}
    if env not in table:
        raise ValueError(
            f"ZAFTPU_PRECISION must be default/high/highest/split4, "
            f"got {env!r}")
    return table[env]


def split4_enabled() -> bool:
    """True when ``ZAFTPU_PRECISION=split4`` selects the manual 4-pass
    bf16-split GEMM for real f32 operator matmuls."""
    return os.environ.get("ZAFTPU_PRECISION", "highest").lower() == "split4"


def _split4_matmul(a, b):
    """``a @ b`` as four single-pass bf16 MXU GEMMs with f32 accumulation.

    Each f32 operand splits exactly into a bf16 pair ``x = hi + lo + eps``
    (``hi = bf16(x)``, ``lo = bf16(x - hi)``, ``|eps| ~ 2^-17 |x|``); the
    product expands to four bf16 x bf16 terms, ALL kept — XLA's
    ``Precision.HIGH`` is the same idea but drops ``lo @ lo``, which is what
    caps it at ~95 dB (measured 94.9 dB round trip, just under the 96 dB
    16-bit-audio gate; docs/tpu_results/stft_engines.json). Keeping the
    fourth term leaves only the ``eps`` truncation: ~104 dB predicted, at 4
    MXU passes vs HIGHEST's 6 (1.5x GEMM throughput). Terms accumulate
    smallest-first in f32.
    """
    import jax

    if jax.default_backend() == "tpu":
        def mm(x, y):
            return jnp.matmul(x, y, preferred_element_type=jnp.float32)
    else:
        # CPU XLA has no BF16 x BF16 -> F32 dot thunk; the bf16 -> f32 casts
        # are exact, so an f32 dot of the rounded operands computes the same
        # products the MXU single pass would.
        def mm(x, y):
            return jnp.matmul(x.astype(jnp.float32), y.astype(jnp.float32))
    return _split4_contract(a, b, mm)


def _bf16_split(x):
    """Exact bf16 pair ``(hi, lo)`` with ``x = hi + lo + eps``,
    ``|eps| ~ 2^-17 |x|``. MUST go through ``lax.reduce_precision``: a plain
    f32->bf16->f32 cast round trip is elided by XLA's excess-precision rule
    on TPU, which zeroes the lo terms and silently collapses the split
    scheme to one bf16 pass (measured 52.6 dB vs 109.2 dB with
    reduce_precision on the v5e chip)."""
    import jax

    hf = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    return hf.astype(jnp.bfloat16), (x - hf).astype(jnp.bfloat16)


def _split4_contract(a, b, mm):
    """The four-pass bf16-split contraction over any GEMM-shaped ``mm``,
    terms accumulated smallest-first in f32."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)


def real_matmul(a, b, bandwidth_bound=False):
    """Real-operand exact-path GEMM honoring the precision dial.

    Under ``ZAFTPU_PRECISION=split4`` (f32 operands only — the f64 oracle
    path never lowers) runs :func:`_split4_matmul`; otherwise a plain matmul
    at :func:`matmul_precision`. ``bandwidth_bound=True`` marks GEMMs whose
    cost is HBM traffic, not MXU passes (tiny output width, huge
    contraction — the CQT's hop-width slab GEMMs at F=144): for those the
    split's extra operand materialization only adds bytes, so the dial
    keeps HIGHEST (measured: CQT 886k fr/s HIGHEST vs 729k under split4,
    docs/tpu_results/suite.json 2026-08-17).
    """
    # Narrow outputs are bandwidth-bound regardless of the caller's flag:
    # the split streams the wide activation from HBM four times while the
    # MXU is nowhere near saturated at N < 256 (the measured CQT case is
    # N=144; the mel filterbank is N=40, the MFCC DCT N=20). The hot GEMMs
    # split4 exists for are N >= 1024 (DFT/MDCT operators).
    if (split4_enabled() and not bandwidth_bound
            and b.shape[-1] >= 256
            and a.dtype == jnp.float32
            and jnp.dtype(b.dtype) == jnp.float32):
        return _split4_matmul(a, b)
    return jnp.matmul(a, b, preferred_element_type=a.dtype,
                      precision=matmul_precision())


def real_matmul_tn(a, b):
    """``einsum('...kt,kn->...tn', a, b)`` honoring the precision dial — the
    transposed-LHS twin of :func:`real_matmul` (contraction over the leading
    axis of both operands, so a bins-major fold output feeds the MXU without
    a materialized transpose — see :func:`zaftpu.core.fft.direct_real_ifft_t`).
    """
    import jax

    def mm_hi(x, y):
        return jnp.einsum("...kt,kn->...tn", x, y,
                          preferred_element_type=x.dtype,
                          precision=matmul_precision())

    if (split4_enabled() and b.shape[-1] >= 256
            and a.dtype == jnp.float32
            and jnp.dtype(b.dtype) == jnp.float32):
        if jax.default_backend() == "tpu":
            def mm(x, y):
                return jnp.einsum("...kt,kn->...tn", x, y,
                                  preferred_element_type=jnp.float32)
        else:
            def mm(x, y):
                return jnp.einsum("...kt,kn->...tn", x.astype(jnp.float32),
                                  y.astype(jnp.float32))
        return _split4_contract(a, b, mm)
    return mm_hi(a, jnp.asarray(b).astype(a.dtype))


def mxu_matmul(a, b, bandwidth_bound=False):
    """``a @ b`` against a precomputed operator ``b`` with TPU mixed
    precision: a bf16 operator lowers ``a`` to bf16 for the MXU (one systolic
    pass, f32 accumulation); any other operator dtype is promoted to ``a``'s
    dtype and computed at ``Precision.HIGHEST`` (or the split4 scheme under
    that dial — ``bandwidth_bound=True`` opts a traffic-bound GEMM out, see
    :func:`real_matmul`).

    The explicit ``HIGHEST`` matters: XLA's *default* matmul precision on TPU
    truncates f32 operands to bf16 (a single MXU pass) — bit-identical to the
    explicit bf16 path, which would make the framework's "f32" operator
    matmuls silently bf16-accurate and the bf16/f32 A/B meaningless (observed
    on hardware 2026-08-17: SNR(bf16 vs f32) = inf). ``HIGHEST`` selects the
    6-pass bf16 decomposition that recovers true f32 products, so the dtype
    dial is honest: f64 = oracle, f32 = accurate fast path, bf16 = max MXU
    rate at documented SNR.
    """
    import jax

    if b.dtype == jnp.bfloat16:
        a16 = a.astype(jnp.bfloat16)
        if jax.default_backend() == "tpu":
            acc = jnp.matmul(a16, b, preferred_element_type=jnp.float32)
        else:
            # CPU XLA has no BF16 x BF16 -> F32 dot thunk (it surfaces as
            # UNIMPLEMENTED inside shard_map). Emulate: the bf16 -> f32
            # casts are exact, so an f32 dot of the rounded operands
            # computes the same products the MXU would, accumulated in f32.
            acc = jnp.matmul(a16.astype(jnp.float32),
                             b.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        out = jnp.float32 if a.dtype == jnp.bfloat16 else a.dtype
        return acc.astype(out)
    if not jnp.issubdtype(a.dtype, jnp.complexfloating):
        return real_matmul(a, jnp.asarray(b).astype(a.dtype),
                           bandwidth_bound=bandwidth_bound)
    return jnp.matmul(a, b.astype(a.dtype), preferred_element_type=a.dtype,
                      precision=matmul_precision())
