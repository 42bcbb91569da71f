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


def operator_dtype(input_dtype):
    """Dtype to store/upload a precomputed operator in, given the activation
    dtype: bf16 under the bf16 policy (f32 activations only — the f64 oracle
    path never lowers), else the activation dtype."""
    if matmul_dtype() is not None and jnp.dtype(input_dtype) == jnp.float32:
        return jnp.bfloat16
    return jnp.dtype(input_dtype)


def matmul_precision():
    """XLA precision for exact-path (non-bf16) operator matmuls.

    ``ZAFTPU_PRECISION``: ``highest`` (default — 6-pass bf16 decomposition,
    true f32 products), ``high`` (3 passes, ~f32 for audio-range data), or
    ``default`` (XLA's single bf16 pass — only meaningful for A/B
    measurement, as it makes f32 matmuls bf16-accurate on TPU).
    """
    import jax

    env = os.environ.get("ZAFTPU_PRECISION", "highest").lower()
    table = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}
    if env not in table:
        raise ValueError(
            f"ZAFTPU_PRECISION must be default/high/highest, got {env!r}")
    return table[env]


def mxu_matmul(a, b):
    """``a @ b`` against a precomputed operator ``b`` with TPU mixed
    precision: a bf16 operator lowers ``a`` to bf16 for the MXU (one systolic
    pass, f32 accumulation); any other operator dtype is promoted to ``a``'s
    dtype and computed at ``Precision.HIGHEST``.

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
    return jnp.matmul(a, b.astype(a.dtype), preferred_element_type=a.dtype,
                      precision=matmul_precision())
