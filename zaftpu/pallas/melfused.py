"""Pallas TPU kernel: the whole mel front-end in one pass.

``melspectrogram`` / ``mfcc`` currently run the fused analysis kernel
(framing + window + one DFT GEMM per component, two pallas_calls writing
two ``(T, F_pad)`` half-spectrum planes to HBM), then XLA reads both planes
back to form the magnitude and run the tiny filterbank GEMM. This kernel
does the entire chain in ONE pallas_call — framing, BOTH component dots,
magnitude (or power), and the ``(WL/2, n_mels)`` filterbank GEMM — writing
only the ``(T, n_mels)`` mel rows: ~18 KB/frame of half-spectrum HBM
round-trip disappears behind a 160-byte output row.

Why this works where the two-output spectrum kernel (ZAFTPU_FUSED2) did
not: that kernel's failure was XLA staging its two FULL-SIZE outputs
around the custom call ("Ran out of memory in vmem while allocating on
stack for %_frames_matmul2_impl = (f32[25856,1152], f32[25856,1152])",
docs/tpu_results/round5_fused2.json) — here the output is two orders of
magnitude smaller, and the ~19 MB stacked operator itself was already
proven to fit the raised 24576 KiB budget standalone.

Semantics (reference zaf.py:368-375 / 435-449): magnitude spectrogram over
bins ``1..WL/2`` (DC dropped, Nyquist kept) times the mel filterbank; MFCC
uses the POWER spectrogram. The in-kernel magnitude is ``sqrt(re^2 +
im^2)`` — XLA's complex ``abs`` may use an overflow-guarded formulation
that rounds differently at ulp level, so parity vs the split path is
gated at f32 scale tolerances (audio magnitudes are nowhere near the
overflow regime); the power path needs no sqrt at all. The filterbank dot
runs at HIGHEST in BOTH precision modes (policy.BF16_EXEMPT: mel/mfcc
operator GEMMs never lower — the 40-lane output is a rounding error of
the runtime, and split4's operand splitting would only add bytes).

Same dispatch rules as the analysis kernel plus the raised-budget
requirement in both precision modes (the stacked two-component operator).
"""

from __future__ import annotations

import functools
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zaftpu.pallas.framing import _read_rows
from zaftpu.pallas.fused import (BLOCK_FRAMES, _bf16_split_host,
                                 _block_frames, _f_pad, _frame_block,
                                 _rdft_ops_padded)


def enabled() -> bool:
    """``ZAFTPU_MELFUSE``: ``auto`` (default — on when running on a real
    TPU backend) / ``1`` (force, interpret tests) / ``0`` (disable, the
    A/B lever)."""
    env = os.environ.get("ZAFTPU_MELFUSE", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def wants_budget() -> bool:
    """The stacked two-component DFT operator (~19 MB at WL=2048) needs the
    raised scoped-VMEM twin in BOTH precision modes."""
    from zaftpu import pallas as _pallas

    return enabled() and _pallas.enabled()


# Stacked-operator bound, as in pallas/synth.py: geometries whose operator
# cannot fit the raised budget fall back to the split path instead of
# OOMing and poisoning the Pallas health latch.
_MAX_OP_BYTES = 20 * 2**20


def kernel_wanted(window_length: int, step: int, dtype, ndim: int) -> bool:
    from zaftpu import pallas as _pallas
    from zaftpu.core.dispatch import budget_raised
    from zaftpu.core.policy import split4_enabled
    from zaftpu.pallas import fused as _fused

    if not (_pallas.enabled() and enabled() and ndim == 1):
        return False
    if split4_enabled() and os.environ.get("ZAFTPU_MELFUSE") != "1":
        # Measured policy (round5_melfused.json, v5e 600-s): the kernel
        # wins at HIGHEST (+15%, 3.07M vs 2.67M fr/s, relerr 1.8e-7) but
        # its split4 variant's extra in-kernel live values (the bf16
        # splits and four partial products per component) tip the ~19 MB
        # stacked operator over the 24576 KiB scoped stack ("Ran out of
        # memory in vmem ... %_mel_rows_impl"), and the split4 SPLIT path
        # is already the fastest mel at 3.60M — nothing to win there.
        return False
    if not _fused.supported(window_length, step, dtype):
        return False
    f_pad = _f_pad(window_length // 2 + 1)
    if 2 * window_length * f_pad * 4 > _MAX_OP_BYTES:
        return False
    if jax.default_backend() == "tpu" and not budget_raised():
        return os.environ.get("ZAFTPU_MELFUSE") == "1"
    return True


@lru_cache(maxsize=8)
def _split_rdft_ops(n: int):
    """Host-presplit bf16 (hi, lo) stack of the rdft operator pair —
    ``(2, 2, N, F_pad)`` (the pallas/fused split4 layout)."""
    import ml_dtypes

    ops = _rdft_ops_padded(n)
    out = np.zeros((2, 2) + ops.shape[1:], ml_dtypes.bfloat16)
    for c in range(2):
        hi, lo = _bf16_split_host(ops[c])
        out[c, 0] = hi.astype(ml_dtypes.bfloat16)
        out[c, 1] = lo.astype(ml_dtypes.bfloat16)
    return out


def _mel_pad(n_mels: int) -> int:
    return -(-n_mels // 128) * 128


def _kernel(k: int, block: int, precision, power: bool, half: int,
            sig_ref, win_ref, op_ref, fb_ref, out_ref, seg, frames, sem):
    """Exact path: framing -> two component dots -> magnitude/power over
    bins 1..WL/2 -> filterbank dot (HIGHEST)."""
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)

    def dot(op, precision_):
        return jax.lax.dot_general(
            frames[:, :], op,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision_, preferred_element_type=jnp.float32)

    re = dot(op_ref[0], precision)
    im = dot(op_ref[1], precision)
    _epilogue(re, im, power, half, fb_ref, out_ref)


def _kernel_split4(k: int, block: int, use_reduce_precision: bool,
                   power: bool, half: int, sig_ref, win_ref, op_ref,
                   fb_ref, out_ref, seg, frames, sem):
    """split4 twin: frames split once, both components' 4-pass dots, same
    epilogue (the filterbank dot stays HIGHEST — BF16_EXEMPT)."""
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)
    fr = frames[:, :]
    if use_reduce_precision:
        hi = jax.lax.reduce_precision(fr, exponent_bits=8, mantissa_bits=7)
        ah = hi.astype(jnp.bfloat16)
        al = (fr - hi).astype(jnp.bfloat16)
    else:
        ah = fr.astype(jnp.bfloat16)
        al = (fr - ah.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def comp(c):
        bh, bl = op_ref[c, 0], op_ref[c, 1]
        return ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)

    _epilogue(comp(0), comp(1), power, half, fb_ref, out_ref)


def _epilogue(re, im, power: bool, half: int, fb_ref, out_ref):
    """Magnitude/power over bins 1..WL/2 (DC dropped, Nyquist kept —
    zaf.py:370), then the mel filterbank dot at HIGHEST."""
    mag2 = re[:, 1:half] * re[:, 1:half] + im[:, 1:half] * im[:, 1:half]
    spec = mag2 if power else jnp.sqrt(mag2)
    out_ref[:, :] = jax.lax.dot_general(
        spec, fb_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _kernel_spec(k: int, block: int, precision, half: int, sig_ref,
                 win_ref, op_ref, out_ref, seg, frames, sem):
    """Spectrogram variant: write ``|X|`` over bins 1..WL/2 directly —
    the reference's universal analysis slice (zaf.py:370) without the
    half-spectrum plane round trip."""
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)

    def dot(op):
        return jax.lax.dot_general(
            frames[:, :], op,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    re = dot(op_ref[0])
    im = dot(op_ref[1])
    out_ref[:, :] = jnp.sqrt(re[:, 1:half] * re[:, 1:half]
                             + im[:, 1:half] * im[:, 1:half])


def _spec_rows_impl(padded, window, ops, window_length: int, step: int,
                    number_times: int, precision,
                    block_frames: int = BLOCK_FRAMES,
                    interpret: bool = False):
    """``(T, WL/2)`` magnitude-spectrogram rows in one HBM pass (exact
    scheme only — the split4 gate in :func:`kernel_wanted` applies)."""
    k = window_length // step
    half = window_length // 2 + 1
    block = min(block_frames, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    rows = t_pad - block + _read_rows(block, k)
    need = rows * step
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    sig2d = padded.reshape(rows, step)
    win2d = window.reshape(k, step).astype(padded.dtype)
    f_pad = ops.shape[-1]

    out = pl.pallas_call(
        functools.partial(_kernel_spec, k, block, precision, half),
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, step), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, window_length, f_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, half - 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, half - 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
            pltpu.VMEM((block, window_length), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, win2d, ops)
    return out[:number_times]


spec_rows_jit = jax.jit(
    _spec_rows_impl,
    static_argnames=("window_length", "step", "number_times", "precision",
                     "block_frames", "interpret"))


def spec_rows(padded, window, window_length: int, step: int,
              number_times: int, interpret: bool = False):
    """Fused magnitude spectrogram front: ``(T, WL/2)`` rows over bins
    ``1..WL/2`` (zaf.py:370 slice semantics). Exact scheme only — callers
    gate with :func:`kernel_wanted`."""
    from zaftpu.core.policy import matmul_precision
    from zaftpu.utils.devcache import pinned_device_constant

    ops = pinned_device_constant(_rdft_ops_padded(window_length),
                                 np.float32)
    return spec_rows_jit(padded, window, ops, window_length, step,
                         number_times, matmul_precision(),
                         block_frames=_block_frames(), interpret=interpret)


def _mel_rows_impl(padded, window, ops, fbank_pad, window_length: int,
                   step: int, number_times: int, precision, power: bool,
                   block_frames: int = BLOCK_FRAMES,
                   interpret: bool = False):
    """``(T, mel_pad)`` mel (or mel-power) rows in one HBM pass over the
    signal. ``fbank_pad``: ``(WL/2, mel_pad)`` f32 filterbank (bins-major,
    zero-padded mel columns)."""
    k = window_length // step
    half = window_length // 2 + 1
    block = min(block_frames, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    rows = t_pad - block + _read_rows(block, k)
    need = rows * step
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    sig2d = padded.reshape(rows, step)
    win2d = window.reshape(k, step).astype(padded.dtype)
    split4 = precision == "split4"
    f_pad = ops.shape[-1]
    mel_pad = fbank_pad.shape[-1]

    if split4:
        kern = functools.partial(_kernel_split4, k, block, interpret,
                                 power, half)
        op_spec = pl.BlockSpec((2, 2, window_length, f_pad),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel, k, block, precision, power, half)
        op_spec = pl.BlockSpec((2, window_length, f_pad),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, step), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            op_spec,
            pl.BlockSpec((half - 1, mel_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, mel_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, mel_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
            pltpu.VMEM((block, window_length), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, win2d, ops, fbank_pad)
    return out[:number_times]


mel_rows_jit = jax.jit(
    _mel_rows_impl,
    static_argnames=("window_length", "step", "number_times", "precision",
                     "power", "block_frames", "interpret"))


def mel_rows(padded, window, fbank_t, window_length: int, step: int,
             number_times: int, power: bool, interpret: bool = False):
    """Fused mel front-end: ``(T, n_mels)`` magnitude-mel (``power=False``,
    melspectrogram) or power-mel (``power=True``, the MFCC front) rows.
    ``fbank_t``: the ``(WL/2, n_mels)`` f32 filterbank transpose (the same
    device operator the split path matmuls against)."""
    from zaftpu.core.policy import matmul_precision, split4_enabled
    from zaftpu.utils.devcache import pinned_device_constant

    n_mels = fbank_t.shape[-1]
    mp = _mel_pad(n_mels)
    if mp != n_mels:
        fbank_t = jnp.pad(fbank_t, ((0, 0), (0, mp - n_mels)))
    if split4_enabled():
        ops = pinned_device_constant(_split_rdft_ops(window_length),
                                     jnp.bfloat16)
        precision = "split4"
    else:
        ops = pinned_device_constant(_rdft_ops_padded(window_length),
                                     np.float32)
        precision = matmul_precision()
    out = mel_rows_jit(padded, window, ops, fbank_t, window_length, step,
                       number_times, precision, power,
                       block_frames=_block_frames(), interpret=interpret)
    return out[:, :n_mels]
