"""Pallas TPU kernel: fused framing + windowing + DFT-as-GEMM analysis.

The direct-GEMM STFT path (``ZAFTPU_FFT=auto`` on TPU) is HBM-bound, and its
dominant traffic is the ``(T, WL)`` windowed-frame matrix: the framing kernel
writes it and the DFT GEMM immediately reads it back — at 50% overlap that is
2x the signal size in each direction, more than the spectrum output itself.
This kernel never materializes frames in HBM: each grid step DMAs its
overlapping signal segment into VMEM, forms the windowed frames in a VMEM
scratch, and feeds the MXU directly, writing only the spectra.

Grid layout ``(C, T_blocks)`` with the operator component c (cos / sin for
the rfft) on the *outer* axis: Pallas keeps the ``(WL, F_pad)`` operator
block resident in VMEM across all inner frame-block steps, so each ~8 MB
operator is fetched from HBM once per sweep and the signal is read C times
(tiny next to the frame matrix it replaces).

Same eligibility rules as the framing kernel (``step % 128 == 0``,
``WL % step == 0``, float32, 1-D) plus the direct-engine size gate; callers
fall back to the split framing-then-GEMM path otherwise. Reference workload:
the STFT analysis chain zaf.py:94-141.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zaftpu.pallas.framing import _read_rows

BLOCK_FRAMES = 128  # frames per grid step (VMEM budget: ~9 MB operator
                    # block + ~1 MB frames scratch + segment + output)


def supported(window_length: int, step: int, dtype) -> bool:
    return (step % 128 == 0 and window_length % step == 0
            and dtype == jnp.float32)


def _f_pad(f: int) -> int:
    """Pad the operator column count to the 128-lane tiling."""
    return -(-f // 128) * 128


@lru_cache(maxsize=8)
def _rdft_ops_padded(n: int):
    """Stacked ``(2, N, F_pad)`` cos/sin rfft operator, float32, zero-padded
    columns. Same float64 host math as core.fft._direct_rdft_mats so the
    fused path is value-compatible with the split direct-GEMM path."""
    from zaftpu.core.fft import _direct_rdft_mats

    cos_m, sin_m = _direct_rdft_mats(n, "float32")
    f = cos_m.shape[1]
    fp = _f_pad(f)
    ops = np.zeros((2, n, fp), np.float32)
    ops[0, :, :f] = cos_m
    ops[1, :, :f] = sin_m
    return ops


def _kernel(k: int, block: int, precision, sig_ref, win_ref, op_ref,
            out_ref, seg, frames, sem):
    i = pl.program_id(1)
    copy = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, _read_rows(block, k)), :], seg, sem)
    copy.start()
    copy.wait()
    step = seg.shape[1]
    for c in range(k):
        frames[:, c * step:(c + 1) * step] = seg[c:c + block, :] * win_ref[c, :]
    out_ref[0, :, :] = jax.lax.dot_general(
        frames[:, :], op_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("window_length", "step",
                                             "number_times", "precision",
                                             "interpret"))
def frames_matmul(padded, window, ops, window_length: int, step: int,
                  number_times: int, precision, interpret: bool = False):
    """``windowed_frames(padded) @ ops[c]`` for each stacked operator
    component, without materializing the frames in HBM.

    Returns ``(C, number_times, F_pad)`` float32; callers slice the valid
    ``F`` columns. ``ops`` is ``(C, window_length, F_pad)``.
    """
    k = window_length // step
    block = min(BLOCK_FRAMES, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    rows = t_pad - block + _read_rows(block, k)
    need = rows * step
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    sig2d = padded.reshape(rows, step)
    win2d = window.reshape(k, step).astype(padded.dtype)
    n_comp, _, f_pad = ops.shape

    out = pl.pallas_call(
        functools.partial(_kernel, k, block, precision),
        grid=(n_comp, t_pad // block),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, step), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window_length, f_pad), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, f_pad), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_comp, t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
            pltpu.VMEM((block, window_length), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, win2d, ops)
    return out[:, :number_times, :]


def frames_rfft(padded, window, window_length: int, step: int,
                number_times: int, interpret: bool = False):
    """Fused windowed-frames rfft: ``(T, WL//2+1)`` complex64 half-spectrum
    in a single HBM pass over the signal (no frame materialization)."""
    from zaftpu.core.policy import matmul_precision
    from zaftpu.utils.devcache import pinned_device_constant

    f = window_length // 2 + 1
    ops = pinned_device_constant(_rdft_ops_padded(window_length), np.float32)
    out = frames_matmul(padded, window, ops, window_length, step,
                        number_times, matmul_precision(),
                        interpret=interpret)
    return jax.lax.complex(out[0, :, :f], out[1, :, :f])

