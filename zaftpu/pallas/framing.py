"""Pallas TPU kernel: fused frame extraction + windowing.

The analysis front end of STFT/MDCT turns a padded signal into overlapped
windowed frames. The XLA path (zaftpu.core.frame.extract_frames) assembles K
slice views and multiplies the window — two HBM passes over the frame matrix
when XLA doesn't fuse the concat into the consumer. This kernel produces
windowed frames in a single pass: each grid step DMAs its overlapping signal
segment (overlapping reads are why this needs a manual copy from ``ANY``
memory — BlockSpec tiles cannot overlap), then emits the K aligned sub-block
products from VMEM.

Requirements (checked by :func:`supported`): ``step % 128 == 0`` (lane
alignment), ``window_length % step == 0`` (the K-view decomposition), float32.
Callers fall back to the XLA path otherwise.

Layout contract: the signal is passed as ``(rows, step)`` with row r holding
samples ``[r*step, (r+1)*step)``; frame j is rows ``j..j+K-1`` scaled by the
window reshaped to ``(K, step)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_FRAMES = 256  # frames per grid step


def supported(window_length: int, step: int, dtype) -> bool:
    return (step % 128 == 0 and window_length % step == 0
            and dtype == jnp.float32)


def _read_rows(block: int, k: int) -> int:
    """DMA row count: block + k - 1 rounded up to the (8, 128) f32 tiling."""
    return block + -(-(k - 1) // 8) * 8


def _kernel(k: int, block: int, sig_ref, win_ref, out_ref, seg, sem):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, _read_rows(block, k)), :], seg, sem)
    copy.start()
    copy.wait()
    step = seg.shape[1]
    for j in range(k):
        out_ref[:, j * step:(j + 1) * step] = (
            seg[j:j + block, :] * win_ref[j, :])


@functools.partial(jax.jit, static_argnames=("window_length", "step",
                                             "number_times", "interpret"))
def frame_window(padded, window, window_length: int, step: int,
                 number_times: int, interpret: bool = False):
    """Windowed overlapped frames ``(number_times, window_length)`` of a
    padded 1-D signal, one HBM pass.

    ``padded`` must hold at least ``number_times*step + window_length - step``
    samples; surplus frames produced by block rounding are trimmed.
    """
    k = window_length // step
    block = min(BLOCK_FRAMES, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    # The last grid step DMAs _read_rows(block, k) rows from row
    # (t_pad - block); size the row grid so that read stays in bounds.
    rows = t_pad - block + _read_rows(block, k)
    need = rows * step
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    sig2d = padded.reshape(rows, step)
    win2d = window.reshape(k, step).astype(padded.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, k, block),
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, step), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, window_length), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, window_length), padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, win2d)
    return out[:number_times]
