"""Pallas TPU kernel: fused overlap-add (COLA / TDAC synthesis back end).

The XLA path (zaftpu.core.frame.overlap_add) accumulates K shifted block
views — K read-modify-write passes over the output. This kernel computes each
output row as the sum of its K contributing frame chunks in VMEM and writes
it exactly once.

Indexing: with frames reshaped ``(T, K, step)`` (frame j's chunk c covers
samples ``[(j+c)*step, (j+c+1)*step)``), output row r of the ``(T+K-1,
step)`` block grid is ``sum_c frames[r-c, c]``. The host pads ``K-1`` zero
frames on top so every grid step reads a full ``(block+K-1, K, step)``
segment with no boundary masking; overlapping reads again require a manual
DMA from ``ANY`` memory.

Same alignment requirements as the framing kernel (:func:`supported` in
zaftpu.pallas.framing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256  # output rows (of `step` samples) per grid step


def _read_rows(block: int, k: int) -> int:
    """DMA row count: block + k - 1 rounded up to the (8, 128) f32 tiling."""
    return block + -(-(k - 1) // 8) * 8


def _kernel(k: int, block: int, frames_ref, out_ref, seg, sem):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        frames_ref.at[pl.ds(i * block, _read_rows(block, k)), :, :], seg, sem)
    copy.start()
    copy.wait()
    # out row r (local) = sum_c seg[r + (K-1) - c, c]
    acc = seg[k - 1:k - 1 + block, 0, :]
    for c in range(1, k):
        acc = acc + seg[k - 1 - c:k - 1 - c + block, c, :]
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("step", "interpret"))
def overlap_add(frames, step: int, interpret: bool = False):
    """Overlap-add ``(T, WL)`` frames at hop ``step`` in one output pass.

    Returns ``(T*step + WL - step,)`` — identical values to
    ``zaftpu.core.frame.overlap_add``.
    """
    t, wl = frames.shape
    k = wl // step
    out_rows = t + k - 1
    block = min(BLOCK_ROWS, -(-out_rows // 8) * 8)
    rows_pad = block * (-(-out_rows // block))
    # (T, K, step) with K-1 zero frames on top, plus tail padding so the last
    # grid step's tiling-aligned DMA read stays in bounds.
    total_rows = rows_pad - block + _read_rows(block, k)
    chunks = frames.reshape(t, k, step)
    chunks = jnp.pad(chunks, ((k - 1, total_rows - t - (k - 1)),
                              (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, k, block),
        grid=(rows_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, step), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, step), frames.dtype),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), k, step), frames.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(chunks)
    return out[:out_rows].reshape(-1)[: t * step + wl - step]
