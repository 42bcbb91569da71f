"""Pallas TPU kernel: fused overlap-add (COLA / TDAC synthesis back end).

The XLA path (zaftpu.core.frame.overlap_add) sums K padded chunk views —
one output write pass, but K reads of the frame matrix from HBM. This
kernel computes each output row as the sum of its K contributing frame
chunks in VMEM and writes it exactly once.

Indexing: with frames reshaped ``(T, K, step)`` (frame j's chunk c covers
samples ``[(j+c)*step, (j+c+1)*step)``), output row r of the ``(T+K-1,
step)`` block grid is ``sum_c frames[r-c, c]``. Out-of-range chunk rows
(the first K-1 output rows' missing contributions, and the tail the
block-rounding over-reads) are handled IN-KERNEL: the edge grid steps zero
their VMEM segment and DMA only the in-bounds rows — every plan is static
at trace time, so the edges are a handful of ``pl.when`` branches. The
round-3 version instead host-padded the chunk array, which cost a full
extra HBM pass over the frames (measured 1.41 ms of the 2.33 ms total at
10-min STFT scale; the in-kernel version runs 1.66 ms end to end,
bit-identical — docs/tpu_results/gather_ola2.json, arms ola_pad_only /
ola_nopad).

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


def _pad8(k: int) -> int:
    """Leading VMEM rows reserved for the (zeroed) out-of-range chunk rows,
    rounded up to the (8, 128) f32 tiling so every DMA start stays
    8-row-aligned."""
    return -(-(k - 1) // 8) * 8


def _kernel(k: int, block: int, t_rows: int, grid_n: int, frames_ref,
            out_ref, seg, sem):
    """One grid step: out rows ``[i*block, (i+1)*block)``; seg holds chunk
    rows ``[i*block - pad8, i*block - pad8 + rr)`` with out-of-range rows
    zeroed. Edge steps (first; the tail steps whose nominal read crosses
    ``t_rows``) get static per-step DMA plans via ``pl.when``."""
    i = pl.program_id(0)
    pad8 = _pad8(k)
    rr = block + pad8

    # Static DMA plans: {step index: (dst_offset, src_start, n_rows)}.
    special = {}
    for idx in range(grid_n):
        start = idx * block - pad8
        end = start + rr
        if start < 0 or end > t_rows:
            s0 = max(0, start)
            n_rows = max(0, min(t_rows, end) - s0)
            special[idx] = (s0 - start, s0, n_rows)

    def emit(dst_off, src_start, n_rows):
        def body():
            seg[...] = jnp.zeros(seg.shape, seg.dtype)
            if n_rows > 0:
                cp = pltpu.make_async_copy(
                    frames_ref.at[pl.ds(src_start, n_rows), :, :],
                    seg.at[pl.ds(dst_off, n_rows)], sem)
                cp.start()
                cp.wait()
        return body

    cond_default = None
    for idx, plan in special.items():
        pl.when(i == idx)(emit(*plan))
        c = i != idx
        cond_default = c if cond_default is None else jnp.logical_and(
            cond_default, c)

    def default_body():
        cp = pltpu.make_async_copy(
            frames_ref.at[pl.ds(i * block - pad8, rr), :, :], seg, sem)
        cp.start()
        cp.wait()

    # Emit the default plan only when some step actually uses it: with every
    # step special (single-block tiny inputs), tracing the full-size DMA
    # would fail the slice bounds check against the short input.
    if len(special) < grid_n:
        if cond_default is None:
            default_body()
        else:
            pl.when(cond_default)(default_body)

    acc = seg[pad8:pad8 + block, 0, :]
    for c in range(1, k):
        acc = acc + seg[pad8 - c:pad8 - c + block, c, :]
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
    chunks = frames.reshape(t, k, step)

    out = pl.pallas_call(
        functools.partial(_kernel, k, block, t, rows_pad // block),
        grid=(rows_pad // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, step), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, step), frames.dtype),
        scratch_shapes=[
            pltpu.VMEM((block + _pad8(k), k, step), frames.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(chunks)
    return out[:out_rows].reshape(-1)[: t * step + wl - step]
