"""Pallas TPU kernel: fused framing + windowing + DFT-as-GEMM analysis.

The direct-GEMM STFT path (``ZAFTPU_FFT=auto`` on TPU) is HBM-bound, and its
dominant traffic is the ``(T, WL)`` windowed-frame matrix: the framing kernel
writes it and the DFT GEMM immediately reads it back — at 50% overlap that is
2x the signal size in each direction, more than the spectrum output itself.
This kernel never materializes frames in HBM: each grid step DMAs its
overlapping signal segment into VMEM, forms the windowed frames in a VMEM
scratch, and feeds the MXU directly, writing only the spectra.

Mosaic-compatibility (2nd formulation): the first version ran a ``(C,
T_blocks)`` 2-D grid with the cos/sin operator indexed by the outer axis —
the tunnel's remote Mosaic compiler rejects 2-D grids outright
(docs/tpu_results/fused_probe.json: ``grid2`` fails while 1-D-grid dot
kernels, 3-D operand blocks, and the manual-DMA framing kernel all compile).
This version stays inside the proven feature set: ONE grid axis over frame
blocks, one pallas_call per operator component (cos, sin), each call =
the hardware-proven framing kernel body + the hardware-proven
``dot_general``. The signal is read twice (tiny next to the frame-matrix
round trip it replaces) and each ~9 MB operator stays VMEM-resident across
all grid steps.

Precision: the dot honors the exact-path dial (HIGHEST default). Under
``ZAFTPU_PRECISION=split4`` the kernel runs the same 4-pass bf16-split
scheme as :func:`zaftpu.core.policy._split4_matmul` *in VMEM*: the operator
ships as a host-presplit ``(2, WL, F_pad)`` bf16 (hi, lo) stack and the
frames split through ``lax.reduce_precision`` (the cast-round-trip elision
trap, policy.py:155) — 4 MXU passes, f32 accumulation, smallest-first.

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

BLOCK_FRAMES = 128  # frames per grid step (VMEM budget: ~9 MB operator +
                    # ~1 MB frames scratch + segment + output block)


def _block_frames() -> int:
    """``ZAFTPU_FUSED_BLOCK`` override for hardware block sweeps."""
    import os

    env = os.environ.get("ZAFTPU_FUSED_BLOCK")
    if env:
        try:
            return max(8, int(env))
        except ValueError:
            pass
    return BLOCK_FRAMES


def supported(window_length: int, step: int, dtype) -> bool:
    return (step % 128 == 0 and window_length % step == 0
            and dtype == jnp.float32)


def budget_ok() -> bool:
    """Can this trace's scoped-VMEM needs be met? The split4 variant OOMs
    the default 16 MiB scoped stack at a window of grid lengths
    (docs/tpu_results/split4_grid.json) and therefore requires the raised
    budget of the dispatch twin; the exact-path variant fits the default
    budget (hardware-proven round 3)."""
    from zaftpu.core.dispatch import budget_raised
    from zaftpu.core.policy import split4_enabled

    if jax.default_backend() != "tpu":
        return True  # interpret-mode runs have no scoped-VMEM stack
    return budget_raised() or not split4_enabled()


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


def _bf16_split_host(m: np.ndarray):
    """Host twin of policy._bf16_split: exact (hi, lo) bf16 pair per entry
    (numpy has no bf16; emulate via the f32 bit pattern truncation that
    ``reduce_precision(8, 7)`` performs, round-to-nearest-even)."""
    f32 = m.astype(np.float32)
    bits = f32.view(np.uint32)
    # round to nearest even at 16 bits: add 0x7FFF + lsb-of-kept-part
    lsb = (bits >> 16) & 1
    hi_bits = (bits + 0x7FFF + lsb) & 0xFFFF0000
    hi = hi_bits.view(np.float32)
    lo = f32 - hi
    return hi, lo


def _frame_block(k: int, block: int, sig_ref, win_ref, seg, frames, sem):
    """The hardware-proven framing body (framing._kernel): DMA this grid
    step's overlapping signal rows into VMEM and emit windowed frames into
    the ``frames`` scratch."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, _read_rows(block, k)), :], seg, sem)
    copy.start()
    copy.wait()
    step = seg.shape[1]
    for c in range(k):
        frames[:, c * step:(c + 1) * step] = seg[c:c + block, :] * win_ref[c, :]


def _kernel(k: int, block: int, precision, sig_ref, win_ref, op_ref,
            out_ref, seg, frames, sem):
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)
    out_ref[:, :] = jax.lax.dot_general(
        frames[:, :], op_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _mirror_epilogue(half_res, n: int, half: int, sign: float):
    """Full-spectrum plane from the half-plane dot result: columns
    ``half..n-1`` are the conjugate mirror ``full[k] = sign * half[n-k]``
    (sign +1 for the real plane, -1 for imaginary — zaf.py:139's
    ``FFT(x)[k] = conj(FFT(x)[n-k])``). A pure in-VMEM lane reversal of the
    SAME dot outputs, so the emitted spectrum is bit-identical to the XLA
    gather-mirror it replaces (core/fft.full_from_half)."""
    interior = half_res[:, 1:n - half + 1]
    mirrored = jnp.flip(interior, axis=1)
    if sign < 0:
        mirrored = -mirrored
    return jnp.concatenate([half_res[:, :half], mirrored], axis=1)


def _kernel_full(k: int, block: int, precision, n: int, half: int,
                 sign: float, sig_ref, win_ref, op_ref, out_ref, seg,
                 frames, sem):
    """Exact-path kernel emitting the FULL mirrored plane: the dot computes
    bins 0..n/2 as usual; the epilogue writes the mirrored interior lanes
    in-kernel, so XLA's only remaining assembly work is the intrinsic
    ``lax.complex`` + transpose (measured floor 3.08 ms vs the 4.7 ms
    lane-gather mirror per 10-min STFT — docs/tpu_results/c64_assembly.json;
    VERDICT round 4 item 5)."""
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)
    half_res = jax.lax.dot_general(
        frames[:, :], op_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)
    out_ref[:, :] = _mirror_epilogue(half_res, n, half, sign)


def _kernel_full_split4(k: int, block: int, use_reduce_precision: bool,
                        n: int, half: int, sign: float, sig_ref, win_ref,
                        op_ref, out_ref, seg, frames, sem):
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)
    fr = frames[:, :]
    if use_reduce_precision:
        hi = jax.lax.reduce_precision(fr, exponent_bits=8, mantissa_bits=7)
        ah = hi.astype(jnp.bfloat16)
        al = (fr - hi).astype(jnp.bfloat16)
    else:
        ah = fr.astype(jnp.bfloat16)
        al = (fr - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh, bl = op_ref[0], op_ref[1]

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    half_res = ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)
    out_ref[:, :] = _mirror_epilogue(half_res, n, half, sign)


def _kernel2(k: int, block: int, precision, sig_ref, win_ref, op_ref,
             out_re_ref, out_im_ref, seg, frames, sem):
    """Two-output twin of :func:`_kernel`: ONE pallas_call forms the
    windowed frames once and runs both component dots against the stacked
    VMEM-resident operator — the per-component formulation duplicates the
    framing (signal DMA + window multiply) per call. Hardware A/B in
    docs/tpu_results/round5_fused2.json decides the dispatch."""
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)

    def dot(op):
        return jax.lax.dot_general(
            frames[:, :], op,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    out_re_ref[:, :] = dot(op_ref[0])
    out_im_ref[:, :] = dot(op_ref[1])


def _kernel2_split4(k: int, block: int, use_reduce_precision: bool,
                    sig_ref, win_ref, op_ref, out_re_ref, out_im_ref, seg,
                    frames, sem):
    """Two-output split4 twin: frames form and split ONCE; both components'
    4-pass dots run against the presplit stacked operator."""
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

    for c, out_ref in ((0, out_re_ref), (1, out_im_ref)):
        bh, bl = op_ref[c, 0], op_ref[c, 1]
        out_ref[:, :] = ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)


def _kernel_split4(k: int, block: int, use_reduce_precision: bool, sig_ref,
                   win_ref, op_ref, out_ref, seg, frames, sem):
    """4-pass bf16-split dot (policy._split4_matmul in VMEM): operator
    arrives host-presplit bf16 (hi, lo); frames split in-kernel.

    The split primitive differs by execution mode — the two are
    semantically identical (bf16 cast is RN-even, exactly
    ``reduce_precision(8, 7)``), but each mode only supports one of them:

    * Mosaic (real TPU): an explicit bf16 cast round trip.
      ``reduce_precision`` has NO Pallas TPU lowering
      (NotImplementedError, measured 2026-08-20), while the XLA
      excess-precision elision that forbids the cast round trip on the
      XLA path (policy.py:155) does not apply inside a Mosaic kernel —
      hardware-measured relerr 2.9e-6 (a collapse to one bf16 pass would
      read ~2.5e-3).
    * interpret mode (CPU tests): ``reduce_precision`` — the kernel body
      runs as XLA ops there, so the cast round trip WOULD be elided.
    """
    _frame_block(k, block, sig_ref, win_ref, seg, frames, sem)
    fr = frames[:, :]
    if use_reduce_precision:
        hi = jax.lax.reduce_precision(fr, exponent_bits=8, mantissa_bits=7)
        ah = hi.astype(jnp.bfloat16)
        al = (fr - hi).astype(jnp.bfloat16)
    else:
        ah = fr.astype(jnp.bfloat16)
        al = (fr - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh, bl = op_ref[0], op_ref[1]

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out_ref[:, :] = ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)


def _frames_matmul_impl(padded, window, ops, window_length: int, step: int,
                        number_times: int, precision,
                        block_frames: int = BLOCK_FRAMES,
                        interpret: bool = False):
    """``windowed_frames(padded) @ ops[c]`` for each stacked operator
    component, without materializing the frames in HBM.

    Returns ``(C, number_times, F_pad)`` float32; callers slice the valid
    ``F`` columns. ``ops`` is ``(C, window_length, F_pad)`` float32 for the
    exact path, or ``(C, 2, window_length, F_pad)`` bf16 (hi, lo presplit)
    for ``precision="split4"`` — each component runs as its own 1-D-grid
    pallas_call (the remote Mosaic rejects 2-D grids,
    docs/tpu_results/fused_probe.json).
    """
    k = window_length // step
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
    n_comp, f_pad = ops.shape[0], ops.shape[-1]

    if split4:
        kern = functools.partial(_kernel_split4, k, block, interpret)
        op_block = pl.BlockSpec((2, window_length, f_pad), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel, k, block, precision)
        op_block = pl.BlockSpec((window_length, f_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

    def one_component(op):
        return pl.pallas_call(
            kern,
            grid=(t_pad // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k, step), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                op_block,
            ],
            out_specs=pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
                pltpu.VMEM((block, window_length), padded.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(sig2d, win2d, op)

    out = jnp.stack([one_component(ops[c]) for c in range(n_comp)])
    return out[:, :number_times, :]


def fused2_enabled() -> bool:
    """``ZAFTPU_FUSED2``: the two-output single-call analysis kernel
    (frames form once for both components). Default OFF — a measured
    NEGATIVE result (docs/tpu_results/round5_fused2.json): the kernel
    compiles and runs standalone at every probed scale, but the FULL stft
    program around it (mirror + complex + transpose downstream) overflows
    the 24576 KiB scoped-VMEM stack that is globally optimal ("Ran out of
    memory in memory space vmem while allocating on stack for
    %_frames_matmul2_impl"), and raising the budget to fit costs more
    than the saved framing pass is worth (32768 measured −12% framework-
    wide). The ~19 MB stacked operator is the structural cost of holding
    both components resident. ``1`` forces (the guarded fallback covers
    the OOM)."""
    import os

    return os.environ.get("ZAFTPU_FUSED2", "0") == "1"


def fused2_wants_budget() -> bool:
    """The stacked two-component operator (~19 MB at WL=2048) exceeds the
    default scoped budget in BOTH precision schemes — the dispatch twin
    must be engaged whenever the two-output kernel can enter a trace."""
    from zaftpu import pallas as _pallas

    return fused2_enabled() and _pallas.enabled()


def _frames_matmul2_impl(padded, window, ops, window_length: int,
                         step: int, number_times: int, precision,
                         block_frames: int = BLOCK_FRAMES,
                         interpret: bool = False):
    """Two-output twin of :func:`_frames_matmul_impl`: one pallas_call,
    both component planes emitted — the framing (signal DMA + window
    multiply) runs once instead of once per component."""
    k = window_length // step
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

    if split4:
        kern = functools.partial(_kernel2_split4, k, block, interpret)
        op_spec = pl.BlockSpec((2, 2, window_length, f_pad),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel2, k, block, precision)
        op_spec = pl.BlockSpec((2, window_length, f_pad),
                               lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    out_block = pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        kern,
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, step), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            op_spec,
        ],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
            pltpu.VMEM((block, window_length), padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, win2d, ops)
    return re[:number_times], im[:number_times]


frames_matmul2 = jax.jit(
    _frames_matmul2_impl,
    static_argnames=("window_length", "step", "number_times", "precision",
                     "block_frames", "interpret"))


# NOTE on the round-3 "split4 fused kernel Mosaic 500 at production grid
# lengths": the real failure was XLA's layout assignment staging buffers in
# scoped VMEM for a WINDOW of t_pad sizes (t=8192/12800/25841 failed while
# 1024/4096/19200 passed — "Ran out of memory in memory space vmem ...
# 19.71M and limit 16.00M"; walk in docs/tpu_results/split4_grid.json).
# The fix lives in zaftpu.core.dispatch.zjit: the TOP-LEVEL transform jit
# raises the scoped budget via compiler_options when the split4 fused
# dispatch is active (JAX forbids compiler_options on nested jits, so it
# cannot live here). Hardware-verified at all three failing sizes, relerr
# <= 3.0e-6.
frames_matmul = jax.jit(
    _frames_matmul_impl,
    static_argnames=("window_length", "step", "number_times", "precision",
                     "block_frames", "interpret"))


def _dispatch_ops(ops_padded_fn, n: int):
    """Resolve the (device ops stack, precision tag) pair for the current
    precision dial: f32 operators + the policy precision on the exact path,
    host-presplit bf16 (hi, lo) + the in-kernel 4-pass scheme under
    ``ZAFTPU_PRECISION=split4``. ``ops_padded_fn`` must be an lru-cached
    host builder returning ``(C, N, F_pad)`` float32 (identity-stable, so
    ``pinned_device_constant`` can key on it)."""
    from zaftpu.core.policy import matmul_precision, split4_enabled
    from zaftpu.utils.devcache import pinned_device_constant

    if split4_enabled():
        return (pinned_device_constant(_split_ops_of(ops_padded_fn, n),
                                       jnp.bfloat16), "split4")
    return (pinned_device_constant(ops_padded_fn(n), np.float32),
            matmul_precision())


@lru_cache(maxsize=16)
def _split_ops_of(ops_padded_fn, n: int):
    """Host-presplit ``(C, 2, N, F_pad)`` bf16 stack of any padded-ops
    builder (keyed by the builder function + length)."""
    import ml_dtypes

    ops = ops_padded_fn(n)
    out = np.zeros((ops.shape[0], 2) + ops.shape[1:], ml_dtypes.bfloat16)
    for c in range(ops.shape[0]):
        hi, lo = _bf16_split_host(ops[c])
        out[c, 0] = hi.astype(ml_dtypes.bfloat16)
        out[c, 1] = lo.astype(ml_dtypes.bfloat16)
    return out


def _frames_matmul_full_impl(padded, window, ops, window_length: int,
                             step: int, number_times: int, precision,
                             block_frames: int = BLOCK_FRAMES,
                             interpret: bool = False):
    """Full-spectrum twin of :func:`_frames_matmul_impl`: same half-spectrum
    operator and dots, but each component's kernel writes the ``(T, WL)``
    mirrored plane via the in-kernel lane-reversal epilogue."""
    n = window_length
    half = n // 2 + 1
    k = n // step
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

    def one_component(op, sign):
        if split4:
            kern = functools.partial(_kernel_full_split4, k, block,
                                     interpret, n, half, sign)
            op_block = pl.BlockSpec((2, n, f_pad), lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
        else:
            kern = functools.partial(_kernel_full, k, block, precision, n,
                                     half, sign)
            op_block = pl.BlockSpec((n, f_pad), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(t_pad // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((k, step), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                op_block,
            ],
            out_specs=pl.BlockSpec((block, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_pad, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_read_rows(block, k), step), padded.dtype),
                pltpu.VMEM((block, window_length), padded.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(sig2d, win2d, op)

    re_full = one_component(ops[0], 1.0)
    im_full = one_component(ops[1], -1.0)
    return re_full[:number_times], im_full[:number_times]


frames_matmul_full = jax.jit(
    _frames_matmul_full_impl,
    static_argnames=("window_length", "step", "number_times", "precision",
                     "block_frames", "interpret"))


def fullspec_enabled() -> bool:
    """``ZAFTPU_FULLSPEC``: dispatch the full-spectrum mirrored-emission
    kernels for the STFT. Default OFF — a measured NEGATIVE result on this
    hardware: the epilogue's lane reversal lowers to ``lax.rev``, which has
    no Pallas TPU lowering ("Unimplemented primitive in Pallas TPU lowering
    for KernelType.TC: rev", docs/tpu_results/round5_kernels.json, closing
    VERDICT round 4 item 5 with the construct-bisect artifact). The kernel
    stays correct in interpret mode (bitwise gates in tests/test_pallas.py)
    and ``1`` forces it for future Mosaic versions that may gain the
    lowering; dispatching it on today's chip would poison the process-wide
    Pallas health latch through the guarded fallback."""
    import os

    return os.environ.get("ZAFTPU_FULLSPEC", "0") == "1"


def frames_rfft_full(padded, window, window_length: int, step: int,
                     number_times: int, interpret: bool = False):
    """Fused windowed-frames FULL-spectrum planes ``(re, im)`` of shape
    ``(T, WL)`` — the reference's zaf.py:139 convention with the mirrored
    bins emitted in-kernel (bit-identical to
    ``full_from_half(frames_rfft(...))`` since the mirrored lanes are
    copies/negations of the same dot outputs)."""
    ops, precision = _dispatch_ops(_rdft_ops_padded, window_length)
    return frames_matmul_full(padded, window, ops, window_length, step,
                              number_times, precision,
                              block_frames=_block_frames(),
                              interpret=interpret)


def frames_rfft(padded, window, window_length: int, step: int,
                number_times: int, interpret: bool = False):
    """Fused windowed-frames rfft: ``(T, WL//2+1)`` complex64 half-spectrum
    in a single HBM pass over the signal (no frame materialization)."""
    from zaftpu.core.dispatch import budget_raised

    f = window_length // 2 + 1
    ops, precision = _dispatch_ops(_rdft_ops_padded, window_length)
    if fused2_enabled() and (interpret or budget_raised()
                             or jax.default_backend() != "tpu"):
        re, im = frames_matmul2(padded, window, ops, window_length, step,
                                number_times, precision,
                                block_frames=_block_frames(),
                                interpret=interpret)
        return jax.lax.complex(re[:, :f], im[:, :f])
    out = frames_matmul(padded, window, ops, window_length, step,
                        number_times, precision,
                        block_frames=_block_frames(), interpret=interpret)
    return jax.lax.complex(out[0, :, :f], out[1, :, :f])


def frames_op(padded, window, ops_padded_fn, n_cols: int,
              window_length: int, step: int, number_times: int,
              interpret: bool = False):
    """Fused ``windowed_frames @ op`` for a single-component real operator
    (e.g. the folded MDCT forward matrix): ``(T, n_cols)`` float32 in one
    HBM pass over the signal. ``ops_padded_fn(window_length)`` must be an
    lru-cached host builder returning ``(1, WL, F_pad)`` float32."""
    ops, precision = _dispatch_ops(ops_padded_fn, window_length)
    out = frames_matmul(padded, window, ops, window_length, step,
                        number_times, precision,
                        block_frames=_block_frames(), interpret=interpret)
    return out[0, :, :n_cols]
