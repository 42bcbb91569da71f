"""Pallas TPU kernel: fused inverse-GEMM + overlap-add synthesis.

The engine synthesis paths (ISTFT zaf.py:213-243, IMDCT zaf.py:1124-1184)
run an inverse-operator GEMM producing the ``(T, N)`` frame matrix, then an
overlap-add. As split programs the frame matrix round-trips HBM between the
GEMM and the OLA kernel — at 50% overlap that is 2x the signal bytes in
each direction, the synthesis-side mirror of the traffic the fused analysis
kernel (pallas/fused.py) eliminates (VERDICT round 4 item 3). This kernel
computes each output block's frames by GEMM *in VMEM* and overlap-adds
them before writing, so frames never touch HBM.

Structure (2nd formulation, measured on hardware): a 1-D grid over frame
blocks with the spectrum rows arriving through an auto-pipelined BlockSpec
(Pallas double-buffers the fetch against compute) and a small VMEM *carry*
scratch holding the previous block's last ``pad8`` frame rows — TPU grid
iterations execute sequentially, so scratch persists across steps and the
cross-block overlap costs no extra traffic. The first cut instead manual-
DMA'd overlapping row windows per step (the ola.py edge scheme): it was
correct but 10-20% SLOWER than the split GEMM+OLA programs — per-step
synchronous DMA latency with no compute overlap, the same lesson the
slab-CQT kernel learned (docs/tpu_results/round5_kernels2.json, arms
istft_synth_* of 2026-08-20T18:30 vs the v2 rerun).

Output row ``r`` (one hop of ``step`` samples) is
``sum_c frames[r-c, c*step:(c+1)*step]`` over the ``K = N/step`` chunks —
same c-ascending, left-associated addition order as pallas/ola.py and the
XLA pads-sum overlap_add. Block ``i``'s rows need frame rows
``[i*B - (K-1), i*B + B)``: the first ``K-1`` come from the carry, the rest
are this block's GEMM output, assembled in a ``(pad8 + B, N)`` frames
scratch whose row-shifted reads are the hardware-proven cqtslab idiom.

Components: the ISTFT consumes pre-folded Hermitian planes ``(h_re, h_im)``
against a stacked ``(cos, -sin)`` operator (``frames = h_re @ C - h_im @ S``
— the negation folded into the operator is exact); the IMDCT consumes the
coefficient matrix against the single window-folded inverse operator. The
COLA gain / Parseval scalings fold into the operator columns exactly as on
the XLA engine path (core/fft._direct_ridft_half_mats ``scale``).

Precision: the exact path honors the policy dial (HIGHEST default); under
``ZAFTPU_PRECISION=split4`` the operator ships host-presplit bf16 (hi, lo)
and the spectrum rows split in-kernel — cast round trip on Mosaic,
``reduce_precision`` in interpret mode, same rules as pallas/fused.py.

VMEM: the two-component ISTFT operator is ~19 MB f32 (or the same bytes as
a bf16 (hi, lo) pair), which exceeds the default 16 MiB scoped budget —
dispatch REQUIRES the raised-budget jit twin (core/dispatch.zjit
``scoped_vmem`` hint; :func:`wants_budget`). The one-component IMDCT
operator (~8.4 MB at F=1024) fits either budget.
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

# Frame rows (hops) per grid step, per transform — both measured on the
# v5e at 600-s scale (r5k4 budget x block grid, round-5 session): the
# two-component ISTFT wants 128 (2.12M vs 2.05M fr/s at 256 under split4 —
# the bigger double-buffered h blocks crowd the 19 MB operator); the
# one-component IMDCT wants 256 (10.6M vs 8.1M at 128 under split4, its
# 8.4 MB operator leaves room and the taller GEMM amortizes per-step
# overhead).
BLOCK_ROWS_ISTFT = 128
BLOCK_ROWS_IMDCT = 256


def _block_rows(default: int) -> int:
    """``ZAFTPU_SYNTH_BLOCK`` override for hardware block sweeps."""
    env = os.environ.get("ZAFTPU_SYNTH_BLOCK")
    if env:
        try:
            return max(8, int(env))
        except ValueError:
            pass
    return default


def enabled() -> bool:
    """``ZAFTPU_SYNTH``: ``auto`` (default — on when running on a real TPU
    backend) / ``1`` (force, interpret-mode testing) / ``0`` (disable, the
    A/B lever)."""
    env = os.environ.get("ZAFTPU_SYNTH", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def supported(n: int, step: int, dtype, k_minor: int) -> bool:
    """Kernel eligibility: hop lane-aligned (output minor dim), whole
    chunks with a real overlap (``K >= 2`` — at K=1 the OLA is a plain
    reshape and the carry scratch would be zero-row, which Mosaic has no
    reason to accept; the split path handles it), f32, and a lane-aligned
    contraction minor dim for the spectrum blocks (``k_minor`` = the
    padded spectrum row width)."""
    return (step % 128 == 0 and n % step == 0 and n // step >= 2
            and k_minor % 128 == 0
            and jnp.dtype(dtype) == jnp.float32)


# Largest operator the kernel will stage in VMEM: the raised scoped budget
# is 24576 KiB and the r5k4 grid ran the ~19 MB ISTFT stack healthily; a
# bigger-window geometry (e.g. WL=4096: 33.5-71 MB) must fall back to the
# split path instead of OOMing the scoped stack and poisoning the
# process-wide Pallas health latch through the guarded retry.
_MAX_OP_BYTES = 20 * 2**20


def wants_budget() -> bool:
    """Config-only predicate for the raised scoped-VMEM jit twin: True when
    the fused synthesis kernel can enter a synthesis trace (the ISTFT's
    two-component operator needs ~19 MB of scoped stack)."""
    from zaftpu import pallas as _pallas

    return enabled() and _pallas.enabled()


def scoped_vmem_hint() -> bool:
    """The zjit ``scoped_vmem`` predicate for every synthesis-containing
    trace (single-device and sharded ISTFT/IMDCT cores): the default
    split4-consumer predicate OR the synthesis kernel's budget need."""
    from zaftpu.core.dispatch import _wants_scoped_vmem

    return _wants_scoped_vmem() or wants_budget()


def kernel_wanted(n: int, step: int, dtype, ndim: int, n_comp: int,
                  kpad: int) -> bool:
    """Full dispatch decision for the fused synthesis kernel: dispatch on
    (``ZAFTPU_SYNTH`` auto = real TPU), 2-D (un-batched) input, aligned
    shapes — and, when the operator exceeds the default scoped-VMEM budget
    (the two-component ISTFT stack, ~19 MB), the raised-budget jit twin
    must be active (core/dispatch.budget_raised; under a user's outer jit
    the kernel is skipped and the split GEMM-then-OLA path runs)."""
    import jax as _jax

    from zaftpu import pallas as _pallas
    from zaftpu.core.dispatch import budget_raised

    if not (_pallas.enabled() and enabled() and ndim == 2):
        return False
    if not supported(n, step, dtype, kpad):
        return False
    op_bytes = n_comp * kpad * n * 4  # f32; the bf16 presplit is the same
    if op_bytes > _MAX_OP_BYTES:
        return False  # would OOM even the raised scoped stack
    need_budget = op_bytes > 12 * 2**20
    if (need_budget and _jax.default_backend() == "tpu"
            and not budget_raised()):
        return os.environ.get("ZAFTPU_SYNTH") == "1"
    return True


def istft_kernel_preferred() -> bool:
    """Measured dispatch policy for the ISTFT (r5k4 grid, v5e 600-s): the
    kernel wins under split4 (2.12M vs 2.04M fr/s — the 4-pass GEMM blocks
    XLA's fusion, so removing the frame round trip pays) but LOSES at
    HIGHEST (1.76M vs 1.84M — the 6-pass dot on 128-row blocks underfills
    the MXU vs XLA's full-height GEMM + its OLA-kernel tail). The IMDCT
    kernel wins at BOTH dials (5.99M/10.6M vs 4.98M/4.85M) and has no such
    gate. ``ZAFTPU_SYNTH=1`` forces."""
    from zaftpu.core.policy import split4_enabled

    return split4_enabled() or os.environ.get("ZAFTPU_SYNTH") == "1"


def _kpad(half: int) -> int:
    return -(-half // 128) * 128


def _pad8(k: int) -> int:
    """Carry rows for the cross-block frame overlap (``K - 1`` needed),
    rounded to the (8, 128) f32 sublane tiling."""
    return -(-(k - 1) // 8) * 8


def _ola_rows(frames_scr, k: int, block: int, pad8: int, step: int):
    """Overlap-add the assembled ``(pad8 + block, N)`` frame rows into
    ``(block, step)`` output rows: out row j = sum_c scr[j + pad8 - c,
    c*step:(c+1)*step] — same c-ascending left-associated addition order as
    pallas/ola.py and the XLA pads-sum overlap_add, so values are
    identical. The shifted reads are VMEM-ref row slices at unaligned
    offsets — the hardware-proven cqtslab idiom."""
    acc = frames_scr[pad8:pad8 + block, 0:step]
    for c in range(1, k):
        acc = acc + frames_scr[pad8 - c:pad8 - c + block,
                               c * step:(c + 1) * step]
    return acc


def _body(k, block, pad8, step, fr, out_ref, frames_scr, carry):
    """Shared epilogue: assemble carry + this block's frames in the
    scratch, emit the output rows, refresh the carry."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_carry():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    frames_scr[0:pad8, :] = carry[...]
    frames_scr[pad8:pad8 + block, :] = fr
    out_ref[:, :] = _ola_rows(frames_scr, k, block, pad8, step)
    # Last pad8 frame rows of THIS block become the next step's carry
    # (sequential grid: scratch persists across iterations).
    carry[...] = frames_scr[block:block + pad8, :]


def _kernel(k: int, block: int, pad8: int, step: int, n_comp: int,
            precision, *refs):
    h_refs = refs[:n_comp]
    op_ref, out_ref, frames_scr, carry = refs[n_comp:n_comp + 4]

    fr = None
    for c in range(n_comp):
        prod = jax.lax.dot_general(
            h_refs[c][...], op_ref[c],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        fr = prod if fr is None else fr + prod
    _body(k, block, pad8, step, fr, out_ref, frames_scr, carry)


def _kernel_split4(k: int, block: int, pad8: int, step: int, n_comp: int,
                   use_reduce_precision: bool, *refs):
    """split4 twin: spectrum rows split in-kernel into an exact bf16
    (hi, lo) pair (cast round trip on Mosaic — reduce_precision has no
    Pallas TPU lowering; interpret mode needs reduce_precision, where the
    body runs as XLA ops and the cast round trip would be elided — same
    rules as pallas/fused._kernel_split4), accumulated 4-pass
    smallest-first against the host-presplit operator."""
    h_refs = refs[:n_comp]
    op_ref, out_ref, frames_scr, carry = refs[n_comp:n_comp + 4]

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    fr = None
    for c in range(n_comp):
        a = h_refs[c][...]
        if use_reduce_precision:
            hi = jax.lax.reduce_precision(a, exponent_bits=8,
                                          mantissa_bits=7)
            ah = hi.astype(jnp.bfloat16)
            al = (a - hi).astype(jnp.bfloat16)
        else:
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh, bl = op_ref[c, 0], op_ref[c, 1]
        prod = ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)
        fr = prod if fr is None else fr + prod
    _body(k, block, pad8, step, fr, out_ref, frames_scr, carry)


def _gemm_ola_impl(h_planes, ops, n: int, step: int, precision,
                   block_rows: int = BLOCK_ROWS_ISTFT,
                   interpret: bool = False):
    """``overlap_add(sum_c h_planes[c] @ ops[c], step)`` without the frame
    matrix in HBM. ``h_planes``: tuple of ``(T, kpad)`` f32 arrays; ``ops``:
    ``(C, kpad, n)`` f32 (exact) or ``(C, 2, kpad, n)`` bf16 (presplit,
    ``precision="split4"``). Returns the ``(T*step + n - step,)`` signal."""
    t_true = h_planes[0].shape[0]
    k = n // step
    pad8 = _pad8(k)
    out_rows = t_true + k - 1
    block = min(block_rows, -(-out_rows // 8) * 8)
    grid_n = -(-out_rows // block)
    # Row-pad the planes to the grid (zero rows -> zero frames -> exact
    # zero overlap-add contributions), so every auto-pipelined block read
    # is in bounds.
    t_pad = grid_n * block
    h_planes = tuple(
        jnp.pad(h, ((0, t_pad - t_true), (0, 0))) if h.shape[0] != t_pad
        else h for h in h_planes)
    n_comp = len(h_planes)
    kpad = h_planes[0].shape[1]

    if precision == "split4":
        kern = functools.partial(_kernel_split4, k, block, pad8, step,
                                 n_comp, interpret)
        op_spec = pl.BlockSpec((n_comp, 2, kpad, n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel, k, block, pad8, step, n_comp,
                                 precision)
        op_spec = pl.BlockSpec((n_comp, kpad, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec((block, kpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * n_comp
        + [op_spec],
        out_specs=pl.BlockSpec((block, step), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * block, step), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((pad8 + block, n), jnp.float32),
            pltpu.VMEM((pad8, n), jnp.float32),
        ],
        interpret=interpret,
    )(*h_planes, ops)
    return out[:out_rows].reshape(-1)[: t_true * step + n - step]


gemm_ola = jax.jit(
    _gemm_ola_impl,
    static_argnames=("n", "step", "precision", "block_rows", "interpret"))


@lru_cache(maxsize=8)
def _istft_ops_padded(n: int, scale: float):
    """Stacked ``(2, kpad, N)`` f32 inverse-rDFT operator (cos, -sin) with
    the conjugate-pair weights, 1/N, and ``scale`` (the COLA gain division,
    zaf.py:241) folded in — the same float64 host math as the XLA engine
    path (core/fft._direct_ridft_half_mats), so values are rounding-
    compatible. Rows beyond N/2+1 are zero (they multiply the zero lane
    padding of the folded spectrum planes)."""
    from zaftpu.core.fft import _direct_ridft_half_mats

    cos_m, sin_m = _direct_ridft_half_mats(n, "float32", float(scale))
    half = cos_m.shape[0]
    kp = _kpad(half)
    ops = np.zeros((2, kp, n), np.float32)
    ops[0, :half] = cos_m
    ops[1, :half] = -sin_m
    return ops


@lru_cache(maxsize=8)
def _imdct_ops_padded(f: int, wbytes):
    """Single-component ``(1, f, 2F)`` f32 window-folded inverse-MDCT
    operator (pre/FFT/post/2*Re/window fused — transforms/mdct.
    _direct_inverse_windowed_matrix), reference zaf.py:1124-1184."""
    from zaftpu.transforms.mdct import _direct_inverse_windowed_matrix

    m = _direct_inverse_windowed_matrix(f, wbytes).astype(np.float32)
    return m[np.newaxis]


def _split_ops_of(builder, *args):
    """Host-presplit bf16 (hi, lo) stack of a padded-ops builder (the
    pallas/fused scheme, shared host splitter)."""
    return _split_cached(builder, args)


@lru_cache(maxsize=16)
def _split_cached(builder, args):
    import ml_dtypes

    from zaftpu.pallas.fused import _bf16_split_host

    ops = builder(*args)
    out = np.zeros((ops.shape[0], 2) + ops.shape[1:], ml_dtypes.bfloat16)
    for c in range(ops.shape[0]):
        hi, lo = _bf16_split_host(ops[c])
        out[c, 0] = hi.astype(ml_dtypes.bfloat16)
        out[c, 1] = lo.astype(ml_dtypes.bfloat16)
    return out


def _dispatch_ops(builder, *args):
    """(device ops stack, precision tag) for the current precision dial —
    f32 + policy precision on the exact path, host-presplit bf16 under
    split4 (pallas/fused._dispatch_ops pattern)."""
    from zaftpu.core.policy import matmul_precision, split4_enabled
    from zaftpu.utils.devcache import pinned_device_constant

    if split4_enabled():
        return (pinned_device_constant(_split_ops_of(builder, *args),
                                       jnp.bfloat16), "split4")
    return (pinned_device_constant(builder(*args), np.float32),
            matmul_precision())


def _pad_lanes(x, kpad: int):
    if x.shape[-1] == kpad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, kpad - x.shape[-1])])


def istft_ola(h_re, h_im, n: int, step: int, scale: float,
              interpret: bool = False):
    """Fused ISTFT synthesis from pre-folded Hermitian planes
    ``(T, N/2+1)``: inverse-rDFT GEMM + COLA overlap-add in one HBM pass,
    returning the ``(T*step + N - step,)`` pre-trim signal (zaf.py:213-233
    semantics; the caller trims and the COLA gain is already folded via
    ``scale``)."""
    kp = _kpad(n // 2 + 1)
    ops, precision = _dispatch_ops(_istft_ops_padded, n, float(scale))
    return gemm_ola((_pad_lanes(h_re, kp), _pad_lanes(h_im, kp)), ops, n,
                    step, precision,
                    block_rows=_block_rows(BLOCK_ROWS_ISTFT),
                    interpret=interpret)


def imdct_ola(coeffs, f: int, wbytes, interpret: bool = False):
    """Fused IMDCT synthesis from frames-major coefficients ``(T, F)``:
    window-folded inverse GEMM + TDAC overlap-add in one HBM pass,
    returning the ``(T*F + F,)`` pre-trim signal (zaf.py:1159-1179
    semantics; the caller applies the reference trim)."""
    ops, precision = _dispatch_ops(_imdct_ops_padded, f, wbytes)
    return gemm_ola((coeffs,), ops, 2 * f, f, precision,
                    block_rows=_block_rows(BLOCK_ROWS_IMDCT),
                    interpret=interpret)
