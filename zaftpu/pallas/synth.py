"""Pallas TPU kernel: fused inverse-GEMM + overlap-add synthesis.

The engine synthesis paths (ISTFT zaf.py:213-243, IMDCT zaf.py:1124-1184)
run an inverse-operator GEMM producing the ``(T, N)`` frame matrix, then an
overlap-add. As split programs the frame matrix round-trips HBM between the
GEMM and the OLA kernel — at 50% overlap that is 2x the signal bytes in
each direction, the synthesis-side mirror of the traffic the fused analysis
kernel (pallas/fused.py) eliminates (VERDICT round 4 item 3). This kernel
computes each output block's contributing frames by GEMM *in VMEM* and
overlap-adds them before writing, so frames never touch HBM: per grid step
it DMAs the ``B + pad8`` spectrum rows whose frames overlap the block's
output rows, runs the dot(s) against the VMEM-resident inverse operator,
and emits ``B`` rows of finished signal.

Layout (1-D grid over output row-blocks — the only grid shape the remote
Mosaic accepts, pallas/fused.py): output row ``r`` (one hop of ``step``
samples) is ``sum_c frames[r-c, c*step:(c+1)*step]`` for the ``K = N/step``
chunks; block ``i`` needs frame rows ``[i*B - (K-1), i*B + B)``, fetched
with the leading ``pad8`` rows 8-aligned and out-of-range rows zeroed via
static per-step DMA plans (the proven pallas/ola.py edge scheme — zeroed
*input* rows produce zero frames, which is exactly the out-of-range
contribution).

Components: the ISTFT consumes pre-folded Hermitian planes ``(h_re, h_im)``
against a stacked ``(cos, -sin)`` operator (``frames = h_re @ C - h_im @ S``
— the negation is folded into the operator, bit-identical since FP negation
is exact); the IMDCT consumes the coefficient matrix against the single
window-folded inverse operator. The COLA gain / Parseval scalings are
folded into the operator columns exactly as on the XLA engine path
(core/fft._direct_ridft_half_mats ``scale``).

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

BLOCK_ROWS = 128  # output rows (hops) per grid step: keeps the (B+8, N)
                  # frame intermediate ~1 MB at N=2048 next to the ~19 MB
                  # two-component operator under the 32 MiB raised budget


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
    chunks, f32, and a lane-aligned contraction minor dim for the spectrum
    DMA (``k_minor`` = the padded spectrum row width)."""
    return (step % 128 == 0 and n % step == 0 and k_minor % 128 == 0
            and jnp.dtype(dtype) == jnp.float32)


def wants_budget() -> bool:
    """Config-only predicate for the raised scoped-VMEM jit twin: True when
    the fused synthesis kernel can enter a synthesis trace (the ISTFT's
    two-component operator needs ~19 MB of scoped stack)."""
    from zaftpu import pallas as _pallas

    return enabled() and _pallas.enabled()


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
    need_budget = n_comp * kpad * n * 4 > 12 * 2**20
    if (need_budget and _jax.default_backend() == "tpu"
            and not budget_raised()):
        return os.environ.get("ZAFTPU_SYNTH") == "1"
    return True


def _kpad(half: int) -> int:
    return -(-half // 128) * 128


def _pad8(k: int) -> int:
    """Leading VMEM rows for the out-of-range frame rows, rounded to the
    (8, 128) f32 tiling so every DMA start stays 8-row-aligned."""
    return -(-(k - 1) // 8) * 8


def _dma_plans(grid_n: int, block: int, pad8: int, t_rows: int):
    """Static per-step DMA plans {i: (dst_off, src_start, n_rows)} for the
    steps whose nominal read ``[i*block - pad8, i*block + block)`` leaves
    ``[0, t_rows)`` — the pallas/ola.py edge scheme."""
    special = {}
    rr = block + pad8
    for idx in range(grid_n):
        start = idx * block - pad8
        end = start + rr
        if start < 0 or end > t_rows:
            s0 = max(0, start)
            n_rows = max(0, min(t_rows, end) - s0)
            special[idx] = (s0 - start, s0, n_rows)
    return special


def _load_rows(i, block: int, pad8: int, special, grid_n: int, src_ref,
               seg, sem):
    """DMA this grid step's spectrum rows into ``seg`` (zeroing
    out-of-range rows on the statically-known edge steps)."""
    rr = block + pad8

    def emit(dst_off, src_start, n_rows):
        def body():
            seg[...] = jnp.zeros(seg.shape, seg.dtype)
            if n_rows > 0:
                cp = pltpu.make_async_copy(
                    src_ref.at[pl.ds(src_start, n_rows), :],
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
            src_ref.at[pl.ds(i * block - pad8, rr), :], seg, sem)
        cp.start()
        cp.wait()

    if len(special) < grid_n:
        if cond_default is None:
            default_body()
        else:
            pl.when(cond_default)(default_body)


def _ola_rows(fr, k: int, block: int, pad8: int, step: int):
    """Overlap-add the ``(block+pad8, N)`` frame rows into ``(block, step)``
    output rows: out row j = sum_c fr[j + pad8 - c, c*step:(c+1)*step] —
    same c-ascending left-associated addition order as pallas/ola.py and
    the XLA pads-sum overlap_add, so values are identical."""
    acc = fr[pad8:pad8 + block, 0:step]
    for c in range(1, k):
        acc = acc + fr[pad8 - c:pad8 - c + block, c * step:(c + 1) * step]
    return acc


def _kernel(k: int, block: int, grid_n: int, t_rows: int, step: int,
            n_comp: int, precision, *refs):
    """Exact-path kernel: per input component, DMA spectrum rows + one
    VMEM dot against the resident operator; accumulate frames; OLA; write.
    refs = (*h_refs, op_ref, out_ref, *segs, sem)."""
    h_refs = refs[:n_comp]
    op_ref, out_ref = refs[n_comp], refs[n_comp + 1]
    segs = refs[n_comp + 2:n_comp + 2 + n_comp]
    sem = refs[-1]
    i = pl.program_id(0)
    pad8 = _pad8(k)
    special = _dma_plans(grid_n, block, pad8, t_rows)

    fr = None
    for c in range(n_comp):
        _load_rows(i, block, pad8, special, grid_n, h_refs[c], segs[c], sem)
        prod = jax.lax.dot_general(
            segs[c][...], op_ref[c],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        fr = prod if fr is None else fr + prod
    out_ref[:, :] = _ola_rows(fr, k, block, pad8, step)


def _kernel_split4(k: int, block: int, grid_n: int, t_rows: int, step: int,
                   n_comp: int, use_reduce_precision: bool, *refs):
    """split4 twin: spectrum rows split in-kernel into an exact bf16
    (hi, lo) pair (cast round trip on Mosaic — reduce_precision has no
    Pallas TPU lowering; interpret mode needs reduce_precision, where the
    body runs as XLA ops and the cast round trip would be elided — same
    rules as pallas/fused._kernel_split4), accumulated 4-pass
    smallest-first against the host-presplit operator."""
    h_refs = refs[:n_comp]
    op_ref, out_ref = refs[n_comp], refs[n_comp + 1]
    segs = refs[n_comp + 2:n_comp + 2 + n_comp]
    sem = refs[-1]
    i = pl.program_id(0)
    pad8 = _pad8(k)
    special = _dma_plans(grid_n, block, pad8, t_rows)

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    fr = None
    for c in range(n_comp):
        _load_rows(i, block, pad8, special, grid_n, h_refs[c], segs[c], sem)
        a = segs[c][...]
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
    out_ref[:, :] = _ola_rows(fr, k, block, pad8, step)


def _gemm_ola_impl(h_planes, ops, n: int, step: int, precision,
                   interpret: bool = False):
    """``overlap_add(sum_c h_planes[c] @ ops[c], step)`` without the frame
    matrix in HBM. ``h_planes``: tuple of ``(T, kpad)`` f32 arrays; ``ops``:
    ``(C, kpad, n)`` f32 (exact) or ``(C, 2, kpad, n)`` bf16 (presplit,
    ``precision="split4"``). Returns the ``(T*step + n - step,)`` signal."""
    t_rows = h_planes[0].shape[0]
    k = n // step
    pad8 = _pad8(k)
    out_rows = t_rows + k - 1
    block = min(BLOCK_ROWS, -(-out_rows // 8) * 8)
    grid_n = -(-out_rows // block)
    n_comp = len(h_planes)
    kpad = h_planes[0].shape[1]

    if precision == "split4":
        kern = functools.partial(_kernel_split4, k, block, grid_n, t_rows,
                                 step, n_comp, interpret)
        op_spec = pl.BlockSpec((n_comp, 2, kpad, n),
                               lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel, k, block, grid_n, t_rows, step,
                                 n_comp, precision)
        op_spec = pl.BlockSpec((n_comp, kpad, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_comp + [op_spec],
        out_specs=pl.BlockSpec((block, step), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * block, step), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block + pad8, kpad), jnp.float32)
            for _ in range(n_comp)
        ] + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(*h_planes, ops)
    return out[:out_rows].reshape(-1)[: t_rows * step + n - step]


gemm_ola = jax.jit(
    _gemm_ola_impl,
    static_argnames=("n", "step", "precision", "interpret"))


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
                    step, precision, interpret=interpret)


def imdct_ola(coeffs, f: int, wbytes, interpret: bool = False):
    """Fused IMDCT synthesis from frames-major coefficients ``(T, F)``:
    window-folded inverse GEMM + TDAC overlap-add in one HBM pass,
    returning the ``(T*F + F,)`` pre-trim signal (zaf.py:1159-1179
    semantics; the caller applies the reference trim)."""
    ops, precision = _dispatch_ops(_imdct_ops_padded, f, wbytes)
    return gemm_ola((coeffs,), ops, 2 * f, f, precision,
                    interpret=interpret)
