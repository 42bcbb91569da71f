"""Pallas TPU kernel: fused slab CQT — signal block -> |CQT| magnitudes.

The XLA f32 slab path (zaftpu.transforms.cqt._blocked_matmul_impl) re-reads
each hop-width signal slab from HBM for every GEMM, and the exact-path
HIGHEST decomposition re-streams those f32 activations per MXU pass — the
measured bound on the f32 CQT (784k frames/s at block 1024 vs 2.02M under
one-pass bf16; docs/tpu_results/cqt_roofline.json). This kernel holds one
signal segment in VMEM and accumulates all ``n_slabs`` slab GEMMs against
DMA-streamed operator slabs, so the signal is read from HBM ONCE per block
(~19x less signal traffic at the reference CQT geometry) and the multi-pass
precision decomposition re-reads VMEM, not HBM.

Per grid step i (1-D grid over frame blocks — the only grid shape the
remote Mosaic accepts, see pallas/fused.py):

  seg <- DMA sig2d rows [i*B, i*B + B + n_slabs)      # (B+S, step) VMEM
  acc_re = acc_im = 0
  for k in 0..n_slabs-1:
      opbuf <- DMA op_re[k]; acc_re += seg[k:k+B] @ opbuf
      opbuf <- DMA op_im[k]; acc_im += seg[k:k+B] @ opbuf
  out[i] = sqrt(acc_re^2 + acc_im^2)

Same accumulation order (k ascending, left-associated, starting from the
first product) as the XLA slab loop, so values match to the dot
implementation's rounding.

Alignment: the reference hop (1764) is NOT lane-aligned, and the remote
Mosaic rejects DMAs whose minor dim mismatches the (8,128) tiling (the
construct bisect docs/tpu_results/cqtslab_bisect.json: ``dma_unaligned``
and ``acc_loop`` fail with tiled-memref shape errors while unaligned dots
and row-shifted VMEM slices pass). Both DMA'd operands are therefore
lane-padded to ``step128 = ceil(step/128)*128``: the signal rows gain
zero lanes, the operator slabs gain matching zero rows — the extra
products are exact zeros, so values are unchanged.

Reference semantics: zaf.py:627-633 (per-frame FFT x spectral kernel, here
folded to the time-domain operator as in transforms/cqt.py).
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_FRAMES = 512  # frames per grid step (the dbuf kernel needs ~21.5M
                    # scoped VMEM at 512 — granted by the raised-budget
                    # jit twin; block_for_budget() drops to 256 when the
                    # budget cannot be raised, e.g. under a user's outer jit)


def block_for_budget() -> int:
    """Grid block for the current scoped-VMEM budget: 512 when the
    raised-budget dispatch twin is active (or off-TPU, where no scoped
    stack exists), else 256 — which fits the default 16 MiB budget, so a
    slab-CQT inlined into a user's outer ``jax.jit`` (where nested
    compiler_options are forbidden) still compiles (ADVICE round 4,
    medium/low)."""
    import jax

    from zaftpu.core.dispatch import budget_raised

    if jax.default_backend() != "tpu" or budget_raised():
        return BLOCK_FRAMES
    return 256


def _f_pad(f: int) -> int:
    return -(-f // 128) * 128


def supported(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32


def _step128(step: int) -> int:
    return -(-step // 128) * 128


def _read_rows(block: int, n_slabs: int) -> int:
    """Signal rows DMA'd per grid step: ``block + n_slabs - 1`` needed,
    rounded up to the (8, 128) tiling — Mosaic rejects slices whose major
    dim is not 8-aligned ("Slice shape along dimension 0 must be aligned
    to tiling (8)")."""
    return -(-(block + n_slabs) // 8) * 8


@lru_cache(maxsize=8)
def _slab_ops_host(kern_key, n_slabs: int, step: int, f_pad: int):
    """Host-side ``(n_slabs, 2, step128, f_pad)`` f32 operator slabs from
    the CQT time kernel registered under ``kern_key`` (see
    :func:`register_kernel`) — slab-major so each slab's (re, im) pair is
    one contiguous DMA. Rows beyond the slab width (lane padding, rows
    beyond ``fft_length``) and columns beyond F are zero — they multiply
    zero signal lanes / write ignored output lanes."""
    m_real, m_imag = _REGISTRY[kern_key]
    length, f = m_real.shape
    out = np.zeros((n_slabs, 2, _step128(step), f_pad), np.float32)
    for k in range(n_slabs):
        lo = k * step
        width = min(step, length - lo)
        if width <= 0:
            break
        out[k, 0, :width, :f] = m_real[lo:lo + width]
        out[k, 1, :width, :f] = m_imag[lo:lo + width]
    return out


@lru_cache(maxsize=8)
def _slab_ops_host_split(kern_key, n_slabs: int, step: int, f_pad: int):
    """Host-presplit bf16 (hi, lo) slab stack ``(n_slabs, 2comp, 2hl,
    step128, f_pad)`` for the in-kernel 4-pass split4 scheme — same DMA
    bytes per slab as the f32 stack (bf16 halves x 2 planes)."""
    import ml_dtypes

    ops = _slab_ops_host(kern_key, n_slabs, step, f_pad)
    out = np.zeros(ops.shape[:2] + (2,) + ops.shape[2:], ml_dtypes.bfloat16)
    for k in range(ops.shape[0]):
        for c in range(2):
            m = ops[k, c]
            hi = m.astype(ml_dtypes.bfloat16)
            out[k, c, 0] = hi
            out[k, c, 1] = (m - hi.astype(np.float32)).astype(
                ml_dtypes.bfloat16)
    return out


_REGISTRY: dict = {}
_REGISTRY_LIMIT = 8  # FIFO bound: registering pins ~37 MB of host operator
                     # per kernel; evicting also invalidates the lru-cached
                     # slab builders keyed on the evicted key (test/probe
                     # surface only — production CQT uses slab_ops_traced)


def register_kernel(kern_key, m_real: np.ndarray, m_imag: np.ndarray):
    """Make the (fft_length, F) float operator planes addressable by a
    hashable key so the lru-cached slab builder (and the device-constant
    pinning keyed on it) stays identity-stable. FIFO-bounded at
    :data:`_REGISTRY_LIMIT` entries (ADVICE round 4, low #5)."""
    if kern_key in _REGISTRY:
        # Re-registering a key with (possibly) new planes must invalidate
        # the lru-cached slabs built from the old ones — and needs no
        # eviction, the dict does not grow.
        _REGISTRY.pop(kern_key)
        _slab_ops_host.cache_clear()
        _slab_ops_host_split.cache_clear()
    while len(_REGISTRY) >= _REGISTRY_LIMIT:
        _REGISTRY.pop(next(iter(_REGISTRY)))
        _slab_ops_host.cache_clear()
        _slab_ops_host_split.cache_clear()
    _REGISTRY[kern_key] = (np.asarray(m_real, np.float32),
                           np.asarray(m_imag, np.float32))


def _kernel(n_slabs: int, block: int, precision, sig_ref, ops_ref,
            out_ref, seg, opbuf, acc_re, acc_im, sem_sig, sem_op):
    """Double-buffered slab loop: slab k+1's (re, im) operator pair streams
    in ONE DMA while slab k's two dots run on the MXU. The first cut
    instead issued 2 synchronous DMAs per slab (38 per block) and measured
    613k frames/s — SLOWER than the XLA slab loop; the per-DMA latency was
    the bound, not bandwidth. Slots/semaphores are Python-unrolled statics
    (no pl.when)."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, _read_rows(block, n_slabs)), :], seg,
        sem_sig)
    cp.start()

    def copy_slab(k, slot):
        return pltpu.make_async_copy(ops_ref.at[k], opbuf.at[slot],
                                     sem_op.at[slot])

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    copy_slab(0, 0).start()
    cp.wait()
    for k in range(n_slabs):
        slot = k % 2
        if k + 1 < n_slabs:
            copy_slab(k + 1, 1 - slot).start()
        copy_slab(k, slot).wait()
        a = seg[k:k + block, :]
        pr = dot(a, opbuf[slot, 0])
        pi = dot(a, opbuf[slot, 1])
        if k == 0:
            acc_re[...] = pr
            acc_im[...] = pi
        else:
            acc_re[...] = acc_re[...] + pr
            acc_im[...] = acc_im[...] + pi
    re, im = acc_re[...], acc_im[...]
    out_ref[...] = jnp.sqrt(re * re + im * im)


def _kernel_split4(n_slabs: int, block: int, use_reduce_precision: bool,
                   sig_ref, ops_ref, out_ref, seg, opbuf, acc_re, acc_im,
                   sem_sig, sem_op):
    """split4 twin: the manual 4-pass bf16-split scheme in VMEM. Per slab:
    split the signal slice into an exact bf16 (hi, lo) pair (cast round
    trip on Mosaic — reduce_precision has no Pallas TPU lowering, and the
    XLA excess-precision elision does NOT apply in-kernel; interpret mode
    needs reduce_precision, same rules as pallas/fused._kernel_split4) and
    accumulate the four bf16xbf16->f32 products smallest-first against the
    host-presplit operator pair. 8 single-pass dots per slab (2 components
    x 4) vs HIGHEST's 12 pass-equivalents — the f32 CQT is MXU-pass-bound
    (docs/perf.md round 4), so this is the split4 dial's ~1.5x."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, _read_rows(block, n_slabs)), :], seg,
        sem_sig)
    cp.start()

    def copy_slab(k, slot):
        return pltpu.make_async_copy(ops_ref.at[k], opbuf.at[slot],
                                     sem_op.at[slot])

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    copy_slab(0, 0).start()
    cp.wait()
    for k in range(n_slabs):
        slot = k % 2
        if k + 1 < n_slabs:
            copy_slab(k + 1, 1 - slot).start()
        copy_slab(k, slot).wait()
        a = seg[k:k + block, :]
        if use_reduce_precision:
            hi = jax.lax.reduce_precision(a, exponent_bits=8,
                                          mantissa_bits=7)
            ah = hi.astype(jnp.bfloat16)
            al = (a - hi).astype(jnp.bfloat16)
        else:
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        for comp, acc in ((0, acc_re), (1, acc_im)):
            bh, bl = opbuf[slot, comp, 0], opbuf[slot, comp, 1]
            prod = ((mm(al, bl) + mm(al, bh)) + mm(ah, bl)) + mm(ah, bh)
            if k == 0:
                acc[...] = prod
            else:
                acc[...] = acc[...] + prod
    re, im = acc_re[...], acc_im[...]
    out_ref[...] = jnp.sqrt(re * re + im * im)


def slab_ops_traced(m_real, m_imag, step: int, fft_length: int,
                    f_channels: int, split4: bool | None = None):
    """The slab-operator stack built IN-TRACE from the device-resident
    (fft_length, F) planes — ``(n_slabs, 2, step128, f_pad)`` f32, or the
    host-presplit-equivalent bf16 ``(n_slabs, 2, 2, step128, f_pad)`` when
    the split4 scheme is selected (``split4`` argument; defaults to the
    global dial — the CQT passes its transform-local scheme,
    transforms/cqt._slab_scheme_split4). The split uses
    ``lax.reduce_precision`` — exact same values as the host split; this
    runs as XLA ops, where the cast-round-trip elision applies, so
    reduce_precision is mandatory. ~0.1 ms of elementwise work per call at
    the reference geometry — noise next to the GEMMs."""
    from zaftpu.core.policy import split4_enabled

    if split4 is None:
        split4 = split4_enabled()
    n_slabs = -(-fft_length // step)
    f_pad = _f_pad(f_channels)
    s128 = _step128(step)

    def prep(m):
        m2 = jnp.pad(m, ((0, n_slabs * step - fft_length),
                         (0, f_pad - m.shape[-1])))
        return jnp.pad(m2.reshape(n_slabs, step, f_pad),
                       ((0, 0), (0, s128 - step), (0, 0)))

    ops = jnp.stack([prep(m_real), prep(m_imag)], axis=1)
    if split4:
        hi = jax.lax.reduce_precision(ops, exponent_bits=8, mantissa_bits=7)
        ops = jnp.stack([hi, ops - hi], axis=2).astype(jnp.bfloat16)
    return ops


def magnitudes_in_trace(padded, ops, step_length: int, fft_length: int,
                        number_times: int, f_channels: int,
                        block: int = BLOCK_FRAMES, interpret: bool = False):
    """The pallas_call section, callable inside an existing trace (the
    production CQT dispatch / sharded bodies). The caller's top-level zjit
    provides the raised scoped-VMEM budget via the dispatch twin
    (core/dispatch._wants_scoped_vmem) — the block-512 kernel needs ~21.5M
    of scoped stack."""
    from zaftpu.core.policy import matmul_precision

    n_slabs = -(-fft_length // step_length)
    f_pad = _f_pad(f_channels)
    s128 = _step128(step_length)
    block = min(block, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    rows = t_pad - block + _read_rows(block, n_slabs)
    need = rows * step_length
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    sig2d = jnp.pad(padded.reshape(rows, step_length),
                    ((0, 0), (0, s128 - step_length)))

    if ops.dtype == jnp.bfloat16:
        kern = functools.partial(_kernel_split4, n_slabs, block, interpret)
        op_scratch = pltpu.VMEM((2, 2, 2, s128, f_pad), jnp.bfloat16)
    else:
        kern = functools.partial(_kernel, n_slabs, block,
                                 matmul_precision())
        op_scratch = pltpu.VMEM((2, 2, s128, f_pad), jnp.float32)
    out = pl.pallas_call(
        kern,
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_read_rows(block, n_slabs), s128), jnp.float32),
            op_scratch,
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sig2d, ops)
    return out[:number_times, :f_channels]


def cqt_magnitudes(padded, kern_key, step_length: int, fft_length: int,
                   number_times: int, f_channels: int,
                   block: int = BLOCK_FRAMES, interpret: bool = False):
    """Fused magnitude CQT ``(number_times, f_channels)`` of a padded 1-D
    float32 signal (frames-major; the caller transposes/folds octaves).

    ``padded`` must hold the centering pad; the tail is zero-extended here
    to whole signal rows. The operator must be registered under
    ``kern_key`` (:func:`register_kernel`). The slab-operator upload
    happens OUTSIDE the jitted program (a pinned device constant) so it is
    never embedded as an HLO constant.
    """
    from zaftpu.core.policy import split4_enabled
    from zaftpu.utils.devcache import _tracing_active, pinned_device_constant

    n_slabs = -(-fft_length // step_length)
    f_pad = _f_pad(f_channels)
    if split4_enabled():
        ops = pinned_device_constant(
            _slab_ops_host_split(kern_key, n_slabs, step_length, f_pad),
            jnp.bfloat16)
    else:
        ops = pinned_device_constant(
            _slab_ops_host(kern_key, n_slabs, step_length, f_pad),
            np.float32)
    # Raised scoped-VMEM budget on the TOP-LEVEL jit (the block-512 kernel
    # needs ~21.5M of scoped stack vs the 16M default — same XLA layout
    # behavior as the split4 fused kernel, see core/dispatch.py). Under an
    # outer trace compiler_options are illegal; the plain twin inlines
    # there and the block drops to 256, which fits the default budget.
    use_vmem = (jax.default_backend() == "tpu" and not _tracing_active()
                and not interpret)
    if not use_vmem and jax.default_backend() == "tpu":
        block = min(block, 256)
    fn = _cqt_jit_vmem if use_vmem else _cqt_jit_plain
    return fn(padded, ops, step_length, fft_length, number_times,
              f_channels, block, interpret)


def _cqt_magnitudes_body(padded, ops, step_length: int, fft_length: int,
                         number_times: int, f_channels: int,
                         block: int, interpret: bool):
    return magnitudes_in_trace(padded, ops, step_length, fft_length,
                               number_times, f_channels, block, interpret)


def _cqt_magnitudes_body_vmem(padded, ops, step_length, fft_length,
                              number_times, f_channels, block, interpret):
    """Distinct function identity for the compiler-options jit twin (jit
    objects over the same function share trace caches)."""
    return _cqt_magnitudes_body(padded, ops, step_length, fft_length,
                                number_times, f_channels, block, interpret)


_STATICS = ("step_length", "fft_length", "number_times", "f_channels",
            "block", "interpret")
_cqt_jit_plain = jax.jit(_cqt_magnitudes_body, static_argnames=_STATICS)
# 24576 KiB, matching the dispatch twin: block 512 needs ~21.5M and larger
# budgets steal XLA pipelining VMEM (measured -12% on other kernels at
# 32768 — docs/perf.md round 5; production CQT rides the zjit twin at the
# same value, 1.17M frames/s).
_cqt_jit_vmem = jax.jit(
    _cqt_magnitudes_body_vmem, static_argnames=_STATICS,
    compiler_options={"xla_tpu_scoped_vmem_limit_kib": "24576"})
