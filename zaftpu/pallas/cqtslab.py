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

BLOCK_FRAMES = 512  # frames per grid step (VMEM: seg ~3.7 MB + op slab
                    # ~1.8 MB + two f32 accumulators ~1 MB at the
                    # reference geometry step=1764, F=144)


def _f_pad(f: int) -> int:
    return -(-f // 128) * 128


def supported(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.float32


def _step128(step: int) -> int:
    return -(-step // 128) * 128


@lru_cache(maxsize=8)
def _slab_ops_host(kern_key, n_slabs: int, step: int, f_pad: int):
    """Host-side ``(2, n_slabs, step128, f_pad)`` f32 operator slabs from
    the CQT time kernel registered under ``kern_key`` (see
    :func:`register_kernel`). Rows beyond the slab width (lane padding,
    rows beyond ``fft_length``) and columns beyond F are zero — they
    multiply zero signal lanes / write ignored output lanes."""
    m_real, m_imag = _REGISTRY[kern_key]
    length, f = m_real.shape
    out = np.zeros((2, n_slabs, _step128(step), f_pad), np.float32)
    for k in range(n_slabs):
        lo = k * step
        width = min(step, length - lo)
        if width <= 0:
            break
        out[0, k, :width, :f] = m_real[lo:lo + width]
        out[1, k, :width, :f] = m_imag[lo:lo + width]
    return out


_REGISTRY: dict = {}


def register_kernel(kern_key, m_real: np.ndarray, m_imag: np.ndarray):
    """Make the (fft_length, F) float operator planes addressable by a
    hashable key so the lru-cached slab builder (and the device-constant
    pinning keyed on it) stays identity-stable."""
    _REGISTRY[kern_key] = (np.asarray(m_real, np.float32),
                           np.asarray(m_imag, np.float32))


def _kernel(n_slabs: int, block: int, precision, sig_ref, opre_ref,
            opim_ref, out_ref, seg, opbuf, acc_re, acc_im, sem_sig, sem_op):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        sig_ref.at[pl.ds(i * block, block + n_slabs), :], seg, sem_sig)
    cp.start()
    cp.wait()

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    for k in range(n_slabs):
        cpo = pltpu.make_async_copy(opre_ref.at[k], opbuf, sem_op)
        cpo.start()
        cpo.wait()
        prod = dot(seg[k:k + block, :], opbuf[...])
        if k == 0:
            acc_re[...] = prod
        else:
            acc_re[...] = acc_re[...] + prod
        cpo = pltpu.make_async_copy(opim_ref.at[k], opbuf, sem_op)
        cpo.start()
        cpo.wait()
        prod = dot(seg[k:k + block, :], opbuf[...])
        if k == 0:
            acc_im[...] = prod
        else:
            acc_im[...] = acc_im[...] + prod
    re, im = acc_re[...], acc_im[...]
    out_ref[...] = jnp.sqrt(re * re + im * im)


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
    from zaftpu.utils.devcache import pinned_device_constant

    n_slabs = -(-fft_length // step_length)
    f_pad = _f_pad(f_channels)
    ops = pinned_device_constant(
        _slab_ops_host(kern_key, n_slabs, step_length, f_pad), np.float32)
    return _cqt_magnitudes_jit(padded, ops, step_length, fft_length,
                               number_times, f_channels, block, interpret)


@functools.partial(jax.jit, static_argnames=(
    "step_length", "fft_length", "number_times", "f_channels", "block",
    "interpret"))
def _cqt_magnitudes_jit(padded, ops, step_length: int, fft_length: int,
                        number_times: int, f_channels: int,
                        block: int, interpret: bool):
    from zaftpu.core.policy import matmul_precision

    n_slabs = -(-fft_length // step_length)
    f_pad = _f_pad(f_channels)
    s128 = _step128(step_length)
    block = min(block, -(-number_times // 8) * 8)
    t_pad = block * (-(-number_times // block))
    rows = t_pad + n_slabs
    need = rows * step_length
    padded = padded[:need]
    if padded.shape[0] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[0]))
    # Lane-pad each signal row to the (8,128) tiling so the manual DMA is
    # legal under the remote Mosaic (see module docstring) — one cheap
    # device pass, zeros multiply zero operator rows.
    sig2d = jnp.pad(padded.reshape(rows, step_length),
                    ((0, 0), (0, s128 - step_length)))

    out = pl.pallas_call(
        functools.partial(_kernel, n_slabs, block, matmul_precision()),
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, f_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block + n_slabs, s128), jnp.float32),
            pltpu.VMEM((s128, f_pad), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.VMEM((block, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig2d, ops[0], ops[1])
    return out[:number_times, :f_channels]
