"""Pallas TPU kernels: full-spectrum mirror and Hermitian fold on planes.

The STFT's conjugate mirror and the ISTFT's Hermitian fold are pure data
movement, but XLA lowers their lane-dimension reversal as an HBM-scale
gather running at ~150 GB/s — 4-6 ms of the 10-min STFT/ISTFT
(docs/perf.md "STFT pipeline breakdown"). Inside a Pallas kernel the same
reversal happens on VMEM-resident tiles at register speed, so the whole
mirror costs one HBM read + one write.

Two reversal strategies, selected by ``strategy``:

* ``"rev"``  — ``lax.rev`` on the lane axis of the VMEM block (simplest;
  depends on Mosaic lowering lane reversal).
* ``"dot"``  — reverse each aligned 128-lane chunk by multiplying with the
  (128, 128) anti-identity on the MXU (chunk order flipped by static
  slicing). A permutation GEMM at ``Precision.HIGHEST`` is bit-exact: the
  anti-identity's bf16 split is exact (1.0 -> (1, 0, 0)).

Both produce bit-identical results to the XLA gather formulation in
``zaftpu.core.fft`` (gated in interpret mode by tests/test_pallas.py).
Shapes: ``n % 256 == 0`` and float32 planes, frames-major ``(T, n//2+1)``
input. Opt-in via ``ZAFTPU_MIRROR=pallas`` until proven under the remote
Mosaic compiler (the s12 probe stage measures and bit-checks on hardware).

Reference semantics: full[k] = conj(half[n - k]) for k > n/2 (zaf.py:139);
fold H_k = (Z_k + conj(Z_{(N-k) mod N})) / 2 (zaf.py:223 real-ifft chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def supported(n: int, dtype) -> bool:
    return n % 256 == 0 and dtype == jnp.float32


def _anti_identity(dtype=np.float32) -> np.ndarray:
    return np.eye(128, dtype=dtype)[:, ::-1].copy()


def _rev_lanes(block, width: int, strategy: str, r_ref):
    """Reverse the last (lane) axis of a VMEM-resident ``(rows, width)``
    value; ``width % 128 == 0``."""
    if strategy == "rev":
        return jax.lax.rev(block, (1,))
    chunks = []
    for i in range(width // 128 - 1, -1, -1):
        piece = block[:, i * 128:(i + 1) * 128]
        chunks.append(jax.lax.dot_general(
            piece, r_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=block.dtype))
    return jnp.concatenate(chunks, axis=1)


def _mirror_kernel(n: int, strategy: str, re_ref, im_ref, r_ref,
                   re_out, im_out):
    half_aligned = n // 2            # 1024 for n=2048
    re = re_ref[...]
    im = im_ref[...]
    re_out[:, :half_aligned] = re[:, :half_aligned]
    im_out[:, :half_aligned] = im[:, :half_aligned]
    # Mirror piece: [half[n/2] (Nyquist), conj bins n/2+1 .. n-1] =
    # rev(half[:, 1:n/2+1]); the imag sign is -1 everywhere except the
    # Nyquist element that leads the reversed block.
    body_re = _rev_lanes(re[:, 1:half_aligned + 1], half_aligned, strategy,
                         r_ref)
    body_im = _rev_lanes(im[:, 1:half_aligned + 1], half_aligned, strategy,
                         r_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, body_im.shape, 1)
    sign = jnp.where(lane == 0, jnp.float32(1.0), jnp.float32(-1.0))
    re_out[:, half_aligned:] = body_re
    im_out[:, half_aligned:] = body_im * sign


@functools.partial(jax.jit,
                   static_argnames=("n", "strategy", "interpret"))
def mirror_full_planes(re_half, im_half, n: int, strategy: str = "rev",
                       interpret: bool = False):
    """``(T, n//2+1)`` rfft planes -> ``(T, n)`` full-spectrum planes
    (re, im), single HBM pass each."""
    t = re_half.shape[0]
    block = min(BLOCK_ROWS, -(-t // 8) * 8)
    t_pad = block * (-(-t // block))
    if t_pad != t:
        pad = [(0, t_pad - t), (0, 0)]
        re_half = jnp.pad(re_half, pad)
        im_half = jnp.pad(im_half, pad)
    half = n // 2 + 1
    r_mat = jnp.asarray(_anti_identity())
    re_out, im_out = pl.pallas_call(
        functools.partial(_mirror_kernel, n, strategy),
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec((block, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, n), re_half.dtype),
                   jax.ShapeDtypeStruct((t_pad, n), im_half.dtype)],
        interpret=interpret,
    )(re_half, im_half, r_mat)
    return re_out[:t], im_out[:t]


def _fold_kernel(n: int, strategy: str, zr_ref, zi_ref, r_ref,
                 hr_out, hi_out):
    ha = n // 2  # 1024 for n = 2048
    zr = zr_ref[...]
    zi = zi_ref[...]
    # Partner bins for k = 1..n/2 are (n-k) = n-1 .. n/2, i.e. the reversed
    # upper half; the k = 0 partner is bin 0 itself (hi[0] folds to 0).
    rev_r = _rev_lanes(zr[:, ha:], ha, strategy, r_ref)
    rev_i = _rev_lanes(zi[:, ha:], ha, strategy, r_ref)
    hr_out[...] = jnp.concatenate(
        [zr[:, :1], 0.5 * (zr[:, 1:ha + 1] + rev_r)], axis=1)
    hi_out[...] = jnp.concatenate(
        [jnp.zeros_like(zi[:, :1]), 0.5 * (zi[:, 1:ha + 1] - rev_i)], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("n", "strategy", "interpret"))
def fold_half_planes(zr, zi, n: int, strategy: str = "rev",
                     interpret: bool = False):
    """Hermitian fold on ``(T, n)`` full-spectrum planes ->
    ``(T, n//2+1)`` folded planes (hr, hi) for the inverse GEMMs."""
    t = zr.shape[0]
    block = min(BLOCK_ROWS, -(-t // 8) * 8)
    t_pad = block * (-(-t // block))
    if t_pad != t:
        pad = [(0, t_pad - t), (0, 0)]
        zr = jnp.pad(zr, pad)
        zi = jnp.pad(zi, pad)
    half = n // 2 + 1
    r_mat = jnp.asarray(_anti_identity())
    hr, hi = pl.pallas_call(
        functools.partial(_fold_kernel, n, strategy),
        grid=(t_pad // block,),
        in_specs=[
            pl.BlockSpec((block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, half), zr.dtype),
                   jax.ShapeDtypeStruct((t_pad, half), zi.dtype)],
        interpret=interpret,
    )(zr, zi, r_mat)
    return hr[:t], hi[:t]
