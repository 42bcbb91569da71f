"""Pallas TPU kernels and their dispatch policy.

Kernels are used automatically when running on TPU with aligned shapes
(``step % 128 == 0``, ``window_length % step == 0``, float32) and fall back
to the equivalent XLA programs otherwise. Override with ``ZAFTPU_PALLAS=1``
(force, e.g. interpret-mode debugging) or ``ZAFTPU_PALLAS=0`` (disable).

Safety: kernel dispatch is *self-healing*. Public transforms are wrapped in
:func:`guarded` — if a device program containing a Pallas kernel fails (a
Mosaic compile failure is the most fragile stage on a new backend), the
kernels are marked broken for the process, jit caches are cleared, and the
call retries once on the pure-XLA paths. A Mosaic regression can therefore
never break default TPU use (VERDICT.md round 1, item 3).
"""

from __future__ import annotations

import functools
import os
import warnings

import jax
import jax.numpy as jnp

from zaftpu.core import frame as _xla_frame
from zaftpu.pallas import framing as _framing
from zaftpu.pallas import ola as _ola

_broken = False


def enabled() -> bool:
    if _broken:
        return False
    env = os.environ.get("ZAFTPU_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def fused_enabled() -> bool:
    """Is the fused framing+window+DFT kernel dispatch active?

    ``ZAFTPU_FUSED``: ``auto`` (default — on when running on a real TPU
    backend) / ``1`` (force, e.g. interpret-mode testing off-TPU) / ``0``
    (disable, the A/B lever). Hardware-proven 2026-08-20: the 1-D-grid
    reformulation compiles under the tunnel's Mosaic and runs at full
    accuracy in both precision modes (HIGHEST relerr 3.5e-7, in-kernel
    split4 2.9e-6). Every earlier "rejection" of this kernel was the
    complex-FETCH tunnel bug — the probes fetched the complex64 result
    with np.asarray, which UNIMPLEMENTEDs on this tunnel regardless of
    what computed it; plane fetches prove the kernel fine.

    Auto stays TPU-backend-only — NOT merely ``enabled()`` — so CPU test
    runs that force ``ZAFTPU_PALLAS=1`` for the framing/OLA kernels don't
    route into a non-interpret ``pallas_call`` the CPU backend rejects."""
    env = os.environ.get("ZAFTPU_FUSED", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() == "tpu"


def mark_broken(reason: Exception | str = "") -> None:
    """Disable the Pallas kernels for the rest of the process and clear jit
    caches so every transform retraces onto the XLA paths."""
    global _broken
    _broken = True
    warnings.warn(
        f"zaftpu: Pallas kernel path failed ({str(reason)[:200]}); "
        "falling back to pure-XLA programs for this process "
        "(set ZAFTPU_PALLAS=0 to silence)", RuntimeWarning, stacklevel=2)
    jax.clear_caches()


def _reset_health() -> None:
    """Test hook: forget a previous mark_broken."""
    global _broken
    _broken = False


def guarded(fn):
    """Decorator for public transforms: retry once on pure-XLA paths if a
    program containing a Pallas kernel fails to compile or run. User errors
    (ValueError/TypeError from validation) propagate untouched.

    The broken latch only sticks when the XLA retry *succeeds* — that is
    evidence the Pallas path specifically is at fault. If both paths fail
    (a wedged tunnel, transient UNIMPLEMENTED, OOM from an oversized
    input), the kernels were never the problem and the latch is released so
    a one-shot backend error cannot silently cost the process its fast
    path forever."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (ValueError, TypeError, KeyboardInterrupt):
            raise
        except Exception as exc:  # noqa: BLE001 — any backend/compile error
            if not enabled():
                raise
            mark_broken(exc)
            try:
                return fn(*args, **kwargs)
            except (ValueError, TypeError, KeyboardInterrupt):
                raise
            except Exception:
                _reset_health()  # both paths failed: not a Pallas fault
                jax.clear_caches()
                raise
    return wrapper


def windowed_frames(padded, window, window_length: int, step: int,
                    number_times: int):
    """Windowed overlapped frames — Pallas single-pass kernel when eligible,
    else the XLA slice-view path. 1-D signals only hit the kernel; batched
    inputs use XLA (which vectorizes the same program)."""
    if (enabled() and padded.ndim == 1
            and _framing.supported(window_length, step, padded.dtype)):
        return _framing.frame_window(padded, window, window_length, step,
                                     number_times)
    frames = _xla_frame.extract_frames(padded, window_length, step,
                                       number_times)
    return frames * window.astype(frames.dtype)


def windowed_frames_rfft(padded, window, window_length: int, step: int,
                         number_times: int):
    """Windowed overlapped frames -> rfft half-spectrum ``(T, WL//2+1)``.

    When the fused dispatch is active (:func:`fused_enabled` — default ON
    on a real TPU backend), the direct-GEMM engine covers ``WL`` and the
    shapes are kernel-aligned, this runs the fully fused Pallas kernel
    (framing + window + DFT GEMM in VMEM — the frame matrix never touches
    HBM); otherwise the split framing-then-rfft path, which itself follows
    the engine dispatch. The round-2 kernel was rejected by the tunnel's
    remote Mosaic compiler (2-D grids, docs/tpu_results/fused_probe.json);
    the round-3 reformulation stays inside the proven feature set (1-D grid
    per operator component — see pallas/fused.py) and is hardware-proven
    (stft_engines round 3: +16% STFT at equal SNR class)."""
    from zaftpu.core import fft as _fft
    from zaftpu.pallas import fused as _fused

    # split4 runs the fused kernel too since round 4: the "Mosaic 500 at
    # production grid lengths" that forced the round-3 exclusion was an
    # XLA scoped-VMEM layout OOM in a window of t_pad sizes, not a Mosaic
    # construct — fixed by the raised per-compile scoped-vmem budget in
    # core/dispatch.zjit's twin (root cause + walk in
    # docs/tpu_results/split4_grid.json; hardware-verified at t=8192/
    # 12800/25841, relerr <= 3.0e-6, 2.18M frames/s half-spectrum at 10-min
    # scale). Under a USER's outer jit the budget bump cannot apply
    # (nested compiler_options are forbidden) and the split4 kernel would
    # OOM the default scoped stack at those grid lengths OUTSIDE the
    # guarded() wrapper's reach — skip it there (ADVICE round 4, medium;
    # the non-split4 kernel fits the default budget, proven round 3).
    if (enabled() and fused_enabled()
            and padded.ndim == 1
            and _fft.direct_engine_enabled(window_length)
            and _fused.supported(window_length, step, padded.dtype)
            and _fused.budget_ok()):
        return _fused.frames_rfft(padded, window, window_length, step,
                                  number_times)
    frames = windowed_frames(padded, window, window_length, step,
                             number_times)
    return _fft.rfft(frames)


def windowed_frames_rfft_fullspec(padded, window, window_length: int,
                                  step: int, number_times: int):
    """Fused framing + window + DFT with IN-KERNEL mirrored full-spectrum
    emission: returns the ``(re, im)`` ``(T, WL)`` planes, or ``None`` when
    the dispatch is ineligible (the caller then runs the half-spectrum
    kernel + the XLA gather mirror). Bit-identical to that composition —
    the mirrored lanes are copies/negations of the same dot outputs
    (pallas/fused._mirror_epilogue; VERDICT round 4 item 5)."""
    from zaftpu.core import fft as _fft
    from zaftpu.pallas import fused as _fused

    if (enabled() and fused_enabled() and _fused.fullspec_enabled()
            and padded.ndim == 1
            and _fft.direct_engine_enabled(window_length)
            and _fused.supported(window_length, step, padded.dtype)
            and _fused.budget_ok()):
        return _fused.frames_rfft_full(padded, window, window_length, step,
                                       number_times)
    return None


def overlap_add(frames, step: int):
    """Overlap-add — Pallas one-write-pass kernel when eligible, else the
    XLA K-shifted-view accumulation."""
    wl = frames.shape[-1]
    if (enabled() and frames.ndim == 2 and frames.dtype == jnp.float32
            and _framing.supported(wl, step, frames.dtype)):
        return _ola.overlap_add(frames, step)
    return _xla_frame.overlap_add(frames, step)


def synth_kernel_wanted(n: int, step: int, dtype, ndim: int) -> bool:
    """ISTFT-shaped eligibility for the fused inverse-GEMM+OLA synthesis
    kernel (two components, contraction over the folded half spectrum) —
    see :func:`zaftpu.pallas.synth.kernel_wanted`."""
    from zaftpu.pallas import synth as _synth

    return _synth.kernel_wanted(n, step, dtype, ndim, 2,
                                _synth._kpad(n // 2 + 1))


def synthesis_ola(spectra, step: int, gain: float = 1.0):
    """Synthesis back end from *bins-major* spectra ``(..., N, T)``:
    ``overlap_add(real_ifft(spectraᵀ), step) / gain``.

    On the direct-GEMM engine path the COLA gain division folds into the
    host-precomputed inverse operator columns
    (:func:`zaftpu.core.fft.direct_real_ifft` ``scale`` — kills the
    post-OLA elementwise pass); the transpose + lane-gather fold layout is
    the measured-faster formulation (the bins-major major-axis fold
    measured 8% slower on the chip, docs/tpu_results/stft_breakdown.json
    round 3). When the fused synthesis kernel is eligible
    (:func:`synth_kernel_wanted`) the inverse GEMM and the overlap-add run
    as ONE Pallas pass — the frame matrix never touches HBM
    (pallas/synth.py; VERDICT round 4 item 3). Off the engine path:
    real_ifft + OLA + post-division."""
    import os as _os

    from zaftpu.core import fft as _fft

    n = spectra.shape[-2]
    if _fft.direct_engine_enabled(n):
        from zaftpu.pallas import synth as _synth_mod

        fm = jnp.swapaxes(spectra, -1, -2)
        if (synth_kernel_wanted(n, step, jnp.real(fm).dtype, fm.ndim)
                and _synth_mod.istft_kernel_preferred()
                and _os.environ.get("ZAFTPU_MIRROR") != "pallas"):
            from zaftpu.pallas import synth as _synth

            h_re, h_im = _fft.hermitian_fold_planes(jnp.real(fm),
                                                    jnp.imag(fm), n)
            return _synth.istft_ola(h_re, h_im, n, step, 1.0 / gain)
        frames = _fft.direct_real_ifft(fm, scale=1.0 / gain)
        return overlap_add(frames, step)
    frames = _fft.real_ifft(jnp.swapaxes(spectra, -1, -2))
    out = overlap_add(frames, step)
    if gain != 1.0:
        out = out / jnp.asarray(gain, dtype=out.dtype)
    return out
