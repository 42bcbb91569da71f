"""Dispatch-coherent jit: trace caches keyed on the ZAFTPU flag snapshot.

Every transform's device program is shaped at *trace time* by the
``ZAFTPU_*`` environment flags (FFT engine selection, matmul precision,
Pallas kernel dispatch, mirror strategy) and by the
:func:`zaftpu.core.policy.compute_dtype` context. A bare ``jax.jit`` caches
traces by shapes/statics only, so flipping a flag after a shape has been
seen would silently reuse the stale program — an A/B in a notebook would
report right numbers under wrong labels (VERDICT.md round 2, weak #4).

:func:`zjit` fixes this structurally: the wrapped function gains a
keyword-only ``_dispatch`` **static argument** and every call passes the
current :class:`zaftpu.config.DispatchConfig` snapshot. A flag flip changes
the static value, so the first call after the flip retraces with the new
dispatch; flipping *back* reuses the earlier still-warm trace — an A/B loop
pays two compiles total, not one per flip.

(The snapshot must be a true static argument: two ``jax.jit`` objects over
the same Python function share their underlying trace cache, so keying a
table of jit instances on the snapshot does NOT isolate traces — measured
here before this design was adopted.)
"""

from __future__ import annotations

import functools
import inspect

import jax

from zaftpu.config import DispatchConfig


def zjit(fn=None, *, static_argnames=()):
    """``jax.jit`` whose trace cache is additionally keyed on the current
    :class:`~zaftpu.config.DispatchConfig` snapshot.

    Drop-in for ``jax.jit``/``partial(jax.jit, static_argnames=...)`` at
    every jit boundary whose trace consults a ``ZAFTPU_*`` flag (directly or
    through :mod:`zaftpu.core.fft` / :mod:`zaftpu.core.policy` /
    :mod:`zaftpu.pallas`).
    """
    if fn is None:
        return functools.partial(zjit, static_argnames=static_argnames)

    def shim(*args, _dispatch=None, **kwargs):
        return fn(*args, **kwargs)

    # jax.jit resolves static_argnames against inspect.signature(fun); give
    # the shim the wrapped function's signature plus the keyword-only
    # ``_dispatch`` slot so positional statics (e.g. step_length) still bind.
    sig = inspect.signature(fn)
    shim.__signature__ = sig.replace(parameters=[
        *sig.parameters.values(),
        inspect.Parameter("_dispatch", inspect.Parameter.KEYWORD_ONLY,
                          default=None),
    ])
    shim.__name__ = getattr(fn, "__name__", "zjit_fn")

    # Second shim with its own identity: jit objects over the SAME function
    # share trace caches (see module docstring), so the compiler-options
    # twin below needs a distinct wrapped callable.
    def shim_vmem(*args, _dispatch=None, **kwargs):
        return fn(*args, **kwargs)

    shim_vmem.__signature__ = shim.__signature__
    shim_vmem.__name__ = shim.__name__

    statics = tuple(static_argnames) + ("_dispatch",)
    jitted = jax.jit(shim, static_argnames=statics)
    # TPU twin with a raised scoped-VMEM budget: XLA's layout assignment
    # stages pallas buffers in scoped VMEM for a window of grid lengths and
    # OOMs its 16 MiB stack when the split4 fused kernel is in the program
    # (t=8192/12800/25841 at WL=2048 failed, 1024/4096/19200 passed —
    # docs/tpu_results/split4_grid.json; this was round 3's "Mosaic 500").
    # compiler_options are only legal on a TOP-LEVEL jit, hence here and
    # not on the inner pallas jit.
    jitted_vmem = jax.jit(
        shim_vmem, static_argnames=statics,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "24576"})

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        j = jitted_vmem if _wants_scoped_vmem() else jitted
        return j(*args, _dispatch=DispatchConfig.current(), **kwargs)

    wrapper._zjit = jitted  # test/introspection hook
    wrapper._cache_size = jitted._cache_size  # jax.jit API passthrough
    return wrapper


def _wants_scoped_vmem() -> bool:
    """Route this call through the raised-scoped-VMEM jit twin?

    True exactly when the split4 fused kernel can enter the trace (the one
    construct measured to overflow XLA's default 16 MiB scoped-VMEM stack)
    AND this call is the top-level jit — under an outer trace the nested
    jit inlines and JAX forbids compiler_options on it; the outer program
    then simply lacks the bump, and a scoped-VMEM OOM there is caught by
    the guarded Pallas fallback."""
    from zaftpu.utils.devcache import _tracing_active

    if _tracing_active():
        return False
    if jax.default_backend() != "tpu":
        return False
    from zaftpu import pallas as _pallas
    from zaftpu.core.policy import split4_enabled

    # Both split4 Pallas consumers need the budget: the fused analysis
    # kernel (~19.7M scoped) and the slab-CQT kernel (~21.5M at block 512),
    # which dispatches regardless of ZAFTPU_FUSED.
    return split4_enabled() and _pallas.enabled()
