"""Device-resident cache for operator constants.

Transform wrappers receive host-side constants (windows, twiddle vectors,
filterbanks, the ~37 MB folded CQT kernel). Converting them with
``jnp.asarray`` on every call uploads them to the device every call — fatal
on remote-tunnel deployments where each transfer costs a network round trip,
and wasteful everywhere. :func:`device_constant` memoizes the device copy:

* small arrays (< 2 MB) are keyed by a content hash — safe even if the
  caller mutates or rebuilds the host array;
* large arrays are keyed by object identity (with the host reference pinned
  so the id stays valid) — used only for the framework's own immutable
  precomputes (CQT kernels), never for caller-owned data.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

_CONTENT_LIMIT = 2 * 1024 * 1024
_MAX_ENTRIES = 256  # FIFO-bounded: <=256 x <2MB caps device-side growth
_cache: dict = {}


def _upload(host: np.ndarray):
    """``jnp.asarray`` with complex arrays shipped as real/imag pairs and
    combined on device. Complex host<->device transfers fail with
    UNIMPLEMENTED through the axon TPU tunnel (diagnosed 2026-08-17,
    docs/tpu_results/diag.json: complex compute is fine, complex transfer in
    either direction is not), and a complex constant embedded in HLO can
    poison the process the same way. Two real transfers plus an on-device
    ``lax.complex`` sidestep both — and are a no-op-cost path everywhere
    else."""
    import jax

    if np.iscomplexobj(host):
        re = jnp.asarray(np.ascontiguousarray(host.real))
        im = jnp.asarray(np.ascontiguousarray(host.imag))
        return jax.lax.complex(re, im)
    return jnp.asarray(host)


def _tracing_active() -> bool:
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except (ImportError, AttributeError):  # pragma: no cover - version drift
        import jax

        # Fallback: creating an array under an active trace yields a Tracer.
        return isinstance(jnp.zeros(()), jax.core.Tracer)


def device_constant(array, dtype=None):
    """A cached on-device copy of ``array`` (optionally cast to ``dtype``).

    Only arrays under 2 MB are cached (content-keyed, so caller mutation or
    rebuilding is always safe); larger caller-owned arrays upload fresh each
    call — identity-keyed pinning of big operators is handled by the modules
    that own them (e.g. the CQT kernel cache), never here. Inside an active
    trace (a transform wrapper called from a user's jit), caching would
    capture tracers — the array is embedded as a plain trace constant
    instead.
    """
    host = np.asarray(array)
    want = np.dtype(dtype) if dtype is not None else host.dtype
    if _tracing_active() or host.nbytes >= _CONTENT_LIMIT:
        return _upload(host.astype(want) if want != host.dtype else host)
    digest = hashlib.md5(host.tobytes()).hexdigest()
    key = ("content", digest, host.shape, str(host.dtype), str(want))
    hit = _cache.get(key)
    if hit is not None:
        return hit[1]
    dev = _upload(host.astype(want) if want != host.dtype else host)
    while len(_cache) >= _MAX_ENTRIES:
        # FIFO eviction (dict preserves insertion order): a long-lived
        # process cycling many distinct windows/filterbanks must not grow
        # host+device memory without bound.
        _cache.pop(next(iter(_cache)))
    _cache[key] = (None, dev)
    return dev


_pinned: dict = {}
_PINNED_MAX = 64


def pinned_device_constant(array, dtype=None):
    """Identity-keyed device cache for the framework's own precomputes.

    :func:`device_constant` deliberately refuses to cache arrays over the
    2 MB content-hash limit — but the folded transform operators (MDCT's
    ``(WL, WL/2)`` matrix, the conv-mode DFT filters) are 8–17 MB and *must*
    not re-upload per call: on a remote-tunnel deployment that transfer is
    ~0.15 s, which capped the direct-GEMM MDCT at ~150k frames/s while the
    constant-embedding STFT path ran at ~850k (docs/tpu_results/
    stft_engines.json, diagnosed 2026-08-17). Callers pass ``lru_cache``-held
    host arrays whose identity is stable for the process, so the key is
    ``(id, shape, dtype, want)`` with the host reference pinned. Never use
    for caller-owned data — mutation would be invisible to the cache.
    """
    host = np.asarray(array)
    want = np.dtype(dtype) if dtype is not None else host.dtype
    if _tracing_active():
        return _upload(host.astype(want) if want != host.dtype else host)
    key = (id(host), host.shape, str(host.dtype), str(want))
    hit = _pinned.get(key)
    if hit is not None:
        return hit[1]
    dev = _upload(host.astype(want) if want != host.dtype else host)
    while len(_pinned) >= _PINNED_MAX:
        _pinned.pop(next(iter(_pinned)))
    _pinned[key] = (host, dev)  # pin host so id() stays valid
    return dev


def as_device_constant(x, dtype=None):
    """:func:`device_constant` for host arrays; pass-through for jax arrays
    and tracers (so transforms stay differentiable w.r.t. windows)."""
    import jax

    if isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
        return x if dtype is None else x.astype(dtype)
    return device_constant(x, dtype)


def as_device_array(x):
    """``jnp.asarray`` for *caller data* (not cached): complex host arrays
    are shipped as real/imag pairs (see :func:`_upload`); jax arrays and
    tracers pass through untouched."""
    import jax

    if isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
        return x
    return _upload(np.asarray(x))


def cache_size() -> int:
    return len(_cache)


def clear():
    _cache.clear()
    _pinned.clear()
