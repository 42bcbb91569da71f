"""Observability: trace annotations, device timers, throughput counters.

The reference has no profiling hooks (SURVEY.md §5). Here every transform can
be wrapped in a ``jax.profiler`` trace annotation (visible in perfetto dumps
from ``jax.profiler.trace``), and :func:`timed` gives wall-clock device
timing with ``block_until_ready`` semantics plus frames/s — the framework's
headline metric (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time

import jax

logger = logging.getLogger("zaftpu")


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region: shows up in profiler timelines and logs."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclasses.dataclass
class TransformStats:
    """One timed transform execution."""

    name: str
    seconds: float
    frames: int | None = None

    @property
    def frames_per_second(self) -> float | None:
        if self.frames is None or self.seconds == 0:
            return None
        return self.frames / self.seconds

    def __str__(self) -> str:
        fps = self.frames_per_second
        extra = f", {fps:,.0f} frames/s" if fps else ""
        return f"{self.name}: {self.seconds * 1e3:.2f} ms{extra}"


def fetch_sync(x, retries: int = 3, delay_s: float = 2.0):
    """Force completion of ``x`` via a dependent one-element device fetch
    (reliable through remote-device tunnels where ``block_until_ready`` can
    return early). Returns the fetched element.

    Transient ``UNIMPLEMENTED`` transfer errors (observed through the axon
    tunnel) are retried with linear backoff before giving up — the device
    buffer is usually still valid and a later fetch succeeds. Complex scalars
    are fetched as ``|x|`` — complex device->host transfers through the
    tunnel fail deterministically with UNIMPLEMENTED (observed 2026-08-17:
    every STFT-touching stage died at its first fetch while real-output
    stages succeeded), and a dependent real scalar forces completion just
    as well.
    """
    import jax.numpy as jnp

    # Index the last element directly — reshape(-1) would materialize a
    # full device copy first (hundreds of MB for hour-scale outputs), which
    # through the tunnel is slow and occasionally wedges; a scalar gather
    # forces completion of the whole buffer just as well.
    last = x[(-1,) * x.ndim] if x.ndim else x
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        last = jnp.abs(last)
    for attempt in range(retries + 1):
        try:
            return jax.device_get(last)
        except Exception as exc:  # jax.errors.JaxRuntimeError and kin
            transient = "UNIMPLEMENTED" in str(exc)
            if not transient or attempt == retries:
                raise
            logger.warning("fetch_sync: transient %s (attempt %d/%d) — "
                           "retrying", type(exc).__name__, attempt + 1,
                           retries)
            time.sleep(delay_s * (attempt + 1))


def _block(x):
    if hasattr(x, "block_until_ready"):
        # block_until_ready alone can return early through remote-device
        # tunnels; a dependent one-element fetch guarantees completion.
        x.block_until_ready()
        fetch_sync(x)
    elif isinstance(x, dict):
        for v in x.values():
            _block(v)
    elif isinstance(x, (tuple, list)):
        for v in x:
            _block(v)


def _timed_block(name: str, fn, args, dispatches: int):
    """One timed block: ``dispatches`` back-to-back calls, one dependent
    fetch, minus the measured idle-device cost of a second fetch. Returns
    ``(result, seconds_per_call)``."""
    start = time.perf_counter()
    with annotate(name):
        for _ in range(dispatches):
            result = fn(*args)
        _block(result)
    elapsed = time.perf_counter() - start
    t1 = time.perf_counter()
    _block(result)  # device now idle: pure sync/fetch overhead
    sync_s = time.perf_counter() - t1
    # Cap the subtraction so a stalled second fetch can't produce a
    # nonsensically fast (or negative) figure.
    elapsed = max(elapsed - min(sync_s, elapsed * 0.5), 1e-9)
    return result, elapsed / dispatches


def timed(name: str, fn, *args, frames: int | None = None, reps: int = 1,
          warmup: bool = True, log: bool = True, dispatches: int = 1,
          target_s: float | None = None):
    """Run ``fn(*args)`` on device, blocking, best-of-``reps`` timing.

    ``dispatches`` > 1 issues that many back-to-back calls per rep with ONE
    trailing dependent fetch, then subtracts the measured idle-device cost
    of that fetch — through a remote-device tunnel the per-sync overhead is
    ~0.2-0.5 s and would otherwise swamp millisecond-scale device programs.
    ``target_s`` additionally auto-sizes the dispatch count from a coarse
    first block so every timed block holds about that much device work —
    without it, a fixed dispatch count leaves millisecond programs under the
    round-trip's ~10 ms *jitter* and the min-over-reps picks up the noise
    (observed as impossible >100%-of-peak rooflines). Reported seconds are
    per call. Returns ``(result, TransformStats)``; logs at INFO when
    ``log``.
    """
    dispatches = max(1, dispatches)
    if warmup:
        _block(fn(*args))
    if target_s is not None:
        _, coarse = _timed_block(name, fn, args, dispatches)
        dispatches = int(min(1024, max(dispatches,
                                       round(target_s / max(coarse, 1e-6)))))
    best = float("inf")
    result = None
    for _ in range(max(1, reps)):
        result, per_call = _timed_block(name, fn, args, dispatches)
        best = min(best, per_call)
    stats = TransformStats(name=name, seconds=best, frames=frames)
    if log:
        logger.info("%s", stats)
    return result, stats
