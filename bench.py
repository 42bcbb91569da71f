"""Headline benchmark: STFT throughput on 1 hour of audio, single TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the reference's zaf.stft collapses to 88 frames/s on
1-hour audio (strided axis-0 FFT over a 5 GB array + Python framing loop).

Methodology: the hour is processed as 10-minute segments (full complex
(2048, T) STFT per segment — same transform semantics as the reference per
call). Segment calls are dispatched back-to-back and synchronized once, so
the measurement is device throughput, not per-call host latency. Segmenting
keeps every buffer under ~430 MB: the remote tunnel fronting this chip
returns UNIMPLEMENTED for single buffers around 1 GiB (and the full-hour
complex STFT would be 2.5 GB); it also matches how the framework's streaming
pipeline actually processes hour-scale audio.

Tunnel quirks handled: `block_until_ready` may return early (sync is a
dependent one-element fetch); transient compile errors retry; a watchdog
falls back to a CPU measurement (the baseline is also 1-CPU) if the TPU is
wedged.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_STFT_1H_FPS = 88.0  # BASELINE.md: measured reference, 1 vCPU
SAME_HOST_REF_FPS = 1420.0   # reference re-measured on this 4-core host
SR = 44100
SECONDS = int(os.environ.get("BENCH_SECONDS", "3600"))
CHUNK_SECONDS = int(os.environ.get("BENCH_CHUNK_SECONDS", "600"))
WL, STEP = 2048, 1024


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def audio_chunks():
    """The benchmark signal as a list of <=CHUNK_SECONDS float32 segments."""
    try:
        import zaftpu

        x, _ = zaftpu.wavread("/root/reference/audio_file.wav")
        mono = x.mean(axis=1).astype(np.float32)
    except Exception:
        t = np.arange(SR * 60, dtype=np.float32) / SR
        mono = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    chunk_len = SR * CHUNK_SECONDS
    total = SR * SECONDS
    reps = -(-chunk_len // len(mono))
    one_chunk = np.tile(mono, reps)[:chunk_len]
    chunks = []
    remaining = total
    while remaining > 0:
        take = min(chunk_len, remaining)
        chunks.append(one_chunk[:take])
        remaining -= take
    return chunks


def sync(x):
    """Force completion via a dependent tiny transfer (tunnel-safe)."""
    from zaftpu.utils.profiling import fetch_sync

    return fetch_sync(x)


def timed_chunks(fn, inputs, reps=3):
    """Per-pass wall time over all chunks, amortized across ``reps`` passes:
    every call is dispatched back-to-back and a single dependent fetch at the
    end synchronizes (device execution is in-order, so completion of the last
    output implies all finished). This measures device throughput rather than
    per-call host/tunnel latency. Warmup retries transient remote-compile
    errors. Returns ``(seconds_per_pass, outputs_of_last_pass)``."""
    outs = None
    for attempt in range(3):
        try:
            outs = [fn(x) for x in inputs]
            sync(outs[-1])
            break
        except Exception as exc:  # noqa: BLE001
            if attempt == 2:
                raise
            log(f"warmup attempt {attempt + 1} failed ({exc}); retrying")
            time.sleep(10)
    def passes(n):
        nonlocal outs
        t0 = time.perf_counter()
        for _ in range(n):
            # Keep only the latest outputs referenced so earlier passes'
            # buffers free as soon as their computations finish.
            outs = [fn(x) for x in inputs]
        sync(outs[-1])
        total = time.perf_counter() - t0
        # The trailing dependent fetch costs ~0.2-0.5 s through the tunnel;
        # with the device now idle, a second fetch measures that pure
        # overhead so it can be excluded from the compute time.
        t1 = time.perf_counter()
        sync(outs[-1])
        total -= min(time.perf_counter() - t1, total * 0.5)
        return total / n
    # Coarse pass sizes the rep count for ~2 s of device work: below that
    # the tunnel round-trip's ~10 ms jitter dominates fast transforms (the
    # hour-scale MDCT is ~15 ms/pass).
    coarse = passes(reps)
    n = int(min(64, max(reps, round(2.0 / max(coarse * reps, 1e-6)) * reps)))
    return passes(n) if n > reps else coarse, outs


def pick_chunk_seconds():
    """Adaptively find a working segment size: the tunnel sporadically
    rejects programs with larger buffers, so probe descending sizes with a
    tiny STFT warmup until one executes."""
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming

    win = hamming(WL).astype(np.float32)
    ladder = sorted({cs for cs in (CHUNK_SECONDS, 300, 120, 60)
                     if cs <= CHUNK_SECONDS and cs <= max(SECONDS, 60)},
                    reverse=True)
    for cs in ladder:
        try:
            probe = jnp.asarray(np.zeros(SR * cs, np.float32))
            out = zaftpu.stft(probe, win, STEP)
            sync(out)
            del out, probe
            return cs
        except Exception as exc:  # noqa: BLE001
            log(f"chunk probe {cs}s failed ({str(exc)[:60]}); trying smaller")
    return min(60, SECONDS)


def _enable_compile_cache():
    """Persistent XLA compilation cache: a retried bench run (or a prior
    watcher session) should never re-spend its timeout budget on compiles.
    Best-effort — remote-plugin backends may ignore it."""
    import jax

    for k, v in (("jax_compilation_cache_dir", "/root/repo/.jax_cache"),
                 ("jax_persistent_cache_min_compile_time_secs", 1.0)):
        try:
            jax.config.update(k, v)
        except Exception:  # noqa: BLE001
            pass


def main():
    global CHUNK_SECONDS
    import jax
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming, vorbis

    log(f"devices: {jax.devices()}")
    if (jax.default_backend() == "cpu"
            and "BENCH_CHUNK_SECONDS" not in os.environ):
        # Small segments keep CPU buffers cache-resident (measured: ~120 s
        # chunks are ~3x faster than 600 s at full-hour scale on 4 cores).
        CHUNK_SECONDS = 120
    CHUNK_SECONDS = pick_chunk_seconds()
    log(f"segment size: {CHUNK_SECONDS} s")
    chunks_np = audio_chunks()

    def upload(c):
        # Retry transient UNIMPLEMENTED upload failures (tunnel flakiness).
        for attempt in range(3):
            try:
                return jnp.asarray(c)
            except Exception as exc:  # noqa: BLE001
                if attempt == 2 or "UNIMPLEMENTED" not in str(exc):
                    raise
                log(f"chunk upload failed ({str(exc)[:50]}); retrying")
                time.sleep(5)

    # The tiled hour repeats the same content every chunk: upload each
    # distinct length once and reuse the device buffer (6x less transfer —
    # timing measures compute over distinct outputs, not input identity).
    uploaded = {}
    chunks = []
    for c in chunks_np:
        if len(c) not in uploaded:
            uploaded[len(c)] = upload(c)
        chunks.append(uploaded[len(c)])
    window = hamming(WL).astype(np.float32)
    from zaftpu.core.frame import stft_padding

    total_samples = sum(len(c) for c in chunks_np)
    t_frames = sum(stft_padding(len(c), WL, STEP)[2] for c in chunks_np)
    log(f"{SECONDS} s signal: {total_samples} samples, {t_frames} frames, "
        f"{len(chunks)} x {CHUNK_SECONDS} s segments")

    stft_s, specs = timed_chunks(lambda x: zaftpu.stft(x, window, STEP),
                                 chunks)
    stft_fps = t_frames / stft_s
    log(f"STFT:  {stft_s:.3f} s -> {stft_fps:,.0f} frames/s "
        f"(reference: 88 frames/s on the 1-vCPU baseline host, "
        f"{SAME_HOST_REF_FPS:,.0f} frames/s re-measured on this host; "
        f"same-host ratio {stft_fps / SAME_HOST_REF_FPS:,.1f}x)")

    istft_s, recs = timed_chunks(lambda s: zaftpu.istft(s, window, STEP),
                                 specs)
    log(f"ISTFT: {istft_s:.3f} s -> {t_frames / istft_s:,.0f} frames/s")

    @jax.jit
    def sq_err(a, b):
        n = min(a.shape[0], b.shape[0])
        err = a[:n] - b[:n]
        return jnp.sum(a[:n] * a[:n]), jnp.sum(err * err)

    num = den = 0.0
    for c, r in zip(chunks, recs):
        s, e = jax.device_get(sq_err(c, r))
        num += float(s)
        den += float(e)
    stft_snr = 10 * np.log10(num / den)
    log(f"STFT round-trip SNR (f32): {stft_snr:.1f} dB "
        f"(reference f64: 311.7 dB)")

    # MDCT/IMDCT are supplementary — a tunnel failure here must not discard
    # the headline STFT measurement (the rungs are already gated on STFT).
    mdct_snr = None
    try:
        tdac = vorbis(WL).astype(np.float32)
        t_mdct = sum(int(np.ceil(len(c) / STEP)) + 1 for c in chunks_np)
        mdct_s, coeffs = timed_chunks(lambda x: zaftpu.mdct(x, tdac), chunks)
        log(f"MDCT:  {mdct_s:.3f} s -> {t_mdct / mdct_s:,.0f} frames/s "
            f"(reference 1 vCPU: 6,330 frames/s)")

        imdct_s, recs2 = timed_chunks(lambda c: zaftpu.imdct(c, tdac), coeffs)
        log(f"IMDCT: {imdct_s:.3f} s -> {t_mdct / imdct_s:,.0f} frames/s")

        num = den = 0.0
        for c, r in zip(chunks, recs2):
            s, e = jax.device_get(sq_err(c, r))
            num += float(s)
            den += float(e)
        mdct_snr = 10 * np.log10(num / den)
        log(f"MDCT round-trip SNR (f32): {mdct_snr:.1f} dB "
            f"(reference f64: 284 dB)")
    except Exception as exc:  # noqa: BLE001
        log(f"MDCT/IMDCT measurement failed ({str(exc)[:80]}) — "
            f"continuing with the STFT headline")

    # Accuracy gate: a fast rung only counts if reconstruction stays beyond
    # the 16-bit audio noise floor (96 dB) — speed must not buy silent
    # precision loss (e.g. an over-aggressive ZAFTPU_PRECISION setting).
    snrs = [stft_snr] + ([mdct_snr] if mdct_snr is not None else [])
    # `not >=` rather than `<`: a NaN SNR (device fault, corrupt transfer)
    # must fail the gate, and NaN < 96.0 is False.
    if not min(snrs) >= 96.0:
        log(f"REJECTED: round-trip SNR below the 96 dB floor ({snrs})")
        sys.exit(2)

    print(json.dumps({
        "metric": "stft_frames_per_sec_1h_audio",
        "value": round(stft_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(stft_fps / BASELINE_STFT_1H_FPS, 2),
    }))


_PROBE_CODE = """
import jax, numpy as np, jax.numpy as jnp
for _k, _v in (("jax_compilation_cache_dir", "/root/repo/.jax_cache"),
               ("jax_persistent_cache_min_compile_time_secs", 1.0)):
    try:
        jax.config.update(_k, _v)
    except Exception:
        pass
assert jax.default_backend() == "tpu", jax.default_backend()
import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.utils.profiling import fetch_sync
x = jnp.asarray(np.zeros(44100 * 5, np.float32))
fetch_sync(zaftpu.stft(x, hamming(2048).astype(np.float32), 1024))
print("probe ok")
"""


def _probe_tpu(extra_env, timeout_s=120):
    """Cheap wedge detector: a 5-s micro-STFT in a worker subprocess under a
    short timeout. Compiles are cached (server-side and via the persistent
    cache), so a healthy tunnel answers in seconds; a wedged one hangs and
    only costs ``timeout_s`` instead of a full rung budget."""
    env = dict(os.environ, BENCH_PROBE="1", **extra_env)
    try:
        # capture_output: the probe's stdout must not leak into the
        # supervisor's one-JSON-line stdout contract.
        return subprocess.run(
            [sys.executable, "-c", _PROBE_CODE], env=env,
            capture_output=True, timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        log(f"TPU probe hung ({timeout_s}s) — tunnel wedged")
        return False


def _run_rung(label, extra, timeout_s):
    """One worker attempt; returns the parsed metric dict or None. The
    worker's stdout (the JSON line) is captured so the supervisor alone
    prints the final metric; worker stderr streams through for progress."""
    env = dict(os.environ, BENCH_WORKER="1", **extra)
    log(f"--- bench attempt: {label}")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        log(f"{label} attempt timed out after {timeout_s}s")
        return None
    if proc.stderr:
        log(proc.stderr.rstrip()[-4000:])
    if proc.returncode != 0:
        log(f"{label} attempt failed (rc={proc.returncode})")
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in parsed:
            parsed["config"] = label
            return parsed
    log(f"{label} attempt printed no metric line")
    return None


def _supervise():
    """Measure through a ladder of worker subprocesses: TPU (Pallas + native
    FFT) -> TPU without Pallas -> TPU with the matmul FFT engine; every TPU
    rung is gated by a short micro-probe so a wedged tunnel costs ~2 min,
    not the serial sum of rung budgets. ALL healthy TPU rungs run and the
    BEST frames/s is reported (the rungs are genuinely different programs —
    measured 2026-08-17: the matmul-FFT rung reached 1.24M frames/s while
    the native-FFT rung was still failing). Falls back to host CPU (the
    baseline is also a CPU measurement) only when no TPU rung succeeds."""
    budget = int(os.environ.get("BENCH_TIMEOUT", "420"))
    # Outer deadline: callers run the whole supervisor under their own
    # timeout (the watcher gives 1500 s); if the ladder would outlive it we
    # must stop launching rungs and print the best-so-far, or a kill
    # mid-ladder discards every completed measurement.
    deadline = time.monotonic() + int(os.environ.get("BENCH_DEADLINE", "1350"))
    # Rung order is reliability-first (round-3 lesson: the official artifact
    # fell back to CPU because the *first* rung ate its whole budget inside a
    # wedge window). The default-dispatch rung compiles the fewest/most-cached
    # programs, so it runs first to bank a TPU number early; the split4 rung
    # (the round-3 winner at 2.15M frames/s) follows with a trimmed budget.
    ladder = [
        # Default dispatch: ZAFTPU_FFT=auto selects the matmul engine
        # on TPU (docs/tpu_results/stft_engines.json), Pallas framing on.
        ("TPU", {}, budget),
        # 4-pass bf16-split GEMM (ZAFTPU_PRECISION=split4): 108 dB round
        # trip — above the 96 dB floor that disqualifies the 3-pass HIGH
        # scheme (docs/tpu_results/stft_engines.json).
        ("TPU (split4 GEMM)", {"ZAFTPU_PRECISION": "split4"},
         min(budget, 300)),
        ("TPU (no Pallas)", {"ZAFTPU_PALLAS": "0"}, budget),
        # (The former ZAFTPU_STFT=conv rung was removed with the lever: it
        # failed on this hardware at 10-min segment scale — see
        # docs/perf.md history. The 3-pass ZAFTPU_PRECISION=high rung is
        # deliberately absent: its round trip measures 94.9 dB on hardware —
        # below this benchmark's own 96 dB accuracy floor.)
        ("TPU (native FFT)",
         {"ZAFTPU_PALLAS": "0", "ZAFTPU_FFT": "native"}, budget),
    ]
    # Reserve a slice of the deadline for the CPU fallback while no TPU rung
    # has landed (round 3: the ladder consumed the window and the CPU rung
    # barely fit). Once a TPU result exists the reserve drops to zero.
    cpu_reserve = 420

    # Once a TPU number is banked, reserve a tail slice for the
    # scaling-readiness steps (sharded ratios + dryrun) so they make it
    # into the artifact; with no result yet the rungs keep priority.
    # Sized for the measured tail: ratios ~6 min cold (parity-skipped,
    # compile-cached when warm) + dryrun ~1 min.
    tail_reserve = 560

    results = []
    queue = [(label, extra, t, 0) for label, extra, t in ladder]
    while queue:
        label, extra, timeout_s, tries = queue.pop(0)
        remaining = deadline - time.monotonic() - (
            tail_reserve if results else 0)
        if results and remaining < timeout_s * 0.5:
            log(f"deadline approaching ({remaining:.0f}s left) — "
                f"reporting best of {len(results)} completed rungs")
            break
        if remaining < (240 if results else 240 + cpu_reserve):
            # A probe (120 s) + minimum rung (120 s) cannot finish — and
            # with no result yet the CPU fallback still needs its slot.
            log(f"deadline too close ({remaining:.0f}s) to start {label}")
            break
        timeout_s = max(120, min(timeout_s, int(remaining - (
            0 if results else cpu_reserve))))
        if not _probe_tpu(extra):
            # Wedge windows are transient: skip THIS rung only and requeue
            # it once at the tail — the next rung's probe (plus the sleep)
            # spreads retries across the whole bench window instead of
            # writing off every TPU rung on one bad probe (round-3 failure
            # mode).
            if tries == 0:
                log(f"probe failed before {label} — requeueing once")
                queue.append((label, extra, timeout_s, 1))
            else:
                log(f"probe failed again before {label} — dropping rung")
            if not results:
                time.sleep(30)
            continue
        r = _run_rung(label, extra, timeout_s)
        if r is not None:
            log(f"{label}: {r['value']:,.0f} {r['unit']}")
            results.append(r)
        elif tries == 0:
            # One fresh-process retry per rung: transient remote-compile
            # failures usually clear, and server-side compile caches make
            # the retry much cheaper than the first attempt.
            log(f"{label} failed — requeueing for one retry")
            queue.append((label, extra, timeout_s, 1))
    if not results and os.environ.get("BENCH_REQUIRE_TPU") != "1":
        # Watcher sessions only want genuine TPU numbers — a CPU fallback
        # result would be persisted and stop future retries.
        r = _run_rung("CPU", {"BENCH_FORCE_CPU": "1"}, 1800)
        if r is not None:
            results.append(r)
    if not results:
        return 1
    best = max(results, key=lambda r: r["value"])
    log(f"best rung: {best['config']}")
    # Scaling-readiness evidence in the driver artifact itself (VERDICT
    # round 4 item 6): 1-device sharded/plain ratios + the multi-chip
    # dryrun status. Both best-effort — a failure here must not discard
    # the headline measurement.
    remaining = deadline - time.monotonic()
    if remaining > 360 and best["config"].startswith("TPU"):
        ratios = _measure_sharded_ratios(min(480, int(remaining - 90)))
        if ratios is not None:
            best["sharded_ratio"] = ratios
            best["sharded_ratio_source"] = "live"
        else:
            # The live step's compiles alone run ~7 min through the tunnel
            # and can outlive the tail budget; fall back to the committed
            # stage artifact with explicit provenance rather than dropping
            # the scaling evidence.
            best["sharded_ratio"] = _artifact_sharded_ratios()
            best["sharded_ratio_source"] = "artifact:sharded_tpu.json"
    remaining = deadline - time.monotonic()
    if remaining > 150:
        best["dryrun_multichip_ok"] = _check_dryrun(
            timeout_s=min(420, int(remaining - 30)))
    else:
        # Never overrun the caller's deadline for an informational field —
        # a kill mid-step would discard the banked headline measurement.
        best["dryrun_multichip_ok"] = None
        log(f"deadline too close ({remaining:.0f}s) for the dryrun check")
    print(json.dumps(best))
    return 0


def _measure_sharded_ratios(timeout_s):
    """1-device-mesh sharded/plain throughput ratios for the five core
    transforms at 600-s scale (the s13 gate) — ≥0.95 is the round-5 bar on
    the ≥90%-linear-scaling north star (VERDICT round 4 items 1/6)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    stage = os.path.join(repo, "scripts", "tpu_stages",
                         "s13_sharded_tpu.py")
    env = dict(os.environ)
    # The stage runs with its own dir as sys.path[0]; the package import
    # needs the repo root (keep any existing entries, e.g. the axon site).
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # Ratios only: the stage's full-output parity fetches move hundreds of
    # MB through the tunnel and can outlive the tail budget; parity stays
    # gated by the standalone s13 artifact runs.
    env["S13_SKIP_PARITY"] = "1"
    try:
        proc = subprocess.run([sys.executable, stage], env=env,
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log("sharded-ratio measurement timed out")
        return None
    if proc.stderr:
        log(proc.stderr.rstrip()[-1500:])
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        ratios = {k: v.get("sharded_over_plain")
                  for k, v in parsed.items()
                  if isinstance(v, dict) and "sharded_over_plain" in v}
        if ratios:
            log(f"sharded/plain ratios: {ratios}")
            return ratios
    log("sharded-ratio measurement produced no parseable result")
    return None


def _artifact_sharded_ratios():
    """Ratios from the committed s13 stage artifact (the authoritative,
    parity-gated measurement), used when the live tail step cannot fit the
    bench window."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs",
                        "tpu_results", "sharded_tpu.json")
    try:
        with open(path) as fh:
            parsed = json.load(fh)
    except Exception:  # noqa: BLE001
        return None
    ratios = {k: v.get("sharded_over_plain") for k, v in parsed.items()
              if isinstance(v, dict) and "sharded_over_plain" in v}
    return ratios or None


_DRYRUN_CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
print("dryrun ok")
"""


def _check_dryrun(timeout_s=420):
    """Run the 8-device virtual-mesh dry run (the full sharded training
    step with real shardings) in a subprocess; True iff it executes."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _DRYRUN_CODE],
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        log("dryrun check timed out")
        return False
    ok = proc.returncode == 0 and "dryrun ok" in proc.stdout
    log(f"dryrun_multichip(8): {'ok' if ok else 'FAILED'}"
        + ("" if ok else f" rc={proc.returncode} {proc.stderr[-400:]}"))
    return ok


if __name__ == "__main__":
    if os.environ.get("BENCH_WORKER") == "1":
        if os.environ.get("BENCH_FORCE_CPU") == "1":
            import jax

            jax.config.update("jax_platforms", "cpu")
        else:
            _enable_compile_cache()
        main()
        sys.exit(0)
    sys.exit(_supervise())