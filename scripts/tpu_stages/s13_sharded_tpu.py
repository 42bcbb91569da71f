"""Stage 13: the sharded layer on the REAL TPU chip (VERDICT.md r2, item 2).

All round-2 sharded evidence was CPU (virtual 8-device mesh); the
shard_map + ppermute + halo-ring programs — the framework's signature
feature — had never compiled or run through the axon tunnel. This stage
runs the sharded transforms on a 1-device TPU mesh (the one real chip):

  * value parity vs the unsharded transforms (scale-aware f32 tolerance),
  * throughput within a few % of the unsharded twin (a 1-device ring adds
    only the masked ppermute, which should be ~free),

proving the shard_map programs (halo pulls, boundary-sum pushes, the
blocked CQT body inside shard_map) compile and execute on hardware. This
de-risks the multi-chip path as far as a single-chip environment physically
allows; multi-chip layouts stay validated by the CPU mesh gates +
dryrun_multichip.

The first run failed ALL cases with UNIMPLEMENTED — that was the complex
device->host FETCH of the stft case's result (tunnel-broken regardless of
what computed it) poisoning the process for every later fetch, not
shard_map; fetches now go through :func:`_np` (plane transfers).

Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
# 600-s default since round 4: at 120 s the fastest transforms (MDCT: ~0.9
# ms device time) are dominated by per-call wrapper/dispatch variance
# (±0.5-1.2 ms between runs through the tunnel), which made the
# sharded/plain ratio swing 0.37-0.86 for identical code. At 600 s device
# time dominates and the ratios are stable run to run
# (sharded_breakdown_600.json).
SECS = int(os.environ.get("S13_SECONDS", "600"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    # The parity-skipping bench tail uses lighter timing: the ratios it
    # reports sit at ~1.0 with multi-ms device times, so 2 reps suffice
    # and the saved minutes keep the step inside the bench tail budget.
    light = os.environ.get("S13_SKIP_PARITY") == "1"
    _, stats = timed("s13", fn, *args, reps=2 if light else 3,
                     dispatches=6 if light else 8,
                     target_s=1.2 if light else 2.0, log=False)
    return stats.seconds


def _np(x):
    """Device->host fetch that never transfers a complex array: complex
    transfers UNIMPLEMENTED through the axon tunnel in both directions, and
    one failed fetch poisons the process — the round-3 s13 run failed ALL
    five cases from exactly this (the stft case's complex fetch died first,
    then every later fetch inherited the poison)."""
    import jax.numpy as jnp

    if jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def main():
    import jax

    # Persistent compile cache (best-effort): repeated runs — e.g. the
    # bench tail after a same-code standalone run — skip the ~4 min of
    # fresh compiles that dominate this stage's wall time.
    for k, v in (("jax_compilation_cache_dir", "/root/repo/.jax_cache"),
                 ("jax_persistent_cache_min_compile_time_secs", 1.0)):
        try:
            jax.config.update(k, v)
        except Exception:  # noqa: BLE001
            pass

    if os.environ.get("S13_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.sharding import (cqtspectrogram_sharded, istft_sharded,
                                 make_mesh, mdct_sharded,
                                 melspectrogram_sharded, stft_sharded)

    if (jax.default_backend() != "tpu"
            and os.environ.get("S13_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    mesh = make_mesh(1)
    log(f"mesh: {mesh} on {jax.devices()[:1]}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SR * SECS).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    tdac = vorbis(WL).astype(np.float32)
    fbank = zaftpu.melfilterbank(SR, WL, 40)
    kern = zaftpu.cqtkernel(SR, 24, 55.0, 3520.0)
    t_stft = int(np.ceil((SR * SECS + 2 * (WL // 2) - WL) / STEP)) + 1
    t_cqt = (SR * SECS) // round(SR / 25)

    out = {"ok": True, "seconds_of_audio": SECS, "n_devices": 1}

    skip_parity = os.environ.get("S13_SKIP_PARITY") == "1"

    def case(name, sharded_fn, plain_fn, frames, atol_scale=4e-6):
        """Run sharded + unsharded, record parity and relative throughput.
        A failing case fails the stage — every sharded program here must
        compile and run on the chip. ``S13_SKIP_PARITY=1`` (bench.py's
        in-run ratio tail) skips the full-output parity fetches — hundreds
        of MB through the tunnel — and records timings only; parity stays
        gated by the standalone stage runs."""
        try:
            rec = {}
            if not skip_parity:
                got = _np(sharded_fn())
                ref = _np(plain_fn())
                err = float(np.max(np.abs(got - ref)))
                tol = atol_scale * max(1.0, float(np.abs(ref).max()))
                rec = {"max_abs_err": err, "parity_ok": bool(err <= tol)}
                if err > tol:
                    out["ok"] = False
            sec_sh = _timed(sharded_fn)
            sec_pl = _timed(plain_fn)
            out[name] = {
                **rec,
                "sharded_frames_per_s": round(frames / sec_sh, 1),
                "plain_frames_per_s": round(frames / sec_pl, 1),
                "sharded_over_plain": round(sec_pl / sec_sh, 3),
            }
            err_txt = ("" if skip_parity
                       else f"err={rec['max_abs_err']:.3g} ")
            log(f"{name}: {err_txt}sharded={frames / sec_sh:,.0f} fr/s "
                f"plain={frames / sec_pl:,.0f} fr/s")
        except Exception as exc:  # noqa: BLE001
            out["ok"] = False
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            log(f"{name}: FAILED ({type(exc).__name__}: {str(exc)[:150]})")

    spec = zaftpu.stft(x, win, STEP)
    from zaftpu import pallas as _pallas

    def fallback_mark(name):
        """Fallback honesty (round-2 lesson, CLAUDE.md): the guarded
        wrapper silently retries a failed Pallas program on XLA, so a case
        measured after a latch is timing the fallback. Record the latch per
        case and reset it so one rejection doesn't poison later cases'
        dispatch."""
        if _pallas._broken:
            out[name]["pallas_fallback"] = True
            _pallas._reset_health()

    case("stft", lambda: stft_sharded(x, win, STEP, mesh),
         lambda: zaftpu.stft(x, win, STEP), t_stft)
    fallback_mark("stft")
    case("istft", lambda: istft_sharded(spec, win, STEP, mesh),
         lambda: zaftpu.istft(spec, win, STEP), t_stft)
    fallback_mark("istft")
    case("mdct", lambda: mdct_sharded(x, tdac, mesh),
         lambda: zaftpu.mdct(x, tdac), t_stft)
    fallback_mark("mdct")
    case("melspectrogram",
         lambda: melspectrogram_sharded(x, win, STEP, fbank, mesh),
         lambda: zaftpu.melspectrogram(x, win, STEP, fbank), t_stft)
    fallback_mark("melspectrogram")
    case("cqtspectrogram",
         lambda: cqtspectrogram_sharded(x, SR, 25, kern, mesh),
         lambda: zaftpu.cqtspectrogram(x, SR, 25, kern), t_cqt)
    fallback_mark("cqtspectrogram")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
