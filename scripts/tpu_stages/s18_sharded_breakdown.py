"""Stage 18: attribute the sharded-on-TPU overhead (VERDICT r3, item 2).

Round-3 s13 measured sharded/plain = 0.72 (STFT), 0.84 (ISTFT), 0.64 (MDCT)
on a 1-device TPU mesh even after the bodies were routed through the same
kernel dispatch as the single-device transforms. On one device the halo
functions are pure concat/identity (no collectives), so the gap must be in
(a) the EAGER wrapper ops — the bucketed zjit core returns the full t_pad
width and the wrapper slices ``out[..., :t]`` eagerly (a whole extra pass at
the c64 rate for STFT) and eagerly pads the c64 input for ISTFT — or
(b) shard_map program structure (fusion barriers / full-to-shard copies).

Arms per transform (120-s scale, matching s13):

  plain           the public single-device transform
  sharded         the public sharded transform (wrapper + finish/prep)
  core            the bucketed zjit core alone on pre-padded input
  finish / prep   the split small programs (mirror+transpose+slice;
                  fold+pad) that replaced round 3's eager full passes
  eager_pad       the ROUND-3 eager input pad alone (ISTFT) — kept as the
                  cost the split removed
  body_unsharded  the same body program on the same bucketed length with
                  NO shard_map — core minus shard_map structure

Attribution identity to read off: sharded ~= core + finish/prep, and
core - body_unsharded = the true shard_map cost.

Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

SR, WL, STEP = 44100, 2048, 1024
SECS = int(os.environ.get("S18_SECONDS", "120"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def _timed(fn, *args):
    from zaftpu.utils.profiling import timed

    _, stats = timed("s18", fn, *args, reps=3, dispatches=8, target_s=2.0,
                     log=False)
    return stats.seconds


def main():
    import jax

    if os.environ.get("S18_ALLOW_CPU") == "1":  # smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import zaftpu
    from zaftpu import pallas as _pallas
    from zaftpu.core import fft as _fft
    from zaftpu.core import frame as _frame
    from zaftpu.core.windows import hamming, vorbis
    from zaftpu.sharding import make_mesh
    from zaftpu.sharding import sharded as _sh
    from zaftpu.utils.devcache import as_device_constant

    if (jax.default_backend() != "tpu"
            and os.environ.get("S18_ALLOW_CPU") != "1"):
        print(json.dumps({"ok": False, "reason": "not on TPU"}))
        return 1

    mesh = make_mesh(1)
    axis = "frames"
    rng = np.random.default_rng(0)
    n = SR * SECS
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    win = hamming(WL).astype(np.float32)
    win_dev = as_device_constant(win)
    tdac = vorbis(WL).astype(np.float32)

    out = {"ok": True, "seconds_of_audio": SECS, "n_devices": 1}

    def run(section, name, fn, *args, frames, gate=True):
        try:
            sec = _timed(fn, *args)
            out.setdefault(section, {})[name] = {
                "seconds": round(sec, 6),
                "frames_per_s": round(frames / sec, 1)}
            log(f"{section}.{name}: {sec * 1e3:.2f} ms "
                f"-> {frames / sec:,.0f} frames/s")
        except Exception as exc:  # noqa: BLE001
            if gate:
                out["ok"] = False
            out.setdefault(section, {})[name] = {
                "error": f"{type(exc).__name__}: {exc}"[:200]}
            log(f"{section}.{name}: FAILED ({type(exc).__name__}: "
                f"{str(exc)[:150]})")

    # ------------------------------------------------------------- STFT --
    t, pads = _sh._stft_plan(n, WL, STEP, mesh, axis)
    pad_front, body_len, t_pad = pads
    x_body = _sh._prepad_tail(x, body_len - pad_front)
    x_body.block_until_ready()
    log(f"stft: t={t} t_pad={t_pad}")

    run("stft", "plain", jax.jit(lambda s: zaftpu.stft(s, win, STEP)), x,
        frames=t)
    run("stft", "sharded",
        lambda s: _sh.stft_sharded(s, win, STEP, mesh), x, frames=t)
    run("stft", "core",
        lambda s: _sh._stft_full_sharded(s, win_dev, STEP, mesh, axis, pads,
                                         False)[0], x_body, frames=t)
    re_h, im_h = _sh._stft_full_sharded(x_body, win_dev, STEP, mesh, axis,
                                        pads, False)
    im_h.block_until_ready()
    run("stft", "finish", lambda a, b: _sh._stft_finish(a, b, WL, t),
        re_h, im_h, frames=t)

    # The same body program, same bucketed length, no shard_map.
    def body_unsharded(sig):
        body = jnp.pad(sig, [(pad_front,
                              body_len - pad_front - sig.shape[-1])])
        extended = jnp.concatenate(
            [body, jnp.zeros((WL - STEP,), body.dtype)])
        half = _pallas.windowed_frames_rfft(extended, win_dev, WL, STEP,
                                            t_pad)
        full = _fft.full_from_half(half, WL)
        return jnp.swapaxes(full, -1, -2)

    run("stft", "body_unsharded", jax.jit(body_unsharded), x_body,
        frames=t)

    # ------------------------------------------------------------ ISTFT --
    spec = zaftpu.stft(x, win, STEP)
    spec.block_until_ready()
    n_sh = mesh.shape[axis]
    t_pad_i = _sh._bucket_t_pad(n_sh * (-(-t // n_sh)), n_sh)
    gain = _frame.cola_gain(np.asarray(win), STEP)
    spec_padded = jnp.pad(spec, [(0, 0), (0, t_pad_i - t)])
    spec_padded.block_until_ready()

    run("istft", "plain", jax.jit(lambda z: zaftpu.istft(z, win, STEP)),
        spec, frames=t)
    run("istft", "sharded",
        lambda z: _sh.istft_sharded(z, win, STEP, mesh), spec, frames=t)
    run("istft", "prep", lambda z: _sh._istft_prep(z, WL, t_pad_i)[0],
        spec, frames=t)
    h_re, h_im = _sh._istft_prep(spec, WL, t_pad_i)
    h_im.block_until_ready()
    run("istft", "core",
        lambda a, b: _sh._istft_core_sharded_folded(a, b, WL, STEP, mesh,
                                                    axis, gain),
        h_re, h_im, frames=t)
    run("istft", "eager_pad",
        lambda z: jnp.pad(z, [(0, 0), (0, t_pad_i - t)]), spec, frames=t)

    def istft_body_unsharded(z):
        frames_major = jnp.swapaxes(z, -1, -2)
        frames = _fft.direct_real_ifft(frames_major, scale=1.0 / gain)
        ola = _pallas.overlap_add(frames, STEP)
        return ola[WL - STEP:]

    run("istft", "body_unsharded", jax.jit(istft_body_unsharded),
        spec_padded, frames=t)

    # ------------------------------------------------------------- MDCT --
    step_m = WL // 2
    t_m = int(np.ceil(n / step_m)) + 1
    t_pad_m, body_len_m = _sh._plan_body(n, step_m, WL, step_m, t_m, 1)
    x_body_m = _sh._prepad_tail(x, body_len_m - step_m)
    x_body_m.block_until_ready()
    pads_m = (step_m, body_len_m, t_pad_m)
    log(f"mdct: t={t_m} t_pad={t_pad_m}")

    run("mdct", "plain", jax.jit(lambda s: zaftpu.mdct(s, tdac)), x,
        frames=t_m)
    run("mdct", "sharded", lambda s: _sh.mdct_sharded(s, tdac, mesh), x,
        frames=t_m)
    run("mdct", "core",
        lambda s: _sh._mdct_full_sharded_direct(
            s, as_device_constant(tdac), mesh, axis, pads_m),
        x_body_m, frames=t_m)
    core_m = _sh._mdct_full_sharded_direct(
        x_body_m, as_device_constant(tdac), mesh, axis, pads_m)
    core_m.block_until_ready()
    run("mdct", "finish", lambda o: _sh._transpose_slice(o, t_m), core_m,
        frames=t_m)
    # Slice-order A/B: slicing the unaligned frame axis BEFORE the
    # transpose may force the slow copy path; transposing first keeps the
    # fast tiled transpose and slices lanes after.
    run("mdct", "finish_tfirst",
        jax.jit(lambda o: jnp.swapaxes(o, -1, -2)[..., :t_m]), core_m,
        frames=t_m, gate=False)

    # The same fused-kernel body on the same bucketed length, no shard_map:
    # isolates the shard_map structure cost seen in the core arm.
    from zaftpu.pallas import fused as _fused
    from zaftpu.transforms.mdct import _direct_forward_ops_padded

    def mdct_body_unsharded(sig):
        body = jnp.pad(sig, [(step_m, body_len_m - step_m - sig.shape[-1])])
        extended = jnp.concatenate(
            [body, jnp.zeros((WL - step_m,), body.dtype)])
        return _fused.frames_op(extended, jnp.asarray(tdac),
                                _direct_forward_ops_padded, step_m, WL,
                                step_m, t_pad_m)

    run("mdct", "body_unsharded", jax.jit(mdct_body_unsharded), x,
        frames=t_m, gate=False)

    # Ratios the VERDICT gate reads.
    for name in ("stft", "istft", "mdct"):
        sec_pl = out[name].get("plain", {}).get("seconds")
        sec_sh = out[name].get("sharded", {}).get("seconds")
        if sec_pl and sec_sh:
            out[name]["sharded_over_plain"] = round(sec_pl / sec_sh, 3)

    out["pallas_fallback"] = bool(_pallas._broken)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
