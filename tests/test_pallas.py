"""Pallas kernel correctness vs the XLA reference paths (interpret mode).

Real-TPU execution of the same kernels is exercised by bench.py /
tests on hardware; here the Mosaic interpreter validates the indexing and
DMA logic on the CPU test mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zaftpu.core import frame as xla_frame
from zaftpu.core.windows import hamming, vorbis
from zaftpu.pallas import framing as pframing
from zaftpu.pallas import ola as pola


@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (2048, 1024, 256),
                                       (512, 256, 300), (1024, 128, 64)])
def test_frame_window_matches_xla(wl, step, t):
    rng = np.random.default_rng(0)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)

    ref = np.asarray(
        xla_frame.extract_frames(jnp.asarray(padded), wl, step, t)
        * jnp.asarray(win))
    out = np.asarray(pframing.frame_window(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t, interpret=True))
    assert out.shape == (t, wl)
    np.testing.assert_allclose(out, ref, atol=1e-7)


def test_frame_window_supported():
    assert pframing.supported(2048, 1024, jnp.float32)
    assert not pframing.supported(2048, 1000, jnp.float32)
    assert not pframing.supported(2000, 1024, jnp.float32)
    assert not pframing.supported(2048, 1024, jnp.float64)


@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (512, 256, 300),
                                       (1024, 128, 40),
                                       # edge-plan coverage for the no-pad
                                       # kernel: t one past a block edge
                                       # (two crossing tail steps), and t
                                       # just under one (single-step grid)
                                       (512, 256, 257), (2048, 1024, 255),
                                       (1024, 128, 509)])
def test_overlap_add_matches_xla(wl, step, t):
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((t, wl)).astype(np.float32)

    ref = np.asarray(xla_frame.overlap_add(jnp.asarray(frames), step))
    out = np.asarray(pola.overlap_add(jnp.asarray(frames), step,
                                      interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_roundtrip_through_pallas_kernels():
    """frame+window -> OLA with a COLA window reconstructs the signal."""
    wl, step = 512, 256
    win = hamming(wl).astype(np.float32)
    rng = np.random.default_rng(2)
    t = 64
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    frames = pframing.frame_window(jnp.asarray(padded), jnp.asarray(win), wl,
                                   step, t, interpret=True)
    # Synthesis windowing (frames already analysis-windowed once; apply the
    # window again and normalize by the squared-window COLA sum).
    resynth = pola.overlap_add(frames * jnp.asarray(win), step,
                               interpret=True)
    wsq = xla_frame.overlap_add(
        jnp.tile(jnp.asarray(win * win)[None], (t, 1)), step)
    mid = slice(wl, t * step - wl)
    rec = np.asarray(resynth)[mid] / np.asarray(wsq)[mid]
    np.testing.assert_allclose(rec, padded[mid], atol=1e-4)


def test_mosaic_failure_falls_back_to_xla(monkeypatch):
    """A Pallas kernel failure must never break default use: the guarded
    dispatch marks the kernels broken, clears jit caches, and retries the
    call on the pure-XLA paths (VERDICT.md round 1, item 3)."""
    import warnings

    import jax

    import zaftpu
    from zaftpu import pallas as zpallas
    from zaftpu.core.windows import hamming

    x = np.random.default_rng(9).standard_normal(8192).astype(np.float32)
    win = hamming(1024).astype(np.float32)
    expected = np.asarray(zaftpu.stft(x, win, 512))

    def boom(*args, **kwargs):
        raise RuntimeError("simulated Mosaic compile failure")

    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setattr(zpallas._framing, "frame_window", boom)
    zpallas._reset_health()
    jax.clear_caches()  # drop the cached trace from the `expected` call
    try:
        assert zpallas.enabled()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = np.asarray(zaftpu.stft(x, win, 512))
        assert any("falling back" in str(w.message) for w in caught)
        assert not zpallas.enabled()  # broken for the rest of the process
        np.testing.assert_array_equal(out, expected)
        # subsequent calls go straight to XLA, no warning, still correct
        with warnings.catch_warnings(record=True) as caught2:
            warnings.simplefilter("always")
            out2 = np.asarray(zaftpu.istft(zaftpu.stft(x, win, 512), win,
                                           512))
        assert not any("falling back" in str(w.message) for w in caught2)
        assert out2.shape[-1] > 0
    finally:
        zpallas._reset_health()


def test_guarded_does_not_mask_user_errors():
    """ValueErrors from validation must propagate untouched through the
    guarded wrapper (no spurious fallback retries)."""
    import pytest as _pytest

    import zaftpu
    from zaftpu import pallas as zpallas
    from zaftpu.core.windows import hamming

    zpallas._reset_health()
    with _pytest.raises(ValueError, match="step_length"):
        zaftpu.stft(np.zeros(1024, np.float32), hamming(256), 512)
    assert not zpallas._broken


@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (2048, 1024, 300),
                                       (512, 256, 150), (1024, 128, 40)])
def test_fused_frames_rfft_matches_split(wl, step, t):
    """The fused framing+window+DFT-GEMM kernel must match the split
    framing-then-rfft path (frames never touch HBM in the fused one)."""
    from zaftpu.pallas import fused as pfused

    rng = np.random.default_rng(2)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)

    frames = np.asarray(pframing.frame_window(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t, interpret=True))
    ref = np.fft.rfft(frames.astype(np.float64), axis=-1)
    out = np.asarray(pfused.frames_rfft(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t, interpret=True))
    assert out.shape == (t, wl // 2 + 1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out.real, ref.real, atol=2e-6 * scale)
    np.testing.assert_allclose(out.imag, ref.imag, atol=2e-6 * scale)


def test_fused_frames_rfft_split4_matches_policy(monkeypatch):
    """The in-kernel 4-pass bf16-split scheme must match the XLA-side
    policy._split4_matmul applied to the same frames/operator (same split,
    same smallest-first accumulation) to f32 rounding."""
    from zaftpu.core import policy
    from zaftpu.pallas import fused as pfused

    monkeypatch.setenv("ZAFTPU_PRECISION", "split4")
    wl, step, t = 512, 256, 40
    rng = np.random.default_rng(5)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)
    frames = np.asarray(pframing.frame_window(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t, interpret=True))
    ref = np.fft.rfft(frames.astype(np.float64), axis=-1)
    out = np.asarray(pfused.frames_rfft(
        jnp.asarray(padded), jnp.asarray(win), wl, step, t, interpret=True))
    assert out.shape == (t, wl // 2 + 1)
    # split4 accuracy class: ~104 dB vs exact — gate at 1e-4 relative.
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out.real, ref.real, atol=1e-4 * scale)
    np.testing.assert_allclose(out.imag, ref.imag, atol=1e-4 * scale)
    # The host presplit must be the exact reduce_precision split.
    ops = pfused._rdft_ops_padded(wl)
    import jax

    hi_dev = jax.lax.reduce_precision(jnp.asarray(ops[0]), exponent_bits=8,
                                      mantissa_bits=7)
    hi_host, lo_host = pfused._bf16_split_host(ops[0])
    np.testing.assert_array_equal(hi_host, np.asarray(hi_dev))
    np.testing.assert_array_equal(
        lo_host.astype(np.float32),
        np.asarray((jnp.asarray(ops[0]) - hi_dev)))


def test_fused_stft_dispatch_matches_xla(monkeypatch):
    """Full stft() through the fused-kernel dispatch (engine + Pallas on)
    equals the default XLA program. CPU runs the kernel in interpret mode
    via a shim; on TPU the same dispatch hits real Mosaic."""
    import functools

    import zaftpu
    from zaftpu.pallas import fused as pfused

    monkeypatch.setattr(
        pfused, "frames_rfft",
        functools.partial(pfused.frames_rfft, interpret=True))
    rng = np.random.default_rng(3)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(2048).astype(np.float32)
    ref = np.asarray(zaftpu.stft(sig, win, 1024))
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_FUSED", "1")
    # This test pins the HALF-spectrum kernel dispatch; the mirrored
    # full-spectrum twin has its own gates (test_fullspec_*).
    monkeypatch.setenv("ZAFTPU_FULLSPEC", "0")
    out = np.asarray(zaftpu.stft(sig, win, 1024))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out.real, ref.real, atol=3e-6 * scale)
    np.testing.assert_allclose(out.imag, ref.imag, atol=3e-6 * scale)


def test_fused_mdct_dispatch_matches_xla(monkeypatch):
    """Full mdct() through the fused-kernel dispatch (single-component
    operator) equals the default direct-GEMM program. CPU runs the kernel
    in interpret mode via a shim; on TPU the same dispatch hits Mosaic."""
    import functools

    import zaftpu
    from zaftpu.core.windows import vorbis
    from zaftpu.pallas import fused as pfused

    monkeypatch.setattr(
        pfused, "frames_op",
        functools.partial(pfused.frames_op, interpret=True))
    rng = np.random.default_rng(7)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = vorbis(2048).astype(np.float32)
    ref = np.asarray(zaftpu.mdct(sig, win))
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_FUSED", "1")
    out = np.asarray(zaftpu.mdct(sig, win))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-6 * scale)


def test_mirror_fold_kernels_interpret():
    """Pallas mirror/fold plane kernels, both reversal strategies, must be
    bit-exact vs the gather formulation's math (zaf.py:139 mirror;
    zaf.py:223 Hermitian fold)."""
    from zaftpu.pallas.mirror import fold_half_planes, mirror_full_planes

    rng = np.random.default_rng(7)
    t, n = 301, 2048
    half = n // 2 + 1
    hs = np.fft.rfft(rng.standard_normal((t, n)), axis=-1)
    re = hs.real.astype(np.float32)
    im = hs.imag.astype(np.float32)
    ref = re + 1j * im
    expected = np.concatenate([ref, np.conj(ref[:, -2:0:-1])], axis=1)
    z = (rng.standard_normal((t, n))
         + 1j * rng.standard_normal((t, n))).astype(np.complex64)
    idx = np.array([(n - k) % n for k in range(half)])
    h_ref = 0.5 * (z[:, :half] + np.conj(z[:, idx]))
    for strategy in ("rev", "dot"):
        fr, fi = mirror_full_planes(jnp.asarray(re), jnp.asarray(im), n,
                                    strategy=strategy, interpret=True)
        got = np.asarray(fr) + 1j * np.asarray(fi)
        np.testing.assert_array_equal(got, expected)
        hr, hi = fold_half_planes(jnp.asarray(z.real.copy()),
                                  jnp.asarray(z.imag.copy()), n,
                                  strategy=strategy, interpret=True)
        goth = np.asarray(hr) + 1j * np.asarray(hi)
        np.testing.assert_array_equal(goth, h_ref)


def test_mirror_dispatch_matches_default(monkeypatch):
    """Full stft()/istft() through ZAFTPU_MIRROR=pallas (interpret shim on
    CPU) equals the default gather program bitwise."""
    import functools

    import jax

    import zaftpu
    from zaftpu.pallas import mirror as pmirror

    monkeypatch.setattr(
        pmirror, "mirror_full_planes",
        functools.partial(pmirror.mirror_full_planes, interpret=True))
    monkeypatch.setattr(
        pmirror, "fold_half_planes",
        functools.partial(pmirror.fold_half_planes, interpret=True))
    # ZAFTPU_PALLAS=1 also routes framing/OLA through Pallas — shim those
    # to interpret as well (CPU backend cannot compile Mosaic).
    monkeypatch.setattr(
        pframing, "frame_window",
        functools.partial(pframing.frame_window, interpret=True))
    monkeypatch.setattr(
        pola, "overlap_add",
        functools.partial(pola.overlap_add, interpret=True))
    rng = np.random.default_rng(11)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(2048).astype(np.float32)
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    jax.clear_caches()
    try:
        ref = np.asarray(zaftpu.stft(sig, win, 1024))
        rec_ref = np.asarray(zaftpu.istft(jnp.asarray(ref), win, 1024))
        monkeypatch.setenv("ZAFTPU_MIRROR", "pallas")
        monkeypatch.setenv("ZAFTPU_PALLAS", "1")
        jax.clear_caches()
        out = np.asarray(zaftpu.stft(sig, win, 1024))
        np.testing.assert_array_equal(out, ref)
        rec = np.asarray(zaftpu.istft(jnp.asarray(ref), win, 1024))
        # Both paths fold the COLA gain into the inverse operator; the
        # Pallas fold kernel and the XLA lane gather can differ in f32
        # accumulation order through the downstream GEMM tiling, so
        # float-noise close rather than bitwise.
        np.testing.assert_allclose(rec, rec_ref,
                                   atol=2e-5 * np.abs(rec_ref).max())
    finally:
        jax.clear_caches()


def test_cqtslab_kernel_matches_slab_loop():
    """The fused slab-CQT kernel (interpret mode) matches the XLA slab-loop
    engine path on a small synthetic CQT geometry (scale-aware: the kernel
    accumulates the same slab order but Mosaic/XLA dot rounding differs)."""
    import zaftpu
    from zaftpu.pallas import cqtslab
    from zaftpu.transforms import cqt as cqt_mod

    sr, time_res = 8000, 25
    kern = cqt_mod._as_kernel(zaftpu.cqtkernel(sr, 12, 110.0, 880.0))
    step = round(sr / time_res)
    n = sr * 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    t = n // step
    L = kern.fft_length

    m_real = np.ascontiguousarray(kern.time_kernel.real.T).astype(np.float32)
    m_imag = np.ascontiguousarray(kern.time_kernel.imag.T).astype(np.float32)
    key = ("test_cqtslab", sr, 12)
    cqtslab.register_kernel(key, m_real, m_imag)

    pad_front = int(-(-(L - step) // 2))
    padded = jnp.asarray(np.pad(x, (pad_front, L)))
    got = np.asarray(cqtslab.cqt_magnitudes(
        padded, key, step, L, t, kern.number_frequencies, block=16,
        interpret=True))
    ref = np.asarray(zaftpu.cqtspectrogram(x, sr, time_res, kern)).T
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale, rtol=2e-5)


@pytest.mark.parametrize("wl,step,t", [(2048, 1024, 37), (512, 256, 150),
                                       (1024, 128, 40), (2048, 1024, 300)])
def test_fullspec_planes_match_mirror_bitwise(wl, step, t):
    """The in-kernel mirrored-emission planes must equal
    full_from_half(frames_rfft(...)) BIT-FOR-BIT: the mirrored lanes are
    copies/negations of the same dot outputs (VERDICT round 4 item 5)."""
    import jax

    from zaftpu.core import fft as cfft
    from zaftpu.pallas import fused as pfused

    rng = np.random.default_rng(11)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)

    half = pfused.frames_rfft(jnp.asarray(padded), jnp.asarray(win), wl,
                              step, t, interpret=True)
    ref = jax.jit(lambda h: cfft.full_from_half(h, wl))(half)
    re, im = pfused.frames_rfft_full(jnp.asarray(padded), jnp.asarray(win),
                                     wl, step, t, interpret=True)
    assert re.shape == (t, wl) and im.shape == (t, wl)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(jnp.real(ref)))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(jnp.imag(ref)))


def test_fullspec_split4_matches_mirror_bitwise(monkeypatch):
    """Same bit-identity contract under the split4 dial (presplit bf16
    operator, in-kernel 4-pass scheme feeding the mirror epilogue)."""
    import jax

    from zaftpu.core import fft as cfft
    from zaftpu.pallas import fused as pfused

    monkeypatch.setenv("ZAFTPU_PRECISION", "split4")
    wl, step, t = 2048, 1024, 93
    rng = np.random.default_rng(12)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)
    half = pfused.frames_rfft(jnp.asarray(padded), jnp.asarray(win), wl,
                              step, t, interpret=True)
    ref = jax.jit(lambda h: cfft.full_from_half(h, wl))(half)
    re, im = pfused.frames_rfft_full(jnp.asarray(padded), jnp.asarray(win),
                                     wl, step, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(jnp.real(ref)))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(jnp.imag(ref)))


def test_fullspec_stft_dispatch_matches_xla(monkeypatch):
    """Full stft() through the mirrored-emission dispatch equals the
    half-kernel + XLA gather-mirror program."""
    import functools

    import zaftpu
    from zaftpu.pallas import fused as pfused

    rng = np.random.default_rng(13)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(2048).astype(np.float32)
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    monkeypatch.setenv("ZAFTPU_FULLSPEC", "0")
    monkeypatch.setattr(
        pfused, "frames_rfft",
        functools.partial(pfused.frames_rfft, interpret=True))
    monkeypatch.setattr(
        pfused, "frames_rfft_full",
        functools.partial(pfused.frames_rfft_full, interpret=True))
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_FUSED", "1")
    ref = np.asarray(zaftpu.stft(sig, win, 1024))
    monkeypatch.setenv("ZAFTPU_FULLSPEC", "1")
    out = np.asarray(zaftpu.stft(sig, win, 1024))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("prec", ["highest", "split4"])
def test_fused2_two_output_matches_per_component(monkeypatch, prec):
    """The two-output single-call analysis kernel (frames formed once)
    must match the per-component formulation in both precision schemes."""
    from zaftpu.pallas import fused as pfused

    monkeypatch.setenv("ZAFTPU_PRECISION", prec)
    wl, step, t = 2048, 1024, 93
    rng = np.random.default_rng(21)
    padded = rng.standard_normal(t * step + wl - step).astype(np.float32)
    win = hamming(wl).astype(np.float32)
    ref = pfused.frames_rfft(jnp.asarray(padded), jnp.asarray(win), wl,
                             step, t, interpret=True)
    monkeypatch.setenv("ZAFTPU_FUSED2", "1")
    out = pfused.frames_rfft(jnp.asarray(padded), jnp.asarray(win), wl,
                             step, t, interpret=True)
    assert out.shape == ref.shape
    scale = float(np.abs(np.asarray(jnp.real(ref))).max())
    np.testing.assert_allclose(np.asarray(jnp.real(out)),
                               np.asarray(jnp.real(ref)),
                               atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(jnp.imag(out)),
                               np.asarray(jnp.imag(ref)),
                               atol=1e-6 * scale)
