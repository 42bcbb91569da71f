"""Fused synthesis kernel (pallas/synth.py) vs the XLA engine paths
(interpret mode).

The kernel fuses the inverse-operator GEMM and the overlap-add into one
pass; these gates pin its indexing/DMA-edge logic and both precision
schemes against the split GEMM-then-OLA programs it replaces
(zaf.py:213-243 ISTFT semantics, zaf.py:1124-1184 IMDCT semantics). Real
Mosaic execution of the same kernel is exercised on hardware
(scripts/tpu_stages).
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import zaftpu
from zaftpu.core import fft as cfft
from zaftpu.core import frame as xla_frame
from zaftpu.core.windows import hamming, vorbis
from zaftpu.pallas import synth as psynth


def _xla_istft_ola(h_re, h_im, n, step, scale):
    frames = cfft.direct_real_ifft_folded(h_re, h_im, n, scale)
    return xla_frame.overlap_add(frames, step)


@pytest.mark.parametrize("n,step,t", [(2048, 1024, 37), (2048, 1024, 300),
                                      (512, 128, 64), (256, 128, 3),
                                      (2048, 1024, 5)])
def test_istft_ola_matches_xla(n, step, t, monkeypatch):
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    rng = np.random.default_rng(0)
    half = n // 2 + 1
    h_re = rng.standard_normal((t, half)).astype(np.float32)
    h_im = rng.standard_normal((t, half)).astype(np.float32)
    scale = 0.7310586
    ref = np.asarray(_xla_istft_ola(jnp.asarray(h_re), jnp.asarray(h_im),
                                    n, step, scale))
    out = np.asarray(psynth.istft_ola(jnp.asarray(h_re), jnp.asarray(h_im),
                                      n, step, scale, interpret=True))
    assert out.shape == ref.shape
    tol = 2e-6 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=tol)


@pytest.mark.parametrize("f,t", [(1024, 64), (1024, 7), (128, 40)])
def test_imdct_ola_matches_xla(f, t, monkeypatch):
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    from zaftpu.transforms.mdct import (_direct_inverse_windowed_matrix,
                                        _host_window_bytes)

    win = vorbis(2 * f)
    wbytes = _host_window_bytes(win)
    rng = np.random.default_rng(1)
    coeffs = rng.standard_normal((t, f)).astype(np.float32)
    matrix = _direct_inverse_windowed_matrix(f, wbytes).astype(np.float32)
    frames = jnp.asarray(coeffs) @ jnp.asarray(matrix)
    ref = np.asarray(xla_frame.overlap_add(frames, f))
    out = np.asarray(psynth.imdct_ola(jnp.asarray(coeffs), f, wbytes,
                                      interpret=True))
    assert out.shape == ref.shape
    tol = 2e-6 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=tol)


def test_istft_ola_split4_matches_policy(monkeypatch):
    """Under the split4 dial the kernel's in-VMEM 4-pass scheme must match
    the XLA policy scheme (policy._split4_matmul feeding the OLA)."""
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    monkeypatch.setenv("ZAFTPU_PRECISION", "split4")
    n, step, t = 2048, 1024, 93
    rng = np.random.default_rng(2)
    half = n // 2 + 1
    h_re = rng.standard_normal((t, half)).astype(np.float32)
    h_im = rng.standard_normal((t, half)).astype(np.float32)
    ref = np.asarray(_xla_istft_ola(jnp.asarray(h_re), jnp.asarray(h_im),
                                    n, step, 1.0))
    out = np.asarray(psynth.istft_ola(jnp.asarray(h_re), jnp.asarray(h_im),
                                      n, step, 1.0, interpret=True))
    assert out.shape == ref.shape
    tol = 1e-5 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=tol)


def test_istft_dispatch_matches_xla(monkeypatch):
    """Full istft() through the fused synthesis-kernel dispatch equals the
    split engine program, and the round trip still reconstructs. CPU runs
    the kernel in interpret mode via a shim; on TPU the same dispatch hits
    real Mosaic."""
    rng = np.random.default_rng(3)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = hamming(2048).astype(np.float32)
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    spec = zaftpu.stft(sig, win, 1024)
    ref = np.asarray(zaftpu.istft(spec, win, 1024))
    monkeypatch.setattr(
        psynth, "istft_ola",
        functools.partial(psynth.istft_ola, interpret=True))
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_SYNTH", "1")
    out = np.asarray(zaftpu.istft(spec, win, 1024))
    assert out.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=3e-6 * scale)
    err = out[: len(sig)] - sig[: len(out)]
    snr = 10 * np.log10((sig[: len(out)] ** 2).sum() / (err**2).sum())
    assert snr > 96.0


def test_imdct_dispatch_matches_xla(monkeypatch):
    """Full imdct() through the fused synthesis-kernel dispatch equals the
    split direct-GEMM program (TDAC round trip preserved)."""
    rng = np.random.default_rng(4)
    sig = rng.standard_normal(50000).astype(np.float32)
    win = vorbis(2048).astype(np.float32)
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    coeffs = zaftpu.mdct(sig, win)
    ref = np.asarray(zaftpu.imdct(coeffs, win))
    monkeypatch.setattr(
        psynth, "imdct_ola",
        functools.partial(psynth.imdct_ola, interpret=True))
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_SYNTH", "1")
    out = np.asarray(zaftpu.imdct(coeffs, win))
    assert out.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=3e-6 * scale)
    err = out[: len(sig) - 1] - sig[: len(out)][:-1] if len(out) >= len(sig) \
        else out - sig[: len(out)]
    ss = sig[: len(err)]
    snr = 10 * np.log10((ss**2).sum() / (err**2).sum())
    assert snr > 96.0


def test_sharded_istft_fused_kernel_matches(monkeypatch):
    """Sharded ISTFT with the fused synthesis kernel in the shard_map body
    (interpret shim standing in for the TPU mesh) equals the single-device
    kernel path bit-for-bit at 1/4 shards."""
    import jax

    from zaftpu.sharding import istft_sharded, make_mesh
    from zaftpu.sharding import sharded as _sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    rng = np.random.default_rng(5)
    sig = rng.standard_normal(40000).astype(np.float32)
    win = hamming(512).astype(np.float32)
    spec = zaftpu.stft(sig, win, 256)  # before PALLAS=1: CPU has no Mosaic
    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_SYNTH", "1")
    monkeypatch.setattr(
        psynth, "istft_ola",
        functools.partial(psynth.istft_ola, interpret=True))
    monkeypatch.setattr(_sharded, "_mesh_on_tpu", lambda mesh: True)
    ref = np.asarray(zaftpu.istft(spec, win, 256))
    # Scale-aware closeness, not bitwise: XLA *CPU* executions are not
    # run-to-run bitwise deterministic under threadpool load (~1 ulp at
    # data scale — CLAUDE.md); hardware bit-identity is the s13 stage's
    # gate. The kernel runs per shard, so any real indexing error would be
    # orders of magnitude above this tolerance.
    scale = float(np.abs(ref).max())
    for size in (1, 4):
        mesh = make_mesh(size)
        out = np.asarray(istft_sharded(spec, win, 256, mesh))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-6 * scale)

def test_kernel_wanted_bounds(monkeypatch):
    """Eligibility guards: operators beyond the raised scoped budget and
    K=1 (no overlap) geometries must NOT dispatch — they would OOM the
    scoped stack / hit a zero-row carry and poison the process-wide Pallas
    health latch through the guarded retry."""
    import jax.numpy as jnp

    monkeypatch.setenv("ZAFTPU_PALLAS", "1")
    monkeypatch.setenv("ZAFTPU_SYNTH", "1")
    # WL=2048 ISTFT stack (~18.9 MB): eligible.
    assert psynth.kernel_wanted(2048, 1024, jnp.float32, 2, 2,
                                psynth._kpad(1025))
    # WL=4096 ISTFT stack (~2*2176*4096*4 = 71 MB): over the bound.
    assert not psynth.kernel_wanted(4096, 2048, jnp.float32, 2, 2,
                                    psynth._kpad(2049))
    # F=2048 IMDCT operator (33.5 MB): over the bound.
    assert not psynth.kernel_wanted(4096, 2048, jnp.float32, 2, 1, 2048)
    # K=1 (step == n): no overlap, the split path owns it.
    assert not psynth.kernel_wanted(1024, 1024, jnp.float32, 2, 2,
                                    psynth._kpad(513))
    # Batched input: kernel is 2-D only.
    assert not psynth.kernel_wanted(2048, 1024, jnp.float32, 3, 2,
                                    psynth._kpad(1025))
