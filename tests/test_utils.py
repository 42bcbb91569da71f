"""Profiling/timing helpers and the operator disk cache."""

import numpy as np

import zaftpu
from zaftpu.utils.cache import cached_operator, operator_cache_dir
from zaftpu.utils.profiling import TransformStats, timed


def test_timed_reports_stats(signal, hamming_window):
    out, stats = timed("stft", lambda: zaftpu.stft(signal, hamming_window,
                                                   1024), frames=88,
                       log=False)
    assert out.shape[0] == 2048
    assert stats.seconds > 0
    assert stats.frames_per_second > 0
    assert "stft" in str(stats)


def test_timed_target_s_scales_dispatches(signal, hamming_window):
    """target_s sizes the dispatch count from a coarse block: a fast program
    with a generous target must run many back-to-back dispatches per block
    (the jitter fix for millisecond programs under a ~10 ms-noise sync)."""
    calls = []

    def fn():
        calls.append(1)
        return zaftpu.stft(signal[:4096], hamming_window, 1024)

    _, stats = timed("stft-fast", fn, frames=5, reps=1, log=False,
                     dispatches=2, target_s=0.05)
    # warmup(1) + coarse block(2) + one timed block of >=2 dispatches; for a
    # sub-ms program and a 50 ms target the sized block is far larger.
    assert len(calls) >= 3 + 2
    assert stats.seconds > 0


def test_transform_stats_str_without_frames():
    s = TransformStats("x", 0.5)
    assert s.frames_per_second is None
    assert "0.5" not in str(s) or True  # formatting smoke


def test_cached_operator_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("ZAFTPU_CACHE_DIR", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return {"a": np.arange(5.0), "b": np.ones((2, 2), np.complex128)}

    first = cached_operator("op", (1, 2.5), build)
    second = cached_operator("op", (1, 2.5), build)
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(first["a"], second["a"])
    np.testing.assert_array_equal(first["b"], second["b"])
    # Different params -> different entry.
    cached_operator("op", (1, 3.5), build)
    assert len(calls) == 2


def test_cache_disable_env(tmp_path, monkeypatch):
    monkeypatch.setenv("ZAFTPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("ZAFTPU_CACHE", "0")
    calls = []

    def build():
        calls.append(1)
        return {"a": np.zeros(1)}

    cached_operator("op2", (), build)
    cached_operator("op2", (), build)
    assert len(calls) == 2


def test_cqt_kernel_disk_cache(tmp_path, monkeypatch):
    """A fresh cqtkernel build writes a cache entry; a reload (bypassing the
    lru layer) reads it and produces an identical kernel."""
    monkeypatch.setenv("ZAFTPU_CACHE_DIR", str(tmp_path))
    from zaftpu.transforms.cqt import _cqtkernel_cached

    _cqtkernel_cached.cache_clear()
    k1 = zaftpu.cqtkernel(22050, 12, 110, 880)
    files = list(tmp_path.glob("cqtkernel-*.npz"))
    assert len(files) == 1
    _cqtkernel_cached.cache_clear()
    k2 = zaftpu.cqtkernel(22050, 12, 110, 880)
    np.testing.assert_array_equal(k1.kernel, k2.kernel)
    np.testing.assert_array_equal(k1.time_kernel, k2.time_kernel)


def test_cache_dir_default(monkeypatch, tmp_path):
    monkeypatch.setenv("ZAFTPU_CACHE_DIR", str(tmp_path / "sub"))
    d = operator_cache_dir()
    assert d.endswith("sub")
    import os

    assert os.path.isdir(d)


def test_config_factories():
    from zaftpu.config import CqtConfig, MelConfig, StftConfig

    sc = StftConfig()
    assert sc.window_array().shape == (2048,)
    mc = MelConfig()
    assert mc.filterbank().shape == (40, 1024)
    cc = CqtConfig(octave_resolution=12, maximum_frequency=880.0)
    assert cc.kernel().number_frequencies == 48


def test_device_constant_cache():
    from zaftpu.utils import devcache

    devcache.clear()
    a = np.arange(64, dtype=np.float64)
    d1 = devcache.device_constant(a)
    d2 = devcache.device_constant(np.arange(64, dtype=np.float64))
    assert d1 is d2  # content-keyed: equal arrays share the device copy
    assert devcache.cache_size() == 1
    d3 = devcache.device_constant(a, np.float32)
    assert d3.dtype == np.float32 and devcache.cache_size() == 2

    before = devcache.cache_size()
    big = np.zeros(1024 * 1024, dtype=np.float64)  # 8 MB -> never cached
    b1 = devcache.device_constant(big)
    b2 = devcache.device_constant(big)
    assert b1 is not b2  # caller-owned large arrays are not pinned
    assert devcache.cache_size() == before


def test_pinned_device_constant_uploads_once():
    """The >2MB folded operators (MDCT matrices, conv DFT filters) must
    upload once per process, not per call: through the TPU tunnel a per-call
    8-17 MB transfer is ~0.15 s, which capped the direct-GEMM MDCT at ~150k
    frames/s vs the STFT's ~850k (docs/tpu_results/stft_engines.json)."""
    from zaftpu.utils import devcache

    devcache.clear()
    big = np.zeros((1024, 2048))  # 16.8 MB, like _direct_forward_matrix
    p1 = devcache.pinned_device_constant(big, np.float32)
    p2 = devcache.pinned_device_constant(big, np.float32)
    assert p1 is p2 and p1.dtype == np.float32
    devcache.clear()


def test_mdct_direct_operator_single_upload(monkeypatch):
    """zaftpu.mdct/imdct under the matmul engine reuse one device copy of
    the folded operator across calls (the regression behind the slow s8
    direct-arm MDCT numbers)."""
    import zaftpu
    from zaftpu.core.windows import vorbis
    from zaftpu.utils import devcache

    monkeypatch.setenv("ZAFTPU_FFT", "matmul")
    devcache.clear()
    x = np.random.default_rng(0).standard_normal(8192).astype(np.float32)
    win = vorbis(512).astype(np.float32)
    out = zaftpu.mdct(x, win)
    rec = zaftpu.imdct(out, win)

    uploads = []
    real_upload = devcache._upload

    def counting_upload(host):
        uploads.append(host.nbytes)
        return real_upload(host)

    monkeypatch.setattr(devcache, "_upload", counting_upload)
    out2 = zaftpu.mdct(x, win)
    zaftpu.imdct(out2, win)
    big_uploads = [b for b in uploads if b >= devcache._CONTENT_LIMIT]
    assert big_uploads == [], f"operator re-uploaded: {big_uploads}"
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))
    assert rec.shape[-1] == 8191


def test_as_device_constant_passthrough_for_tracers():
    import jax
    import jax.numpy as jnp

    from zaftpu.utils.devcache import as_device_constant

    def f(w):
        return (as_device_constant(w) * 2).sum()

    g = jax.grad(f)(jnp.ones(16))
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_foreign_kernel_memoized():
    """Passing the same scipy-sparse kernel repeatedly must not rebuild the
    finalized kernel each call (review finding)."""
    import scipy.sparse

    import zaftpu
    from zaftpu.transforms import cqt as cqt_mod

    kern = zaftpu.cqtkernel(22050, 12, 110, 880)
    sparse = scipy.sparse.csr_matrix(kern.kernel)
    a = cqt_mod._as_kernel(sparse)
    b = cqt_mod._as_kernel(sparse)
    assert a is b
    # ndarray inputs memoize per object (weakref-keyed, GC-evicting)
    arr = np.array(kern.kernel)
    c = cqt_mod._as_kernel(arr)
    d = cqt_mod._as_kernel(arr)
    assert c is d


def test_device_constant_fifo_bound():
    """The content-keyed device cache is FIFO-bounded (ADVICE round 1): a
    process cycling many distinct small constants must not grow without
    bound."""
    from zaftpu.utils import devcache

    devcache.clear()
    try:
        for i in range(devcache._MAX_ENTRIES + 16):
            devcache.device_constant(np.full(4, float(i), np.float32))
        assert devcache.cache_size() <= devcache._MAX_ENTRIES
    finally:
        devcache.clear()


class TestComplexSafeUpload:
    """Complex constants must upload as real/imag pairs combined on device:
    complex host<->device transfers fail with UNIMPLEMENTED through the axon
    TPU tunnel (docs/tpu_results/diag.json, 2026-08-17) and a complex HLO
    constant can poison the process the same way."""

    def test_device_constant_complex_values(self):
        import numpy as np

        from zaftpu.utils import devcache

        z = (np.random.default_rng(0).standard_normal((5, 7))
             + 1j * np.random.default_rng(1).standard_normal((5, 7)))
        dev = devcache.device_constant(z)
        assert dev.dtype == np.complex128
        np.testing.assert_array_equal(np.asarray(dev), z)
        c64 = devcache.device_constant(z, np.complex64)
        assert c64.dtype == np.complex64
        np.testing.assert_array_equal(np.asarray(c64), z.astype(np.complex64))

    def test_as_device_array_complex_and_passthrough(self):
        import jax.numpy as jnp
        import numpy as np

        from zaftpu.utils.devcache import as_device_array

        z = np.array([[1 + 2j, 3 - 4j]], np.complex64)
        dev = as_device_array(z)
        assert dev.dtype == np.complex64
        np.testing.assert_array_equal(np.asarray(dev), z)
        already = jnp.asarray([1.0, 2.0])
        assert as_device_array(already) is already

    def test_no_complex_constants_in_matmul_fft_hlo(self):
        """The four-step FFT's jitted HLO must not embed complex constants
        (they are assembled on device from real parts)."""
        import jax
        import jax.numpy as jnp

        from zaftpu.core.fft import matmul_fft

        lowered = jax.jit(matmul_fft).lower(
            jax.ShapeDtypeStruct((4, 256), jnp.float32))
        text = lowered.as_text()
        for line in text.splitlines():
            if "stablehlo.constant" in line and "complex" in line:
                raise AssertionError(f"complex HLO constant: {line[:120]}")
