"""CQT kernel/spectrogram/chromagram parity and blocked-application tests."""

import numpy as np
import pytest

from zaftpu import cqtchromagram, cqtkernel, cqtspectrogram

SR, OR, FMIN, FMAX, TRES = 44100, 24, 55, 3520, 25


@pytest.fixture(scope="module")
def kernel():
    return cqtkernel(SR, OR, FMIN, FMAX)


def test_kernel_shape_and_sparsity(kernel):
    # Measured on reference config: (144, 32768), nnz 9450 (SURVEY.md §2.2).
    assert kernel.shape == (144, 32768)
    assert (kernel.kernel != 0).sum() == 9450


def test_kernel_bitwise_vs_reference(golden, kernel):
    shape = tuple(golden["cqt_kernel_shape"])
    ref = np.zeros(shape, dtype=np.complex128)
    ref[golden["cqt_kernel_rows"], golden["cqt_kernel_cols"]] = \
        golden["cqt_kernel_vals"]
    np.testing.assert_allclose(kernel.kernel, ref, atol=1e-18)


def test_kernel_cached(kernel):
    assert cqtkernel(SR, OR, FMIN, FMAX) is kernel


def test_reduced_form_consistent(kernel):
    dense = kernel.kernel
    np.testing.assert_array_equal(dense[:, kernel.columns_low],
                                  kernel.reduced_low)
    np.testing.assert_array_equal(dense[:, kernel.columns_high],
                                  kernel.reduced_high)
    # Every nonzero column is accounted for.
    nz = np.nonzero(np.any(dense != 0, axis=0))[0]
    got = np.sort(np.concatenate([kernel.columns_low, kernel.columns_high]))
    np.testing.assert_array_equal(nz, got)


def test_cqtspectrogram_golden(golden, signal, kernel):
    mine = np.asarray(cqtspectrogram(signal, SR, TRES, kernel))
    assert mine.shape == golden["cqtspectrogram"].shape
    np.testing.assert_allclose(mine, golden["cqtspectrogram"], atol=1e-12)


def test_cqtchromagram_golden(golden, signal, kernel):
    mine = np.asarray(cqtchromagram(signal, SR, TRES, OR, kernel))
    assert mine.shape == golden["cqtchromagram"].shape
    np.testing.assert_allclose(mine, golden["cqtchromagram"], atol=1e-12)


def test_accepts_dense_matrix(signal, kernel):
    a = np.asarray(cqtspectrogram(signal, SR, TRES, kernel))
    b = np.asarray(cqtspectrogram(signal, SR, TRES, kernel.kernel))
    np.testing.assert_array_equal(a, b)


def test_block_boundary_continuity(signal, kernel):
    """Frame counts that are not multiples of the device block size must agree
    with a longer signal's prefix — catches block-edge padding bugs."""
    long = np.concatenate([signal, signal])
    short_out = np.asarray(cqtspectrogram(signal, SR, TRES, kernel))
    long_out = np.asarray(cqtspectrogram(long, SR, TRES, kernel))
    step = round(SR / TRES)
    t_short = len(signal) // step
    # Frames fully inside the shared prefix (away from the end-padding reach
    # of the 32768-sample kernel window) must be identical.
    safe = t_short - (kernel.fft_length // step + 1)
    np.testing.assert_allclose(long_out[:, :safe], short_out[:, :safe],
                               atol=1e-12)


def test_f32_tolerance(golden, signal, kernel):
    mine = np.asarray(cqtspectrogram(signal.astype(np.float32), SR, TRES,
                                     kernel))
    assert mine.dtype == np.float32
    ref = golden["cqtspectrogram"]
    np.testing.assert_allclose(mine, ref, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("ssr,sor,sfmin,sfmax", [(22050, 12, 110, 3520),
                                                 (48000, 36, 60, 6000)])
def test_kernel_param_sweep_vs_reference(golden, ssr, sor, sfmin, sfmax):
    tag = f"cqtk_{ssr}_{sor}_{sfmin}_{sfmax}"
    shape = tuple(golden[f"{tag}_shape"])
    ref = np.zeros(shape, dtype=np.complex128)
    ref[golden[f"{tag}_rows"], golden[f"{tag}_cols"]] = golden[f"{tag}_vals"]
    mine = cqtkernel(ssr, sor, sfmin, sfmax)
    assert mine.shape == shape
    np.testing.assert_allclose(mine.kernel, ref, atol=1e-18)


def test_batched_cqt(signal, kernel):
    """Batched leading axes supported in both dtypes (review finding)."""
    batch64 = np.stack([signal[:44100], np.roll(signal[:44100], 777)])
    out = np.asarray(cqtspectrogram(batch64, SR, TRES, kernel))
    for i in range(2):
        np.testing.assert_allclose(
            out[i], np.asarray(cqtspectrogram(batch64[i], SR, TRES, kernel)),
            atol=1e-12)
    batch32 = batch64.astype(np.float32)
    out32 = np.asarray(cqtspectrogram(batch32, SR, TRES, kernel))
    assert out32.shape == out.shape
    chroma = np.asarray(cqtchromagram(batch32, SR, TRES, OR, kernel))
    assert chroma.shape == (2, OR, out.shape[-1])


def test_batched_cqt_sharded(signal, kernel):
    import jax

    from zaftpu.sharding import cqtspectrogram_sharded, make_mesh_2d

    if len(jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs 8 devices")
    mesh2 = make_mesh_2d(2, 4)
    batch = np.stack([signal, np.roll(signal, 999)]).astype(np.float32)
    out = np.asarray(cqtspectrogram_sharded(batch, SR, TRES, kernel, mesh2))
    for i in range(2):
        ref = np.asarray(cqtspectrogram(batch[i], SR, TRES, kernel))
        np.testing.assert_allclose(out[i], ref, atol=5e-4)


def test_cqt_inside_two_user_jits_no_tracer_leak():
    """The device-kernel cache must not capture trace constants: calling the
    CQT from two different user jits with the same kernel object previously
    leaked the first jit's tracers into the second (found adding the sharded
    CQT to dryrun_multichip, round 2)."""
    import jax

    kern = cqtkernel(8000, 12, 110.0, 880.0)
    x = np.random.default_rng(5).standard_normal(8000).astype(np.float32)

    @jax.jit
    def f1(sig):
        return cqtspectrogram(sig, 8000, 25, kern).sum()

    @jax.jit
    def f2(sig):
        return cqtspectrogram(sig, 8000, 25, kern).sum() * 2.0

    a = float(f1(x))
    b = float(f2(x))
    assert np.isfinite(a) and np.isfinite(b)
    np.testing.assert_allclose(b, 2.0 * a, rtol=1e-6)


