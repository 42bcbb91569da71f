"""bf16 MXU fast-path gates (VERDICT.md round 1, item 5).

``zaftpu.compute_dtype("bfloat16")`` lowers operator-matmul operands (CQT
fused kernel, mel filterbank, MFCC DCT matrix) to bf16 with f32
accumulation. Thresholds below were measured on CPU (XLA bf16 emulation is
bit-identical math to TPU bf16 operands with f32 accumulation): mel 66 dB,
CQT 56 dB, MFCC 36 dB vs the f32 path on 5 s of seeded noise.
"""

import numpy as np
import pytest

import zaftpu
from zaftpu.core.windows import hamming

SR, WL, STEP = 44100, 2048, 1024


def _snr(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    return 10 * np.log10((ref ** 2).sum() / ((ref - got) ** 2).sum())


@pytest.fixture(scope="module")
def x32():
    return np.random.default_rng(0).standard_normal(SR * 2).astype(np.float32)


@pytest.fixture(scope="module")
def fbank():
    return zaftpu.melfilterbank(SR, WL, 40)


@pytest.fixture(scope="module")
def kern():
    return zaftpu.cqtkernel(SR, 24, 55.0, 3520.0)


def test_bf16_flag_exported():
    assert zaftpu.BF16_SUPPORTED


def test_mel_bf16_accuracy_and_dtype(x32, fbank):
    win = hamming(WL).astype(np.float32)
    ref = zaftpu.melspectrogram(x32, win, STEP, fbank)
    with zaftpu.compute_dtype("bfloat16"):
        got = zaftpu.melspectrogram(x32, win, STEP, fbank)
    assert got.dtype == np.float32  # activations/outputs stay f32
    assert _snr(ref, got) > 55.0


def test_cqt_bf16_accuracy(x32, kern):
    ref = zaftpu.cqtspectrogram(x32, SR, 25, kern)
    with zaftpu.compute_dtype("bf16"):
        got = zaftpu.cqtspectrogram(x32, SR, 25, kern)
    assert got.dtype == np.float32
    assert _snr(ref, got) > 45.0


def test_mfcc_bf16_accuracy(x32, fbank):
    win = hamming(WL).astype(np.float32)
    ref = zaftpu.mfcc(x32, win, STEP, fbank, 20)
    with zaftpu.compute_dtype("bfloat16"):
        got = zaftpu.mfcc(x32, win, STEP, fbank, 20)
    assert _snr(ref, got) > 28.0


def test_policy_restores_exactly(x32, fbank):
    win = hamming(WL).astype(np.float32)
    ref = np.asarray(zaftpu.melspectrogram(x32, win, STEP, fbank))
    with zaftpu.compute_dtype("bfloat16"):
        pass
    again = np.asarray(zaftpu.melspectrogram(x32, win, STEP, fbank))
    np.testing.assert_array_equal(ref, again)


def test_f64_oracle_never_lowered(fbank):
    """The f64 parity path must ignore the bf16 policy entirely."""
    x64 = np.random.default_rng(1).standard_normal(SR)
    win = hamming(WL)
    ref = np.asarray(zaftpu.melspectrogram(x64, win, STEP, fbank))
    with zaftpu.compute_dtype("bfloat16"):
        got = np.asarray(zaftpu.melspectrogram(x64, win, STEP, fbank))
    assert got.dtype == np.float64
    np.testing.assert_array_equal(ref, got)


def test_env_var_path(x32, kern, monkeypatch):
    with zaftpu.compute_dtype("bfloat16"):
        ref = np.asarray(zaftpu.cqtspectrogram(x32, SR, 25, kern))
    monkeypatch.setenv("ZAFTPU_DTYPE", "bfloat16")
    got = np.asarray(zaftpu.cqtspectrogram(x32, SR, 25, kern))
    np.testing.assert_array_equal(ref, got)


def test_invalid_dtype_rejected():
    with pytest.raises(ValueError, match="bfloat16"):
        with zaftpu.compute_dtype("int8"):
            pass


def test_sharded_bf16_equivalent(x32, kern, fbank):
    """The sharded bf16 paths must match single-device bf16 within the f32
    accumulation bound (dots reassociate per shard split — same caveat as
    the f32 sharded CQT gate in test_sharding.py)."""
    import jax

    from zaftpu.sharding import (cqtspectrogram_sharded, make_mesh,
                                 melspectrogram_sharded)

    devices = jax.devices()
    if len(devices) < 4:
        devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4, devices=devices)
    win = hamming(WL).astype(np.float32)
    with zaftpu.compute_dtype("bfloat16"):
        ref_c = np.asarray(zaftpu.cqtspectrogram(x32, SR, 25, kern))
        got_c = np.asarray(cqtspectrogram_sharded(x32, SR, 25, kern, mesh))
        ref_m = np.asarray(zaftpu.melspectrogram(x32, win, STEP, fbank))
        got_m = np.asarray(melspectrogram_sharded(x32, win, STEP, fbank,
                                                  mesh))
    np.testing.assert_allclose(got_c, ref_c, atol=5e-4)
    np.testing.assert_allclose(got_m, ref_m, rtol=1e-4, atol=1e-6)

def test_f32_matmul_requests_highest_precision():
    """The f32 operator-matmul path must request Precision.HIGHEST: XLA's
    default TPU matmul truncates f32 operands to bf16 (one MXU pass), which
    would make the f32 path bit-identical to the bf16 path on hardware
    (observed on-chip 2026-08-17: SNR(bf16 vs f32) = inf). CPU tests cannot
    observe the truncation itself, so pin the precision request in the jaxpr.
    """
    import jax
    import jax.numpy as jnp

    from zaftpu.core import policy

    jaxpr = jax.make_jaxpr(policy.mxu_matmul)(
        jnp.zeros((4, 8), jnp.float32), jnp.zeros((8, 3), jnp.float32))
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots, "mxu_matmul f32 path must lower to dot_general"
    for eqn in dots:
        assert eqn.params["precision"] == (
            jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)


def test_bf16_matmul_stays_single_pass():
    """The bf16 path must NOT request HIGHEST (that would defeat the one-pass
    MXU speedup): default precision with bf16 operands is the fast mode."""
    import jax
    import jax.numpy as jnp

    from zaftpu.core import policy

    jaxpr = jax.make_jaxpr(policy.mxu_matmul)(
        jnp.zeros((4, 8), jnp.float32), jnp.zeros((8, 3), jnp.bfloat16))
    dots = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert dots
    for eqn in dots:
        assert eqn.params["precision"] != (
            jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)

def test_precision_lever(monkeypatch):
    """ZAFTPU_PRECISION selects the exact-path MXU decomposition depth."""
    import jax

    from zaftpu.core import policy

    assert policy.matmul_precision() == jax.lax.Precision.HIGHEST
    monkeypatch.setenv("ZAFTPU_PRECISION", "high")
    assert policy.matmul_precision() == jax.lax.Precision.HIGH
    monkeypatch.setenv("ZAFTPU_PRECISION", "default")
    assert policy.matmul_precision() == jax.lax.Precision.DEFAULT
    monkeypatch.setenv("ZAFTPU_PRECISION", "bogus")
    with pytest.raises(ValueError):
        policy.matmul_precision()
