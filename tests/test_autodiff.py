"""Differentiability and vmap-compatibility gates.

Unlike the reference (pure NumPy), every transform here is a JAX program:
differentiable end-to-end (trainable front-ends, masking losses) and
composable with vmap/jit. These tests gate that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zaftpu
from zaftpu.core.windows import hamming, vorbis
from zaftpu.features.mel import _LOG_EPS


@pytest.fixture(scope="module")
def sig():
    return np.random.default_rng(0).standard_normal(8192)


@pytest.fixture(scope="module")
def win():
    return hamming(512)


def _check_grad_matches_fd(loss, x, eps=1e-6, atol=2e-4):
    """Spot-check autodiff gradient vs central differences."""
    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    rng = np.random.default_rng(1)
    for idx in rng.integers(0, len(x), 5):
        e = np.zeros_like(x)
        e[idx] = eps
        fd = (loss(jnp.asarray(x + e)) - loss(jnp.asarray(x - e))) / (2 * eps)
        assert abs(g[idx] - float(fd)) < atol, (idx, g[idx], float(fd))


def test_grad_through_spectrogram(sig, win):
    def loss(x):
        spec = jnp.abs(zaftpu.stft(x, win, 256)[1:257])
        return jnp.sum(spec ** 2)

    _check_grad_matches_fd(loss, sig)


def test_grad_through_mfcc(sig, win):
    fbank = zaftpu.melfilterbank(44100, 512, 20)

    def loss(x):
        return jnp.sum(zaftpu.mfcc(x, win, 256, fbank, 12) ** 2)

    _check_grad_matches_fd(loss, sig, atol=2e-3)


def test_grad_through_mdct_roundtrip(sig):
    tdac = vorbis(512)

    def loss(x):
        rec = zaftpu.imdct(zaftpu.mdct(x, tdac), tdac)
        return jnp.sum(rec ** 2)

    _check_grad_matches_fd(loss, sig)


def test_grad_wrt_window(sig):
    """The window itself is differentiable — trainable analysis windows."""
    win0 = jnp.asarray(hamming(512))

    def loss(w):
        spec = jnp.abs(zaftpu.stft(sig, w, 256)[1:257])
        return jnp.mean(spec)

    g = np.asarray(jax.grad(loss)(win0))
    assert g.shape == (512,)
    assert np.abs(g).max() > 0
    assert np.isfinite(g).all()


def test_grad_through_istft_mask(sig, win):
    """Gradient flows through a masking pipeline (source separation)."""
    spec = zaftpu.stft(sig, win, 256)

    def loss(mask_logits):
        mask = jax.nn.sigmoid(mask_logits)
        rec = zaftpu.istft(spec * mask, win, 256)
        return jnp.sum(rec ** 2)

    logits = jnp.zeros(spec.shape)
    g = jax.grad(loss)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_grad_through_dct(sig):
    def loss(x):
        return jnp.sum(zaftpu.dct(x[:512], 2) ** 2)

    # Parseval: d/dx sum(DCT(x)^2) == 2x on the segment, 0 elsewhere.
    g = np.asarray(jax.grad(loss)(jnp.asarray(sig)))
    np.testing.assert_allclose(g[:512], 2 * sig[:512], atol=1e-10)
    np.testing.assert_allclose(g[512:], 0, atol=1e-12)


def test_vmap_stft(sig, win):
    batch = jnp.stack([jnp.asarray(sig), jnp.asarray(sig[::-1].copy())])
    vm = jax.vmap(lambda x: zaftpu.stft(x, win, 256))(batch)
    direct = zaftpu.stft(batch, win, 256)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(direct),
                               atol=1e-12)


def test_vmap_mfcc(sig, win):
    fbank = zaftpu.melfilterbank(44100, 512, 20)
    batch = jnp.stack([jnp.asarray(sig)] * 3)
    vm = jax.vmap(lambda x: zaftpu.mfcc(x, win, 256, fbank, 12))(batch)
    one = zaftpu.mfcc(sig, win, 256, fbank, 12)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(vm[i]), np.asarray(one),
                                   atol=1e-12)


def test_jit_composability(sig, win):
    """Transforms compose inside a user jit without retracing surprises."""
    fbank = zaftpu.melfilterbank(44100, 512, 20)

    @jax.jit
    def pipeline(x):
        mel = zaftpu.melspectrogram(x, win, 256, fbank)
        return jnp.log(mel + _LOG_EPS).mean()

    a = float(pipeline(jnp.asarray(sig)))
    b = float(pipeline(jnp.asarray(sig)))
    assert a == b and np.isfinite(a)
