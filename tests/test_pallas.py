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
                                       (1024, 128, 40)])
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
