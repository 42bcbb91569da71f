"""Display-layer parity: the six *show/sigplot helpers must place the same
ticks/labels as the reference (the only behavior the reference's display
layer has besides imshow). Runs the reference implementation directly when
mounted; skips otherwise."""

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

import zaftpu  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "zaf.py")),
    reason="reference not mounted")


@pytest.fixture(scope="module")
def zaf():
    sys.path.insert(0, REFERENCE)
    import zaf as reference

    return reference


def _ticks(fn, *args, **kwargs):
    plt.figure()
    fn(*args, **kwargs)
    ax = plt.gca()
    xt, yt = ax.get_xticks().copy(), ax.get_yticks().copy()
    xl = [t.get_text() for t in ax.get_xticklabels()]
    yl = [t.get_text() for t in ax.get_yticklabels()]
    plt.close("all")
    return xt, yt, xl, yl


def test_sigplot_ticks(zaf, signal):
    ours = _ticks(zaftpu.sigplot, signal, 44100, 1)
    ref = _ticks(zaf.sigplot, signal, 44100, 1)
    np.testing.assert_array_equal(ours[0], ref[0])
    assert ours[2] == ref[2]


def test_specshow_ticks(zaf, golden, signal):
    spec = np.abs(golden["stft"][1:1025])
    ours = _ticks(zaftpu.specshow, spec, len(signal), 44100, 1, 1000)
    ref = _ticks(zaf.specshow, spec, len(signal), 44100, 1, 1000)
    for i in (0, 1):
        np.testing.assert_array_equal(ours[i], ref[i])
    assert ours[2] == ref[2] and ours[3] == ref[3]


def test_melspecshow_ticks(zaf, golden, signal):
    mel = golden["melspectrogram"]
    ours = _ticks(zaftpu.melspecshow, mel, len(signal), 44100, 2048, 1)
    ref = _ticks(zaf.melspecshow, mel, len(signal), 44100, 2048, 1)
    for i in (0, 1):
        np.testing.assert_array_equal(ours[i], ref[i])
    assert ours[3] == ref[3]  # the mel->Hz y labels


def test_mfccshow_ticks(zaf, golden, signal):
    ours = _ticks(zaftpu.mfccshow, golden["mfcc"], len(signal), 44100, 1)
    ref = _ticks(zaf.mfccshow, golden["mfcc"], len(signal), 44100, 1)
    np.testing.assert_array_equal(ours[0], ref[0])


def test_cqtspecshow_ticks(zaf, golden):
    spec = golden["cqtspectrogram"]
    ours = _ticks(zaftpu.cqtspecshow, spec, 25, 24, 55, 1)
    ref = _ticks(zaf.cqtspecshow, spec, 25, 24, 55, 1)
    for i in (0, 1):
        np.testing.assert_array_equal(ours[i], ref[i])
    assert ours[3] == ref[3]  # log-spaced Hz labels


def test_cqtchromshow_ticks(zaf, golden):
    chroma = golden["cqtchromagram"]
    ours = _ticks(zaftpu.cqtchromshow, chroma, 25, 1)
    ref = _ticks(zaf.cqtchromshow, chroma, 25, 1)
    np.testing.assert_array_equal(ours[0], ref[0])
    assert ours[2] == ref[2]


def test_amplitude_to_db_strict_parity():
    """floor=None reproduces the reference's unclamped 20*log10
    (zaf.py:1303): silent bins are exactly -inf, nonzero bins exact."""
    from zaftpu.viz.display import amplitude_to_db

    mag = np.array([[0.0, 1.0], [0.5, 2.0]])
    with np.errstate(divide="ignore"):
        strict = amplitude_to_db(mag, None)
        ref = 20.0 * np.log10(mag)
    np.testing.assert_array_equal(strict, ref)
    assert strict[0, 0] == -np.inf
    # Default keeps the documented floor: finite everywhere, identical
    # above the floor.
    floored = amplitude_to_db(mag)
    assert np.isfinite(floored).all()
    np.testing.assert_array_equal(floored[mag > 0], ref[mag > 0])


def test_specshow_floor_none(golden, signal):
    """The floor=None escape hatch flows through the display helpers."""
    spec = np.abs(golden["stft"][1:1025]).copy()
    spec[0, 0] = 0.0
    with np.errstate(divide="ignore"):
        _ticks(zaftpu.specshow, spec, len(signal), 44100, 1, 1000,
               floor=None)
