"""Resumable streaming pipeline: parity with whole-signal transforms and
checkpoint/resume behavior."""

import numpy as np
import pytest
import scipy.io.wavfile

import zaftpu
from zaftpu.core.windows import hamming
from zaftpu.io.pipeline import (
    StreamingTransform,
    streaming_melspectrogram,
    streaming_spectrogram,
)

WL, STEP = 512, 256


@pytest.fixture()
def wav(tmp_path, golden):
    data = (golden["signal"] * 32767).astype(np.int16)
    path = tmp_path / "sig.wav"
    scipy.io.wavfile.write(path, 44100, data)
    return str(path), data.astype(np.float64) / 32768.0


def test_streaming_spectrogram_matches_whole(wav):
    path, signal = wav
    win = hamming(WL)
    whole = np.abs(np.asarray(
        zaftpu.stft(signal.astype(np.float32), win.astype(np.float32),
                    STEP)))[1:WL // 2 + 1]
    streamed = streaming_spectrogram(path, win, STEP, block_frames=37)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-4)


def test_streaming_melspectrogram_matches_whole(wav):
    path, signal = wav
    win = hamming(WL)
    fbank = zaftpu.melfilterbank(44100, WL, 32)
    whole = np.asarray(zaftpu.melspectrogram(
        signal.astype(np.float32), win.astype(np.float32), STEP, fbank))
    streamed = streaming_melspectrogram(path, win, STEP, fbank,
                                        block_frames=50)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-3)


def test_checkpoint_resume(wav, tmp_path):
    """A crashed job resumes from its block checkpoints without recompute."""
    path, _ = wav
    win = hamming(WL)
    ckpt = str(tmp_path / "ckpt")
    calls = []

    import jax
    import jax.numpy as jnp

    from zaftpu.core import fft as _fft
    from zaftpu.core import frame as _frame
    from zaftpu.io.pipeline import _frame_plan

    pad_front, t = _frame_plan(path, WL, STEP)
    win_dev = jnp.asarray(win.astype(np.float32))

    def block_fn(samples):
        calls.append(1)
        b = (samples.shape[0] - (WL - STEP)) // STEP
        frames = _frame.extract_frames(jnp.asarray(samples), WL, STEP, b)
        return np.asarray(jnp.abs(_fft.rfft(frames * win_dev))[:, 1:])

    def make():
        return StreamingTransform(path, WL, STEP, pad_front, t, block_fn,
                                  block_frames=40, checkpoint_dir=ckpt)

    st = make()
    total_blocks = st.num_blocks
    assert total_blocks >= 3

    # Simulate a crash after two blocks.
    class Boom(Exception):
        pass

    def fail_after_two(i, n):
        if i >= 1:  # block 0 and 1 completed (progress fires post-save)
            raise Boom

    with pytest.raises(Boom):
        st.run(progress=fail_after_two)
    done_calls = len(calls)
    assert done_calls == 2

    # Resume: only the remaining blocks are computed.
    out = make().run()
    assert len(calls) == total_blocks
    assert out.shape == (t, WL // 2)

    # Third run: everything cached, zero compute.
    make().run()
    assert len(calls) == total_blocks


def test_read_span_zero_fill(wav):
    from zaftpu.io.stream import BlockReader

    path, signal = wav
    reader = BlockReader(path, 1000)
    span = reader.read_span(-100, 300)
    assert span.shape == (300,)
    np.testing.assert_array_equal(span[:100], 0)
    np.testing.assert_allclose(span[100:], signal[:200], atol=1e-4)
    tail = reader.read_span(reader.frames - 50, 200)
    np.testing.assert_array_equal(tail[50:], 0)
    np.testing.assert_allclose(tail[:50], signal[-50:], atol=1e-4)


def test_streaming_mfcc_matches_whole(wav):
    path, signal = wav
    win = hamming(WL)
    fbank = zaftpu.melfilterbank(44100, WL, 32)
    whole = np.asarray(zaftpu.mfcc(
        signal.astype(np.float32), win.astype(np.float32), STEP, fbank, 13))
    from zaftpu.io.pipeline import streaming_mfcc

    streamed = streaming_mfcc(path, win, STEP, fbank, 13, block_frames=41)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-3)


def test_streaming_cqt_matches_whole(wav):
    path, signal = wav
    kern = zaftpu.cqtkernel(44100, 12, 110.0, 3520.0)
    whole = np.asarray(zaftpu.cqtspectrogram(
        signal.astype(np.float32), 44100, 25, kern))
    from zaftpu.io.pipeline import streaming_cqtspectrogram

    streamed = streaming_cqtspectrogram(path, 44100, 25, kern,
                                        block_frames=7)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-4)
