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
    # Blocks 0 and 1 completed + block 2 dispatched speculatively (the
    # double-buffered pipeline keeps one block in flight; its result is
    # discarded on crash, the checkpoints are intact).
    done_calls = len(calls)
    assert done_calls == 3

    # Resume: only the remaining (un-checkpointed) blocks are computed.
    out = make().run()
    assert len(calls) == done_calls + (total_blocks - 2)
    assert out.shape == (t, WL // 2)

    # Third run: everything cached, zero compute.
    n_after_resume = len(calls)
    make().run()
    assert len(calls) == n_after_resume


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


def test_streaming_mdct_matches_whole(wav):
    path, signal = wav
    from zaftpu.core.windows import vorbis
    from zaftpu.io.pipeline import streaming_mdct

    win = vorbis(WL)
    whole = np.asarray(zaftpu.mdct(signal.astype(np.float32),
                                   win.astype(np.float32)))
    streamed = streaming_mdct(path, win, block_frames=23)
    assert streamed.shape == whole.shape
    np.testing.assert_allclose(streamed, whole, atol=1e-4)


def test_streaming_istft_roundtrip(wav, tmp_path):
    """streaming_istft(memmapped spectrogram) == whole-signal istft, via the
    written WAV file."""
    path, signal = wav
    win = hamming(WL).astype(np.float32)
    x = signal.astype(np.float32)
    spec = np.asarray(zaftpu.stft(x, win, STEP))
    whole = np.asarray(zaftpu.istft(spec, win, STEP))
    # Source served from disk, memory-mapped — the hour-scale usage shape.
    spec_path = tmp_path / "spec.npy"
    np.save(spec_path, spec)
    src = np.load(spec_path, mmap_mode="r")
    out_path = tmp_path / "rec.wav"
    from zaftpu.io.pipeline import streaming_istft

    n = streaming_istft(src, win, STEP, out_path, 44100, block_frames=37)
    assert n == whole.shape[0]
    rec, sr = zaftpu.wavread(out_path)
    assert sr == 44100
    rec = rec[:, 0] if rec.ndim == 2 else rec
    # 50% overlap -> two-term output sums -> identical math per sample; the
    # f32 file round trip is exact for f32 synthesis.
    np.testing.assert_allclose(rec, whole.astype(np.float64), atol=1e-6)
    n = min(len(rec), len(x))
    err = rec[:n] - x[:n]
    snr = 10 * np.log10((x[:n] ** 2).sum() / (err**2).sum())
    assert snr > 120.0


def test_streaming_imdct_roundtrip(wav, tmp_path):
    path, signal = wav
    from zaftpu.core.windows import vorbis
    from zaftpu.io.pipeline import streaming_imdct

    win = vorbis(WL).astype(np.float32)
    x = signal.astype(np.float32)
    coeffs = np.asarray(zaftpu.mdct(x, win))
    whole = np.asarray(zaftpu.imdct(coeffs, win))
    out_path = tmp_path / "rec.wav"
    n = streaming_imdct(coeffs, win, out_path, 44100, block_frames=29)
    assert n == whole.shape[0]
    rec, _ = zaftpu.wavread(out_path)
    rec = rec[:, 0] if rec.ndim == 2 else rec
    np.testing.assert_allclose(rec, whole.astype(np.float64), atol=1e-6)
    n = min(len(rec), len(x))
    err = rec[:n] - x[:n]
    snr = 10 * np.log10((x[:n] ** 2).sum() / (err**2).sum())
    assert snr > 120.0


def test_streaming_synthesis_resume(tmp_path):
    """A crashed synthesis job resumes from its carry/position checkpoint:
    remaining blocks only, output file identical to an uninterrupted run."""
    from zaftpu.io.pipeline import StreamingSynthesis
    from zaftpu.io.wavstream import StreamingWavWriter

    t, step, overlap, bf = 10, 4, 3, 3
    rng = np.random.default_rng(7)
    frames = rng.standard_normal((t, step + overlap)).astype(np.float32)
    calls = []

    def fetch(a, b):
        return np.arange(a, b)

    def block_fn(idx):
        calls.append(len(idx))
        b = len(idx)
        out = np.zeros(b * step + overlap, np.float32)
        for j, fi in enumerate(idx):  # plain OLA of the chosen frames
            out[j * step: j * step + step + overlap] += frames[fi]
        return out

    trim, target = overlap, t * step - overlap

    def run(out, ckpt, progress=None):
        resume = ckpt is not None and (ckpt / "synthesis_state.npz").exists()
        with StreamingWavWriter(out, 8000, resume=resume) as w:
            s = StreamingSynthesis(
                t, fetch, block_fn, step, overlap, trim, target, w,
                block_frames=bf,
                checkpoint_dir=str(ckpt) if ckpt else None)
            return s.run(progress=progress)

    ref = tmp_path / "ref.wav"
    run(ref, None)
    clean_calls = list(calls)
    calls.clear()

    class Boom(Exception):
        pass

    def fail_after_two(i, n):
        if i >= 1:
            raise Boom

    out = tmp_path / "out.wav"
    ckpt = tmp_path / "ck"
    ckpt.mkdir()
    with pytest.raises(Boom):
        run(out, ckpt, progress=fail_after_two)
    # Blocks 0/1 emitted + block 2 dispatched speculatively (one-block
    # device prefetch; the speculative result is discarded on crash).
    assert len(calls) == 3
    n = run(out, ckpt)
    assert len(calls) == 3 + (len(clean_calls) - 2)
    assert n == target
    a, _ = zaftpu.wavread(ref)
    b, _ = zaftpu.wavread(out)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_wav_writer_resume(tmp_path):
    from zaftpu.io.wavstream import StreamingWavWriter

    path = tmp_path / "w.wav"
    x = np.linspace(-1, 1, 100, dtype=np.float32)
    w = StreamingWavWriter(path, 44100)
    w.append(x[:60])
    # Simulate a crash: no close(), header sizes still zero.
    del w
    w = StreamingWavWriter(path, 44100, resume=True)
    assert w.frames_written == 60
    w.truncate(40)  # roll back past a checkpoint
    w.append(x[40:])
    w.close()
    back, sr = zaftpu.wavread(path)
    back = back[:, 0] if np.asarray(back).ndim == 2 else back
    assert sr == 44100
    np.testing.assert_array_equal(np.asarray(back, dtype=np.float32), x)
