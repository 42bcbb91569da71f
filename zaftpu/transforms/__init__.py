from zaftpu.transforms import cqt, dct, mdct, stft  # noqa: F401
