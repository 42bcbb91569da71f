from zaftpu.core import fft, frame, windows  # noqa: F401
