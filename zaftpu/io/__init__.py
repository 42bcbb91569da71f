from zaftpu.io.wav import wavread, wavwrite  # noqa: F401
