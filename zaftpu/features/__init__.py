from zaftpu.features import mel  # noqa: F401
