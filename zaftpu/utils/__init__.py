from zaftpu.utils.profiling import annotate, timed, TransformStats  # noqa: F401
from zaftpu.utils.cache import operator_cache_dir, cached_operator  # noqa: F401
