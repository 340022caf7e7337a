"""memento_tpu.utils"""

from .cache import enable_compile_cache

__all__ = ["enable_compile_cache"]
