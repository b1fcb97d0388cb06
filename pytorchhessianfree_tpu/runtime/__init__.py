"""Native host runtime: C++ prefetching batch loader."""

from .loader import PrefetchLoader

__all__ = ["PrefetchLoader"]
