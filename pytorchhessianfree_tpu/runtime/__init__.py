"""Native host runtime: C++ prefetching batch loader + device prefetch."""

from .loader import PrefetchLoader
from .prefetch import DevicePrefetcher

__all__ = ["PrefetchLoader", "DevicePrefetcher"]
