"""ctypes bridge to the C++ host runtime (native/host_runtime.cpp).

Exposes NativePageAllocator / NativePrefixCache with the exact interface of
their Python twins in engine/allocator.py.  The library builds on demand
(make -C native) and loading failures fall back to the Python
implementations silently — the native path is a performance optimization of
the admission hot path, never a functional dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

from caesar_tpu.engine.allocator import OutOfPages, PageAllocator, PrefixCache

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB_PATH = _NATIVE_DIR / "libcaesar_host.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("CAESAR_DISABLE_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ca_alloc_create.restype = ctypes.c_void_p
        lib.ca_alloc_create.argtypes = [ctypes.c_int]
        lib.ca_alloc_destroy.argtypes = [ctypes.c_void_p]
        lib.ca_alloc_free_pages.argtypes = [ctypes.c_void_p]
        lib.ca_alloc_used_pages.argtypes = [ctypes.c_void_p]
        lib.ca_alloc_pages.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ca_alloc_incref.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ca_alloc_decref.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ca_alloc_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ca_cache_create.restype = ctypes.c_void_p
        lib.ca_cache_create.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ca_cache_destroy.argtypes = [ctypes.c_void_p]
        lib.ca_cache_match.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.ca_cache_insert.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.ca_cache_evict.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ca_cache_size.argtypes = [ctypes.c_void_p]
        lib.ca_cache_hits.restype = ctypes.c_uint64
        lib.ca_cache_hits.argtypes = [ctypes.c_void_p]
        lib.ca_cache_misses.restype = ctypes.c_uint64
        lib.ca_cache_misses.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _try_load() is not None


def _i32_array(values: Sequence[int]):
    return (ctypes.c_int32 * len(values))(*values)


class NativePageAllocator:
    """Same interface as engine.allocator.PageAllocator, C++-backed."""

    def __init__(self, n_pages: int):
        lib = _try_load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self.n_pages = n_pages
        self._h = lib.ca_alloc_create(n_pages)

    def __del__(self):
        try:
            self._lib.ca_alloc_destroy(self._h)
        except Exception:
            pass

    @property
    def free_pages(self) -> int:
        return self._lib.ca_alloc_free_pages(self._h)

    @property
    def used_pages(self) -> int:
        return self._lib.ca_alloc_used_pages(self._h)

    def alloc(self, n: int) -> List[int]:
        out = (ctypes.c_int32 * max(n, 1))()
        if self._lib.ca_alloc_pages(self._h, n, out) != 0:
            raise OutOfPages(f"need {n} pages, {self.free_pages} free")
        return list(out[:n])

    def incref(self, page: int) -> None:
        if self._lib.ca_alloc_incref(self._h, page) != 0:
            raise KeyError(page)

    def decref(self, page: int) -> None:
        if self._lib.ca_alloc_decref(self._h, page) < 0:
            raise ValueError(f"page {page} over-freed")

    def refcount(self, page: int) -> int:
        return self._lib.ca_alloc_refcount(self._h, page)


class NativePrefixCache:
    """Same interface as engine.allocator.PrefixCache, C++-backed."""

    def __init__(self, allocator: NativePageAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size
        self._lib = allocator._lib
        self._h = self._lib.ca_cache_create(allocator._h, page_size)

    def __del__(self):
        try:
            self._lib.ca_cache_destroy(self._h)
        except Exception:
            pass

    def __len__(self) -> int:
        return self._lib.ca_cache_size(self._h)

    def match(self, token_ids: Sequence[int]) -> Tuple[List[int], int]:
        max_out = len(token_ids) // self.page_size
        out = (ctypes.c_int32 * max(max_out, 1))()
        n = self._lib.ca_cache_match(
            self._h, _i32_array(token_ids), len(token_ids), out, max_out
        )
        pages = list(out[:n])
        return pages, n * self.page_size

    def insert(self, token_ids: Sequence[int], page_ids: Sequence[int]) -> None:
        self._lib.ca_cache_insert(
            self._h,
            _i32_array(token_ids),
            len(token_ids),
            _i32_array(page_ids),
            len(page_ids),
        )

    def evict(self, n_pages: int) -> int:
        return self._lib.ca_cache_evict(self._h, n_pages)

    def alloc_with_eviction(self, n: int) -> List[int]:
        shortfall = n - self.allocator.free_pages
        if shortfall > 0:
            self.evict(shortfall)
        return self.allocator.alloc(n)

    @property
    def hits(self) -> int:
        return self._lib.ca_cache_hits(self._h)

    @property
    def misses(self) -> int:
        return self._lib.ca_cache_misses(self._h)

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


def make_allocator(n_pages: int, prefer_native: bool = True):
    if prefer_native and native_available():
        return NativePageAllocator(n_pages)
    return PageAllocator(n_pages)


def make_prefix_cache(allocator, page_size: int):
    if isinstance(allocator, NativePageAllocator):
        return NativePrefixCache(allocator, page_size)
    return PrefixCache(allocator, page_size)
