"""Host-side KV page allocator and block-hash prefix cache.

The control half of the paged KV cache (kvcache.py): device code only
gathers/scatters by page id; which page holds what lives here.

PageAllocator — free-list + per-page refcounts.  Sharing is refcounting:
a prefix page referenced by three trajectories and the prefix cache has
refcount 4 and survives until all four drop it.

PrefixCache — maps page-aligned token-block chains to page ids.  Keys are
chained block hashes (hash of this page's tokens + the previous block's
hash), so a lookup walks the longest shared prefix page by page.  This is
exactly the reuse surface the rebuilt-per-turn prompts expose (SURVEY.md
§5.7): every turn and every sample of a problem shares the byte-identical
initial prompt produced by generate_initial_prompt, and later turns further
share best/last kernel blocks.  Full pages only — the trailing partial page
is always recomputed.

Eviction is LRU over cache-held pages, triggered on allocation pressure.
A pure-Python implementation; a C++ twin lives in native/ (see
native/host_runtime.cpp) and is used when built — same semantics, tested
against each other.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple


class OutOfPages(RuntimeError):
    pass


class PageAllocator:
    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages - 1, -1, -1))
        self._refs: Dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def used_pages(self) -> int:
        return self.n_pages - len(self._free)

    def alloc(self, n: int) -> List[int]:
        if n > len(self._free):
            raise OutOfPages(f"need {n} pages, {len(self._free)} free")
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._refs[p] = 1
        return pages

    def incref(self, page: int) -> None:
        self._refs[page] += 1

    def decref(self, page: int) -> None:
        refs = self._refs[page] - 1
        if refs < 0:
            raise ValueError(f"page {page} over-freed")
        if refs == 0:
            del self._refs[page]
            self._free.append(page)
        else:
            self._refs[page] = refs

    def refcount(self, page: int) -> int:
        return self._refs.get(page, 0)


def block_hashes(token_ids: Sequence[int], page_size: int) -> List[bytes]:
    """Chained hash per FULL page of tokens."""
    out: List[bytes] = []
    prev = b""
    for start in range(0, (len(token_ids) // page_size) * page_size, page_size):
        block = token_ids[start : start + page_size]
        h = hashlib.blake2b(
            prev + b"|" + ",".join(map(str, block)).encode(), digest_size=16
        ).digest()
        out.append(h)
        prev = h
    return out


class PrefixCache:
    """block-hash chain -> page id, with LRU eviction of unreferenced tails."""

    def __init__(self, allocator: PageAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size
        self._pages: "OrderedDict[bytes, int]" = OrderedDict()  # LRU order
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._pages)

    # ------------------------------------------------------------------
    def match(self, token_ids: Sequence[int]) -> Tuple[List[int], int]:
        """Longest cached page-aligned prefix of token_ids.

        Returns (page_ids, n_tokens_matched); each returned page gets an
        incref on behalf of the caller (drop with allocator.decref when the
        sequence retires).
        """
        matched: List[int] = []
        for h in block_hashes(token_ids, self.page_size):
            page = self._pages.get(h)
            if page is None:
                break
            self._pages.move_to_end(h)
            self.allocator.incref(page)
            matched.append(page)
        if matched:
            self.hits += 1
        else:
            self.misses += 1
        return matched, len(matched) * self.page_size

    def insert(self, token_ids: Sequence[int], page_ids: Sequence[int]) -> None:
        """Register a sequence's full pages for reuse.  The cache increfs
        pages it newly holds."""
        hashes = block_hashes(token_ids, self.page_size)
        for h, page in zip(hashes, page_ids):
            if h in self._pages:
                self._pages.move_to_end(h)
                continue
            self._pages[h] = page
            self.allocator.incref(page)

    # ------------------------------------------------------------------
    def evict(self, n_pages: int) -> int:
        """Drop up to n_pages least-recently-used entries; returns freed."""
        freed = 0
        for h in list(self._pages.keys()):
            if freed >= n_pages:
                break
            page = self._pages.pop(h)
            self.allocator.decref(page)
            freed += 1
        return freed

    def alloc_with_eviction(self, n: int) -> List[int]:
        """Allocate, evicting cache entries under pressure."""
        shortfall = n - self.allocator.free_pages
        if shortfall > 0:
            self.evict(shortfall)
        return self.allocator.alloc(n)

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0
