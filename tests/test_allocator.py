import pytest

from caesar_tpu.engine.allocator import (
    OutOfPages,
    PageAllocator,
    PrefixCache,
    block_hashes,
)


def test_alloc_free_cycle():
    a = PageAllocator(8)
    pages = a.alloc(3)
    assert len(set(pages)) == 3
    assert a.used_pages == 3
    for p in pages:
        a.decref(p)
    assert a.used_pages == 0


def test_refcount_sharing():
    a = PageAllocator(4)
    (p,) = a.alloc(1)
    a.incref(p)
    a.decref(p)
    assert a.used_pages == 1  # still held
    a.decref(p)
    assert a.used_pages == 0


def test_out_of_pages():
    a = PageAllocator(2)
    a.alloc(2)
    with pytest.raises(OutOfPages):
        a.alloc(1)


def test_over_free_rejected():
    a = PageAllocator(2)
    (p,) = a.alloc(1)
    a.decref(p)
    with pytest.raises((ValueError, KeyError)):
        a.decref(p)


def test_block_hashes_chained():
    h1 = block_hashes([1, 2, 3, 4, 5, 6], page_size=2)
    h2 = block_hashes([1, 2, 3, 4, 9, 9], page_size=2)
    assert h1[0] == h2[0]
    assert h1[1] == h2[1]
    assert h1[2] != h2[2]
    # partial page excluded
    assert len(block_hashes([1, 2, 3], page_size=2)) == 1


def test_prefix_cache_match_and_insert():
    a = PageAllocator(16)
    c = PrefixCache(a, page_size=4)
    tokens = list(range(10))  # 2 full pages + partial
    pages = a.alloc(3)
    c.insert(tokens, pages[:2])
    assert len(c) == 2

    matched, n = c.match(tokens)
    assert matched == pages[:2]
    assert n == 8
    # matched pages were increfed for the caller
    assert a.refcount(pages[0]) == 3  # owner + cache + caller


def test_prefix_cache_divergent_tail():
    a = PageAllocator(16)
    c = PrefixCache(a, page_size=4)
    tokens_a = [1, 2, 3, 4, 5, 6, 7, 8]
    pages = a.alloc(2)
    c.insert(tokens_a, pages)
    matched, n = c.match([1, 2, 3, 4, 9, 9, 9, 9])
    assert n == 4  # only the first page matches
    assert matched == [pages[0]]


def test_prefix_cache_eviction_under_pressure():
    a = PageAllocator(4)
    c = PrefixCache(a, page_size=2)
    pages = a.alloc(2)
    c.insert([1, 2, 3, 4], pages)
    for p in pages:
        a.decref(p)  # only cache holds them now
    assert a.free_pages == 2
    got = c.alloc_with_eviction(4)  # forces eviction of both entries
    assert len(got) == 4
    assert len(c) == 0


def test_prefix_cache_survives_owner_release():
    """Pages stay valid for the cache after the writing sequence retires."""
    a = PageAllocator(8)
    c = PrefixCache(a, page_size=2)
    pages = a.alloc(2)
    c.insert([5, 6, 7, 8], pages)
    for p in pages:
        a.decref(p)  # sequence retires
    matched, n = c.match([5, 6, 7, 8, 9, 9])
    assert matched == pages
    assert n == 4
