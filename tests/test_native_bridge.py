"""C++ host runtime vs Python twin: property-tested equivalence."""

import random

import pytest

from caesar_tpu.engine.allocator import PageAllocator, PrefixCache
from caesar_tpu.native_bridge import (
    NativePageAllocator,
    NativePrefixCache,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library did not build"
)


def test_allocator_page_id_parity():
    py = PageAllocator(16)
    cc = NativePageAllocator(16)
    assert py.alloc(3) == cc.alloc(3)
    # free in the same order, realloc must match (LIFO reuse parity)
    for p in (1, 0):
        py.decref(p)
        cc.decref(p)
    assert py.alloc(2) == cc.alloc(2)
    assert py.used_pages == cc.used_pages
    assert py.free_pages == cc.free_pages


def test_allocator_errors_parity():
    cc = NativePageAllocator(2)
    cc.alloc(2)
    with pytest.raises(Exception):
        cc.alloc(1)
    cc.decref(0)
    with pytest.raises(ValueError):
        cc.decref(0)


def test_prefix_cache_behavior_parity():
    page = 4
    py_a, cc_a = PageAllocator(64), NativePageAllocator(64)
    py_c, cc_c = PrefixCache(py_a, page), NativePrefixCache(cc_a, page)

    tokens = list(range(20))
    pages_py = py_a.alloc(5)
    pages_cc = cc_a.alloc(5)
    assert pages_py == pages_cc
    py_c.insert(tokens, pages_py)
    cc_c.insert(tokens, pages_cc)
    assert len(py_c) == len(cc_c) == 5

    probe = tokens[:8] + [99] * 8
    m_py, n_py = py_c.match(probe)
    m_cc, n_cc = cc_c.match(probe)
    assert m_py == m_cc
    assert n_py == n_cc == 8
    assert py_a.refcount(m_py[0]) == cc_a.refcount(m_cc[0])


def test_prefix_cache_eviction_parity():
    page = 2
    py_a, cc_a = PageAllocator(8), NativePageAllocator(8)
    py_c, cc_c = PrefixCache(py_a, page), NativePrefixCache(cc_a, page)
    tokens = [1, 2, 3, 4, 5, 6]
    pp, pc = py_a.alloc(3), cc_a.alloc(3)
    py_c.insert(tokens, pp)
    cc_c.insert(tokens, pc)
    for p in pp:
        py_a.decref(p)
    for p in pc:
        cc_a.decref(p)
    assert py_c.evict(2) == cc_c.evict(2) == 2
    assert py_a.free_pages == cc_a.free_pages


def test_randomized_equivalence():
    """Random op sequence drives both implementations identically."""
    rng = random.Random(7)
    page = 2
    py_a, cc_a = PageAllocator(64), NativePageAllocator(64)
    py_c, cc_c = PrefixCache(py_a, page), NativePrefixCache(cc_a, page)
    live_py, live_cc = [], []

    for _ in range(300):
        op = rng.random()
        if op < 0.4 and py_a.free_pages > 4:
            n_tokens = rng.randrange(2, 10)
            tokens = [rng.randrange(5) for _ in range(n_tokens)]
            m_py, k_py = py_c.match(tokens)
            m_cc, k_cc = cc_c.match(tokens)
            assert (m_py, k_py) == (m_cc, k_cc)
            needed = -(-n_tokens // page) - len(m_py)
            if needed > 0 and py_a.free_pages >= needed:
                new_py = py_a.alloc(needed)
                new_cc = cc_a.alloc(needed)
                assert new_py == new_cc
                all_py, all_cc = m_py + new_py, m_cc + new_cc
                py_c.insert(tokens, all_py[: len(tokens) // page])
                cc_c.insert(tokens, all_cc[: len(tokens) // page])
                live_py.append(all_py)
                live_cc.append(all_cc)
            else:
                live_py.append(m_py)
                live_cc.append(m_cc)
        elif op < 0.8 and live_py:
            i = rng.randrange(len(live_py))
            for p in live_py.pop(i):
                py_a.decref(p)
            for p in live_cc.pop(i):
                cc_a.decref(p)
        else:
            n = rng.randrange(0, 3)
            assert py_c.evict(n) == cc_c.evict(n)
        assert py_a.free_pages == cc_a.free_pages
        assert len(py_c) == len(cc_c)
