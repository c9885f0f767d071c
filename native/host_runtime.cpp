// caesar-tpu native host runtime: KV page allocator + prefix cache.
//
// C++ twin of caesar_tpu/engine/allocator.py (same semantics, property-tested
// against it): refcounted page allocation and a chained-block-hash prefix
// cache with LRU eviction.  These run on the serving engine's admission path
// for every request — at hundreds of concurrent trajectories the Python
// dict/OrderedDict implementation becomes measurable scheduler overhead, so
// the engine loads this library through ctypes when built (caesar_tpu/
// native_bridge.py) and falls back to Python otherwise.
//
// Plain C ABI; every handle is an opaque pointer owned by the caller.

#include <cstdint>
#include <cstring>
#include <list>
#include <stdexcept>
#include <unordered_map>
#include <vector>

namespace {

// 64-bit FNV-1a over a token block plus the previous block's hash (chained,
// mirroring allocator.py's chained blake2 — values differ, semantics match).
static uint64_t hash_block(uint64_t prev, const int32_t* tokens, int n) {
  uint64_t h = 1469598103934665603ull ^ prev;
  for (int i = 0; i < n; ++i) {
    uint64_t v = static_cast<uint64_t>(static_cast<uint32_t>(tokens[i]));
    for (int b = 0; b < 4; ++b) {
      h ^= (v >> (8 * b)) & 0xFF;
      h *= 1099511628211ull;
    }
    h ^= 0x2D;  // separator, like the "," in the python twin
    h *= 1099511628211ull;
  }
  return h;
}

struct Allocator {
  int n_pages;
  std::vector<int> free_list;            // LIFO, matching python pop()
  std::unordered_map<int, int> refs;

  explicit Allocator(int n) : n_pages(n) {
    free_list.reserve(n);
    // python twin: list(range(n-1,-1,-1)) popped from the end -> hands out
    // 0,1,2,... and reuses freed pages LIFO; replicate exactly so tests can
    // compare page ids across implementations
    for (int i = n - 1; i >= 0; --i) free_list.push_back(i);
  }

  int free_pages() const { return static_cast<int>(free_list.size()); }

  bool alloc(int n, int32_t* out) {
    if (n > free_pages()) return false;
    for (int i = 0; i < n; ++i) {
      int page = free_list.back();
      free_list.pop_back();
      refs[page] = 1;
      out[i] = page;
    }
    return true;
  }

  bool incref(int page) {
    auto it = refs.find(page);
    if (it == refs.end()) return false;
    ++it->second;
    return true;
  }

  // returns new refcount, or -1 on over-free
  int decref(int page) {
    auto it = refs.find(page);
    if (it == refs.end()) return -1;
    if (--it->second == 0) {
      refs.erase(it);
      free_list.push_back(page);
      return 0;
    }
    return it->second;
  }

  int refcount(int page) const {
    auto it = refs.find(page);
    return it == refs.end() ? 0 : it->second;
  }
};

struct PrefixCache {
  Allocator* alloc;
  int page_size;
  // LRU list of (hash, page); map hash -> list iterator
  std::list<std::pair<uint64_t, int>> lru;  // front = oldest
  std::unordered_map<uint64_t, std::list<std::pair<uint64_t, int>>::iterator>
      index;
  uint64_t hits = 0, misses = 0;

  PrefixCache(Allocator* a, int ps) : alloc(a), page_size(ps) {}

  void touch(std::unordered_map<uint64_t, decltype(lru.begin())>::iterator it) {
    lru.splice(lru.end(), lru, it->second);
  }

  int match(const int32_t* tokens, int n, int32_t* out, int max_out) {
    int full_pages = n / page_size;
    uint64_t prev = 0;
    int matched = 0;
    for (int p = 0; p < full_pages && matched < max_out; ++p) {
      prev = hash_block(prev, tokens + p * page_size, page_size);
      auto it = index.find(prev);
      if (it == index.end()) break;
      touch(it);
      int page = it->second->second;
      alloc->incref(page);
      out[matched++] = page;
    }
    if (matched > 0) ++hits; else ++misses;
    return matched;
  }

  void insert(const int32_t* tokens, int n, const int32_t* pages,
              int n_pages) {
    int full_pages = n / page_size;
    if (n_pages < full_pages) full_pages = n_pages;
    uint64_t prev = 0;
    for (int p = 0; p < full_pages; ++p) {
      prev = hash_block(prev, tokens + p * page_size, page_size);
      auto it = index.find(prev);
      if (it != index.end()) {
        touch(it);
        continue;
      }
      lru.emplace_back(prev, pages[p]);
      index[prev] = std::prev(lru.end());
      alloc->incref(pages[p]);
    }
  }

  int evict(int n) {
    int freed = 0;
    while (freed < n && !lru.empty()) {
      auto& front = lru.front();
      index.erase(front.first);
      alloc->decref(front.second);
      lru.pop_front();
      ++freed;
    }
    return freed;
  }

  int size() const { return static_cast<int>(lru.size()); }
};

}  // namespace

extern "C" {

void* ca_alloc_create(int n_pages) { return new Allocator(n_pages); }
void ca_alloc_destroy(void* h) { delete static_cast<Allocator*>(h); }
int ca_alloc_free_pages(void* h) {
  return static_cast<Allocator*>(h)->free_pages();
}
int ca_alloc_used_pages(void* h) {
  auto* a = static_cast<Allocator*>(h);
  return a->n_pages - a->free_pages();
}
int ca_alloc_pages(void* h, int n, int32_t* out) {
  return static_cast<Allocator*>(h)->alloc(n, out) ? 0 : -1;
}
int ca_alloc_incref(void* h, int page) {
  return static_cast<Allocator*>(h)->incref(page) ? 0 : -1;
}
int ca_alloc_decref(void* h, int page) {
  return static_cast<Allocator*>(h)->decref(page);
}
int ca_alloc_refcount(void* h, int page) {
  return static_cast<Allocator*>(h)->refcount(page);
}

void* ca_cache_create(void* alloc_handle, int page_size) {
  return new PrefixCache(static_cast<Allocator*>(alloc_handle), page_size);
}
void ca_cache_destroy(void* h) { delete static_cast<PrefixCache*>(h); }
int ca_cache_match(void* h, const int32_t* tokens, int n, int32_t* out,
                   int max_out) {
  return static_cast<PrefixCache*>(h)->match(tokens, n, out, max_out);
}
void ca_cache_insert(void* h, const int32_t* tokens, int n,
                     const int32_t* pages, int n_pages) {
  static_cast<PrefixCache*>(h)->insert(tokens, n, pages, n_pages);
}
int ca_cache_evict(void* h, int n) {
  return static_cast<PrefixCache*>(h)->evict(n);
}
int ca_cache_size(void* h) { return static_cast<PrefixCache*>(h)->size(); }
uint64_t ca_cache_hits(void* h) { return static_cast<PrefixCache*>(h)->hits; }
uint64_t ca_cache_misses(void* h) {
  return static_cast<PrefixCache*>(h)->misses;
}

}  // extern "C"
